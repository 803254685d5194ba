"""Command-line tools — the equivalents of the reference's ``src/runnable``
executables (SURVEY.md §2.8). Each module is a ``python -m`` entry point:

  evaluate_trajectory   <- evaluate_trajectory.cpp (metric tool)
  validate_dataset      <- validate_dataset.cpp (dataset sanity checker)
  run_kitti             <- tracker_sv / tracker_gt mains (KITTI playback)
  match_clouds          <- match_clouds.cpp (descriptor-matching benchmark)
"""
