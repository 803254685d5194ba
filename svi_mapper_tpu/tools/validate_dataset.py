"""Dataset sanity checker CLI — the ``validate_dataset`` runnable
(validate_dataset.cpp:73-111).

Usage: python -m svi_mapper_tpu.tools.validate_dataset KITTI_ROOT [--sequence 00]
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--sequence", default="00")
    args = ap.parse_args()

    from svi_mapper_tpu.io.kitti import KittiSequence, validate_sequence

    seq = KittiSequence(args.root, args.sequence)
    problems = validate_sequence(seq)
    print(f"sequence {args.sequence}: {seq.n_frames} stereo frames, "
          f"{seq.cam.width}x{seq.cam.height}, "
          f"ground truth: {'yes' if seq.poses_wc is not None else 'no'}")
    if problems:
        for p in problems:
            print(f"  PROBLEM: {p}")
        raise SystemExit(1)
    print("  OK — streams paired, timestamps monotonic")


if __name__ == "__main__":
    main()
