from svi_mapper_tpu.solvers import landmark_opt, posit  # noqa: F401
