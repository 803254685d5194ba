"""Kernel-path certification: which implementation each hot op dispatches to.

Every compute-heavy op in the package auto-selects between a Pallas TPU
kernel and an XLA fallback at trace time (the reference has no analog —
its single CPU path is unconditional). A benchmark that silently measures
the fallback reports a wrong number, so ``kernel_paths()`` is the single
source of truth the bench embeds in its JSON output: it calls the SAME
gate expressions the ops use, not a parallel re-derivation.

Gates mirrored here:
  * frontend.tracking.track_landmarks — ``ops.track_kernel`` on TPU
    (frontend/tracking.py backend check)
  * frontend.stereo.match_stereo — ``ops.stereo_kernel`` on TPU
    (frontend/stereo.py ``force_kernel=None`` auto)
  * solvers.ba.bundle_adjust — fused Schur assembly ``ops.ba_kernel``
    on TPU for float32 windows with K <= SCHUR_KERNEL_MAX_K
    (solvers.ba.schur_kernel_auto)
  * mapping closure matching — ``ops.hamming.hamming_pallas`` on TPU
    (ops/hamming.py hamming_distance_matrix)
  * solvers.landmark_opt — SoA lane-tiled core off-CPU, vmapped
    small-matrix core on CPU (solvers/landmark_opt.py)
"""

from __future__ import annotations

import jax


def kernel_paths(ba_window_ks: tuple[int, ...] = (8, 32, 64)) -> dict:
    """Report the dispatch decision of every hot op on this process's
    default backend. ``ba_window_ks``: keyframe-window sizes to certify for
    the BA Schur assembly (the production shapes: windowed BA K=8,
    bench/incremental buckets 32 and 64)."""
    from svi_mapper_tpu.solvers.ba import schur_kernel_auto

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    paths = {
        "backend": backend,
        "tracking": "pallas_band_sweep" if on_tpu else "xla_window",
        "stereo": "pallas_profile" if on_tpu else "xla_row_span",
        "hamming": "pallas_xor_popcount" if on_tpu else "xla_packed",
        "landmark_opt": "xla_vmap" if backend == "cpu" else "xla_soa",
    }
    for K in ba_window_ks:
        paths[f"ba_schur_K{K}"] = (
            "pallas_fused" if schur_kernel_auto(K) else "xla_blocked")
    return paths
