"""Worker process for the two-process jax.distributed test.

Run as:  python tests/distributed_worker.py <coordinator> <n_proc> <pid>

Each process brings up a 4-virtual-CPU-device backend, joins the cluster
through ``parallel.distributed.initialize``, builds a cross-process 1-D
``map`` mesh over all 8 global devices, and runs the landmark-sharded
Schur BA — the landmark-axis psum then crosses the process boundary (the
DCN analog), exercising init order and cross-host collectives that the
single-process virtual mesh cannot (SURVEY.md §4: "multi-host tests under
jax.distributed"). Process 0 also solves the same problem unsharded and
asserts parity.

Prints one line ``OK <chi2_final>`` on success.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def _load_distributed_standalone():
    """Load parallel/distributed.py WITHOUT the package __init__ chain:
    importing ``svi_mapper_tpu`` materializes the XLA backend (module-level
    jnp constants), which must not happen before
    ``jax.distributed.initialize`` runs. distributed.py itself only needs
    os/jax/numpy, so it loads standalone."""
    import importlib.util

    p = Path(__file__).resolve().parents[1] / (
        "svi_mapper_tpu/parallel/distributed.py")
    spec = importlib.util.spec_from_file_location("_dist_standalone", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    dist = _load_distributed_standalone()

    multi = dist.initialize(coordinator_address=coordinator,
                            num_processes=n_proc, process_id=pid)
    assert multi, "expected a multi-process cluster"
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * n_proc

    # pod mesh sanity: (host, map) rows are per-process device groups
    pod = dist.make_pod_mesh()
    assert pod.devices.shape == (n_proc, 4)
    for row, per_host in enumerate(pod.devices):
        assert all(d.process_index == row for d in per_host)
    sl = dist.host_local_slice(64, pod)
    assert sl == slice(pid * 32, (pid + 1) * 32)

    # landmark-sharded BA across the process boundary: a 1-D map mesh over
    # ALL global devices, so the Schur psum crosses processes
    mesh = Mesh(np.asarray(jax.devices()), ("map",))

    from svi_mapper_tpu.io.synthetic import default_camera
    from svi_mapper_tpu.parallel import sharded_ba
    from svi_mapper_tpu.solvers import ba as ba_mod

    K, L = 4, 64
    cam = default_camera(320, 240)
    fx = float(cam.left.fx)
    cx = float(cam.left.cx); cy = float(cam.left.cy)
    bq = float(cam.right.P[0, 3])
    rng = np.random.default_rng(7)          # identical on every process
    X = rng.uniform([-5, -2, 3], [5, 2, 25], (L, 3)).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    T[:, 2, 3] = -np.arange(K, dtype=np.float32) * 0.4
    p_c = np.einsum("kij,lj->kli", T[:, :3, :3], X) + T[:, None, :3, 3]
    z = p_c[..., 2]
    obs = np.stack([fx * p_c[..., 0] / z + cx, fx * p_c[..., 1] / z + cy,
                    (fx * p_c[..., 0] + bq) / z + cx,
                    fx * p_c[..., 1] / z + cy], -1).astype(np.float32)
    obs += rng.normal(0, 0.3, obs.shape).astype(np.float32)
    mask = z > 0.5
    X0 = (X + rng.normal(0, 0.05, X.shape)).astype(np.float32)
    fix = np.zeros(K, bool); fix[0] = True

    res = sharded_ba.bundle_adjust_sharded(
        mesh, jnp.asarray(T), jnp.asarray(X0), jnp.asarray(obs),
        jnp.asarray(mask), cam, jnp.asarray(fix), max_iterations=5,
        min_rel_improvement=0.0)
    chi2 = float(res.chi2_final)
    T_opt = np.asarray(jax.device_get(res.T_wc))
    assert np.isfinite(T_opt).all()

    if pid == 0:
        # single-process oracle on the same inputs
        ref = ba_mod.bundle_adjust(
            jnp.asarray(T), jnp.asarray(X0), jnp.asarray(obs),
            jnp.asarray(mask), cam, jnp.asarray(fix), max_iterations=5,
            min_rel_improvement=0.0)
        chi2_ref = float(ref.chi2_final)
        assert abs(chi2 - chi2_ref) < 0.01 * chi2_ref + 1e-3, \
            (chi2, chi2_ref)
        assert np.abs(T_opt - np.asarray(ref.T_wc)).max() < 1e-3

    print(f"OK {chi2:.6f}", flush=True)


if __name__ == "__main__":
    main()
