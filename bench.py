"""Benchmark: full stereo-SLAM throughput per chip on KITTI-sized frames.

Three measurements (BASELINE.md measurement row):

  * **full-SLAM frames/s** (headline): ``SLAMSystem.process_many`` on a
    synthetic loop sequence at KITTI 00 resolution (1241x376) — per-frame
    front-end (dense BRIEF x2, 3-stage tracking, stereo posit GN with the
    fallback cascade, landmark GN refinement, detection + triangulation +
    insertion) in ``lax.scan`` chunks PLUS the back-end folded at chunk
    boundaries: keyframe DB adds, loop-closure search + consensus,
    trajectory pose graph, windowed Schur BA — the complete pipeline of the
    reference's ``tracker_sv`` (CTrackerSV.cpp:239-456) including the
    inline back-end at :440.
  * **front-end frames/s**: the tracking-only chunked scan (the round-1
    number, kept for continuity).
  * **BA iterations/s**: Levenberg-Marquardt iterations of the batched
    Schur-complement bundle adjuster at the 8-keyframe x 1024-landmark
    window shape (solvers.ba.bundle_adjust).

Baselines: the reference publishes no numbers (BASELINE.md); the CPU
anchors below are this same code on the jax CPU backend of this machine
(measured 2026-08 with ``python bench.py --cpu``). BASELINE.json's
throughput target is >= 3x the CPU baseline per chip.

Frames are pre-staged on device: in this harness the single TPU chip sits
behind a network tunnel whose 25 MB/s host->device path is an artifact of
the sandbox, not of TPU hardware (PCIe staging of a 1.8 MB frame costs
<0.5 ms in production).

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline",
...extra fields}.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

# CPU-backend anchors (this machine, jax CPU, re-measured 2026-08-19 with
# `python bench.py --cpu` — same code, same scenario as the TPU run: the
# round-2 pipeline with oriented epipolar stage-3, regional recovery, and
# the full back-end on the radius-26 loop)
CPU_FULL_SLAM_FPS = 6.921
CPU_FRONTEND_FPS = 6.557
CPU_BA_ITERS_PER_SEC = 21.6     # 32-keyframe x 4096-landmark window


def bench_frontend(quick: bool) -> float:
    import jax
    import jax.numpy as jnp

    from svi_mapper_tpu.config import DEFAULT_PARAMS
    from svi_mapper_tpu.io.synthetic import SyntheticSequence
    from svi_mapper_tpu.models import frame as frame_mod

    n_frames = 4 if quick else 10
    reps = 1 if quick else 4
    seq = SyntheticSequence(n_frames=n_frames, width=1241, height=376, step=0.8)
    L = jnp.stack([jnp.asarray(f[0]) for f in seq])
    R = jnp.stack([jnp.asarray(f[1]) for f in seq])
    jax.block_until_ready((L, R))

    params = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=1024,
                                 max_detections=1024)
    cam = seq.cam

    def run_chunk(state, l, r):
        return frame_mod.process_chunk(
            state, l, r, cam, params, use_gt_pose=False, landmark_opt_every=1
        )

    # compile + map warmup (fills the landmark table to steady state)
    state = frame_mod.init_state(params)
    state, out = run_chunk(state, L, R)
    jax.block_until_ready(out.T_wc)

    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        state, out = run_chunk(state, L, R)
        n += n_frames
    out.T_wc.block_until_ready()
    dt = time.perf_counter() - t0
    return n / dt


def bench_full_slam(quick: bool) -> tuple[float, dict]:
    import jax
    import jax.numpy as jnp

    from svi_mapper_tpu.config import DEFAULT_PARAMS
    from svi_mapper_tpu.io.synthetic import SyntheticSequence
    from svi_mapper_tpu.models.slam import SLAMSystem

    # a full loop with KITTI-like per-frame motion (radius 26 m over 208
    # frames = 0.79 m + 1.7 deg of yaw per frame; KITTI 00 averages
    # ~0.8 m/frame) — the revisit fires the closure + pose-graph + BA path
    # during the measurement. Tighter loops yaw too fast for ANY tracker
    # at KITTI resolution (50+ px/frame feature shifts).
    n_frames = 48 if quick else 208
    seq = SyntheticSequence(n_frames=n_frames, width=1241, height=376,
                            trajectory="loop", loop_radius=26.0)
    L = jnp.stack([jnp.asarray(f[0]) for f in seq])
    R = jnp.stack([jnp.asarray(f[1]) for f in seq])
    jax.block_until_ready((L, R))

    params = dataclasses.replace(
        DEFAULT_PARAMS, max_landmarks=1024, max_detections=1024,
        keyframe_translation_m2=4.0, keyframe_rotation_rad2=0.02,
    )

    def run(overlap: bool) -> SLAMSystem:
        # overlap=True: closure search, pose graph and BA run on a worker
        # thread over queued keyframe snapshots; overlap=False: the
        # reference's inline back-end (CTrackerSV.cpp:440) folded at chunk
        # boundaries. Both are measured (VERDICT r3 Next-4): on a single
        # chip the device work of both threads serializes, so overlap only
        # hides HOST time and the winner is an empirical question.
        slam = SLAMSystem(seq.cam, params, overlap_backend=overlap)
        slam.process_many(L, R, chunk=16)
        slam.finalize_backend()
        return slam

    # HYGIENE (the r3 bench regression's main cause): worker threads of a
    # finished overlap run measurably degrade every later run in the same
    # process (measured 26.9 -> 5.5 fps sync with two idle overlap
    # executors alive), so every system is close()d right after timing —
    # and the sync measurement runs FIRST, from a sync warmup, because
    # overlap runs are additionally erratic on a single chip (two threads
    # contending for one dispatch path measured 5.6-20.8 fps across
    # repeats vs sync's stable 31-32).
    run(False).close()           # compile warmup (all shape buckets)
    t0 = time.perf_counter()
    slam_s = run(False)
    fps_sync = n_frames / (time.perf_counter() - t0)
    slam_s.close()
    t0 = time.perf_counter()
    slam_o = run(True)
    fps_overlap = n_frames / (time.perf_counter() - t0)
    slam_o.close()
    slam = slam_o if fps_overlap >= fps_sync else slam_s
    return fps_sync, fps_overlap, dict(
        slam.stats, keyframes=len(slam.slam_keyframes))


def bench_svi(quick: bool) -> float:
    """Stereo-inertial throughput: process_many_imu (the SVI chunked scan)
    on the same loop at 10 IMU samples/frame (200 Hz : 20 fps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svi_mapper_tpu.config import DEFAULT_PARAMS
    from svi_mapper_tpu.imu import interpolator as imu
    from svi_mapper_tpu.io.synthetic import SyntheticSequence
    from svi_mapper_tpu.models.svi import StereoInertialTracker

    n_frames = 48 if quick else 208
    sub, dt = 10, 0.05
    seq = SyntheticSequence(n_frames=n_frames, width=1241, height=376,
                            trajectory="loop", loop_radius=26.0)
    # pre-stage frames on device (same as bench_full_slam): re-shipping the
    # ~780 MB stack over the sandbox tunnel every run measures the tunnel,
    # not the tracker (module docstring)
    L = jnp.stack([jnp.asarray(f[0]) for f in seq])
    R = jnp.stack([jnp.asarray(f[1]) for f in seq])
    jax.block_until_ready((L, R))
    calib0 = imu.ImuCalibration(
        R_imu_to_world=np.eye(3), bias_gyro=np.zeros(3),
        bias_accel=np.zeros(3), noise_gyro=np.zeros(3),
        noise_accel=np.zeros(3), n_samples=200)
    omega, accel = imu.synthesize_measurements(
        seq.poses_wc, dt, calib=calib0, noise_gyro=0.001, noise_accel=0.02)
    up = np.array([0.0, -1.0, 0.0])
    dts = [np.full(1 if i == 0 else sub, dt if i == 0 else dt / sub,
                   np.float32) for i in range(n_frames)]
    oms = [np.zeros((1, 3), np.float32) if i == 0
           else np.tile(omega[i - 1], (sub, 1)).astype(np.float32)
           for i in range(n_frames)]
    acs = [(up * imu.GRAVITY)[None].astype(np.float32) if i == 0
           else np.tile(accel[i - 1], (sub, 1)).astype(np.float32)
           for i in range(n_frames)]
    params = dataclasses.replace(
        DEFAULT_PARAMS, max_landmarks=1024, max_detections=1024,
        keyframe_translation_m2=4.0, keyframe_rotation_rad2=0.02,
    )

    def run() -> StereoInertialTracker:
        # synchronous back-end: the overlap worker measurably degrades the
        # tracker thread's dispatch on a single chip (see bench_full_slam)
        tr = StereoInertialTracker(seq.cam, calib0, params, equalize=False)
        tr.process_many_imu(L, R, dts, oms, acs, chunk=16)
        tr.finalize_backend()
        return tr

    run().close()
    t0 = time.perf_counter()
    tr = run()
    fps = n_frames / (time.perf_counter() - t0)
    tr.close()
    return fps


def bench_ba(quick: bool) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svi_mapper_tpu.io.synthetic import default_camera
    from svi_mapper_tpu.solvers import ba as ba_mod

    # the production mapping window (solvers.ba docstring): 32 keyframes x
    # 4096 landmarks — Schur reduction [192, 12288] x [12288, 192] on MXU
    K, Lm = 32, 4096
    iters = 30
    reps = 1 if quick else 4
    cam = default_camera(1241, 376)
    rng = np.random.default_rng(3)
    X = rng.uniform([-20, -2, 5], [20, 2, 60], (Lm, 3)).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    T[:, 2, 3] = -np.arange(K, dtype=np.float32) * 1.0   # forward motion
    fx = float(cam.left.fx); cx = float(cam.left.cx); cy = float(cam.left.cy)
    bq = float(cam.right.P[0, 3])
    p_c = np.einsum("kij,lj->kli", T[:, :3, :3], X) + T[:, None, :3, 3]
    z = p_c[..., 2]
    u_l = fx * p_c[..., 0] / z + cx
    v_l = fx * p_c[..., 1] / z + cy
    u_r = (fx * p_c[..., 0] + bq) / z + cx
    obs = np.stack([u_l, v_l, u_r, v_l], -1) + rng.normal(0, 0.5, (K, Lm, 4))
    mask = (z > 1.0) & (u_l > 0) & (u_l < 1241) & (v_l > 0) & (v_l < 376)
    # perturb the initial guess so LM has real work every iteration
    X0 = X + rng.normal(0, 0.2, X.shape).astype(np.float32)
    fix = np.zeros(K, bool); fix[0] = True

    args = (jnp.asarray(T), jnp.asarray(X0), jnp.asarray(obs, jnp.float32),
            jnp.asarray(mask), cam, jnp.asarray(fix))
    # min_rel_improvement=0 disables the <1% early stop: every call runs
    # the full `iters` LM iterations
    res = ba_mod.bundle_adjust(*args, max_iterations=iters,
                               min_rel_improvement=0.0)
    jax.block_until_ready(res.T_wc)
    t0 = time.perf_counter()
    its = []
    for _ in range(reps):
        res = ba_mod.bundle_adjust(*args, max_iterations=iters,
                                   min_rel_improvement=0.0)
        its.append(res.iterations)     # defer sync: int() here would add a
    jax.block_until_ready(res.T_wc)    # host round trip per rep
    done = sum(int(x) for x in its)
    return done / (time.perf_counter() - t0)


def main() -> None:
    quick = "--quick" in sys.argv
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: first-run compiles are shipped over the
    # sandbox tunnel and dominate wall-clock; later processes reuse them
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if "--stages" in sys.argv:
        # per-stage device budget (the tracker_gt exit report analog,
        # tracker_gt.cpp:285-308) — human-readable mode
        from svi_mapper_tpu.eval.stage_bench import format_budget, stage_budget

        print(format_budget(stage_budget()))
        return

    # certify which kernel path each hot op dispatches to on THIS backend
    # before measuring (a bench that silently measures the XLA fallback
    # reports the wrong number) — ops.paths reuses the ops' own gates
    from svi_mapper_tpu.ops.paths import kernel_paths

    kernels = kernel_paths()
    print(f"kernel paths: {kernels}", file=sys.stderr)

    # order: the overlap A/B inside bench_full_slam is the only stage that
    # spawns worker threads — run it LAST so its (erratic, two-thread)
    # dispatch state cannot contaminate the other measurements
    frontend_fps = bench_frontend(quick)
    ba_ips = bench_ba(quick)
    svi_fps = bench_svi(quick)
    slam_fps_sync, slam_fps_overlap, slam_stats = bench_full_slam(quick)
    slam_fps = max(slam_fps_sync, slam_fps_overlap)

    print(
        json.dumps(
            {
                "metric": "synthetic_kitti_full_slam_frames_per_sec_per_chip",
                "value": round(slam_fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(slam_fps / CPU_FULL_SLAM_FPS, 3),
                "full_slam_fps_sync": round(slam_fps_sync, 3),
                "full_slam_fps_overlap": round(slam_fps_overlap, 3),
                "frontend_frames_per_sec": round(frontend_fps, 3),
                "frontend_vs_baseline": round(frontend_fps / CPU_FRONTEND_FPS, 3),
                "ba_iterations_per_sec": round(ba_ips, 3),
                "ba_vs_baseline": round(ba_ips / CPU_BA_ITERS_PER_SEC, 3),
                "svi_frames_per_sec": round(svi_fps, 3),
                "closures_accepted": slam_stats.get("closures_accepted", 0),
                "ba_runs": slam_stats.get("ba_runs", 0),
                "keyframes": slam_stats.get("keyframes", 0),
                "kernels": kernels,
            }
        )
    )


if __name__ == "__main__":
    main()
