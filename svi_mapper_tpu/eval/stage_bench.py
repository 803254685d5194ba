"""Per-stage device timing — the tracker_gt exit report, measured.

The reference prints a stage budget at exit (regional L1/R1/L2/R2, epipolar,
posit, loop closing, g2o, keyframes, landmark opt; tracker_gt.cpp:285-308),
accumulated with wall-clock timers around each host stage. Here the frame
step is ONE fused XLA program, so per-stage numbers come from running each
stage as its own jitted computation on representative state — the same
kernels the fused step uses, timed in isolation (dispatch overhead
included, so the sum exceeds the fused frame step's cost; the deltas are
what matter for tuning).

Used by ``python bench.py --stages``.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, reps: int = 10) -> float:
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3     # ms


def stage_budget(width: int = 1241, height: int = 376, reps: int = 10):
    """Time every pipeline stage on KITTI-scale inputs.

    Returns an ordered dict of stage -> milliseconds (front-end stages are
    per frame; back-end stages per keyframe event).
    """
    from svi_mapper_tpu.config import DEFAULT_PARAMS
    from svi_mapper_tpu.frontend import epipolar as epi
    from svi_mapper_tpu.frontend.recovery import regional_recovery
    from svi_mapper_tpu.frontend.stereo import match_stereo
    from svi_mapper_tpu.frontend.tracking import track_landmarks
    from svi_mapper_tpu.io.synthetic import SyntheticSequence
    from svi_mapper_tpu.models import frame as frame_mod
    from svi_mapper_tpu.ops.corners import detect_corners
    from svi_mapper_tpu.ops.descriptors import brief_at, smooth_brief_dense
    from svi_mapper_tpu.solvers import ba as ba_mod
    from svi_mapper_tpu.solvers.landmark_opt import optimize_landmarks
    from svi_mapper_tpu.solvers.posit import solve_stereo_posit

    params = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=1024,
                                 max_detections=1024)
    seq = SyntheticSequence(n_frames=8, width=width, height=height, step=0.8)
    frames = list(seq)

    # warm a representative state (live landmark table, velocity prior)
    state = frame_mod.init_state(params)
    for (L, R, T) in frames[:6]:
        state, out = frame_mod.process_frame(
            state, jnp.asarray(L), jnp.asarray(R), seq.cam, params,
            jnp.asarray(T, jnp.float32), use_external_prior=True)
    Lf, Rf, Tf = frames[6]
    img_l = jnp.asarray(Lf)
    img_r = jnp.asarray(Rf)
    T_prior = jnp.asarray(Tf, jnp.float32)

    wp = -(-width // 16) * 16
    img_l_ext = jnp.pad(img_l, ((0, 0), (0, wp - width)), mode="edge")
    img_r_ext = jnp.pad(img_r, ((0, 0), (0, wp - width)), mode="edge")

    budget: dict[str, float] = {}

    budget["dense_brief_x2"] = _timeit(
        lambda: (smooth_brief_dense(img_l_ext), smooth_brief_dense(img_r_ext)),
        reps)
    dense_l = smooth_brief_dense(img_l_ext)
    dense_r = smooth_brief_dense(img_r_ext)

    ms = epi.motion_scaling(jnp.eye(4))
    tr = track_landmarks(dense_l, dense_r, state.table, T_prior, seq.cam, ms)
    budget["tracking_window"] = _timeit(
        lambda: track_landmarks(dense_l, dense_r, state.table, T_prior,
                                seq.cam, ms), reps)

    budget["stereo_rematch"] = _timeit(
        lambda: match_stereo(dense_r, tr.uv4[:, :2], tr.desc_left, tr.tracked,
                             seq.cam, cutoff=100), reps)

    budget["posit_gn"] = _timeit(
        lambda: solve_stereo_posit(T_prior, state.table.pos_w, tr.uv4,
                                   tr.tracked, seq.cam, T_prior=T_prior), reps)

    budget["regional_recovery"] = _timeit(
        lambda: regional_recovery(dense_l, dense_r, img_l, state.table,
                                  tr.tracked, T_prior, seq.cam, ms), reps)

    budget["landmark_gn"] = _timeit(
        lambda: optimize_landmarks(state.table, seq.cam), reps)

    budget["detect_corners"] = _timeit(
        lambda: detect_corners(img_l, k=params.max_detections,
                               cell=params.detect_cell, border=28), reps)

    # back-end stages (per keyframe event) --------------------------------
    rng = np.random.default_rng(0)
    K, Lm = 8, 1024
    X = rng.uniform([-20, -2, 5], [20, 2, 60], (Lm, 3)).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    T[:, 2, 3] = -np.arange(K, dtype=np.float32)
    fx = float(seq.cam.left.fx); cx = float(seq.cam.left.cx)
    cy = float(seq.cam.left.cy); bq = float(seq.cam.right.P[0, 3])
    p_c = np.einsum("kij,lj->kli", T[:, :3, :3], X) + T[:, None, :3, 3]
    z = p_c[..., 2]
    u_l = fx * p_c[..., 0] / z + cx
    v_l = fx * p_c[..., 1] / z + cy
    obs = np.stack([u_l, v_l, (fx * p_c[..., 0] + bq) / z + cx, v_l], -1)
    mask = (z > 1.0) & (u_l > 0) & (u_l < width) & (v_l > 0) & (v_l < height)
    fix = np.zeros(K, bool); fix[0] = True
    args = (jnp.asarray(T), jnp.asarray(X + 0.1), jnp.asarray(obs, jnp.float32),
            jnp.asarray(mask), seq.cam, jnp.asarray(fix))
    budget["ba_window_10lm"] = _timeit(
        lambda: ba_mod.bundle_adjust(*args, max_iterations=10,
                                     min_rel_improvement=0.0), max(2, reps // 2))

    # BA window preparation (depth gate + self-consistency re-init + tier
    # weights) — ONE jitted program replacing the former worker-thread
    # numpy einsums (solvers/ba_prep.py; VERDICT r3 Weak-6)
    from svi_mapper_tpu.solvers import ba_prep as prep_mod
    budget["ba_window_prep"] = _timeit(
        lambda: prep_mod.prepare_ba_window(
            jnp.asarray(T), jnp.asarray(obs, jnp.float32), jnp.asarray(mask),
            jnp.asarray(X + 0.1), seq.cam), reps)

    from svi_mapper_tpu.solvers import pose_graph as pg_mod
    N = 64
    Tn = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    Tn[:, 2, 3] = -np.arange(N, dtype=np.float32)
    M_seq = np.matmul(Tn[1:], np.linalg.inv(Tn[:-1]))
    edges = pg_mod.PoseGraphEdges(
        i=jnp.arange(N - 1, dtype=jnp.int32),
        j=jnp.arange(1, N, dtype=jnp.int32),
        T_ij=jnp.asarray(M_seq, jnp.float32),
        weight=jnp.ones(N - 1, jnp.float32),
        valid=jnp.ones(N - 1, bool),
    )
    fixn = np.zeros(N, bool); fixn[0] = True
    budget["pose_graph_64kf"] = _timeit(
        lambda: pg_mod.optimize_pose_graph(jnp.asarray(Tn), edges,
                                           jnp.asarray(fixn)),
        max(2, reps // 2))

    from svi_mapper_tpu.mapping import closure as cm
    from svi_mapper_tpu.mapping.vocabulary import build_vocabulary

    db = cm.KeyframeDatabase.create(64, 256, auto_vocab=False)
    pool_d = rng.integers(0, 2 ** 32, (40, 200, 8), dtype=np.uint64).astype(np.uint32)
    pool_p = rng.uniform(-10, 10, (40, 200, 3)).astype(np.float32)
    for k in range(40):
        db.add(pool_d[k], pool_p[k], np.eye(4, dtype=np.float32))
    vocab = build_vocabulary(pool_d.reshape(-1, 8)[:2000], k=8, levels=3,
                             iters=2)
    from svi_mapper_tpu.mapping.vocabulary import BowDatabase
    db.bow = BowDatabase(vocab, capacity=64)
    for k in range(40):
        db.bow.add(pool_d[k])
    cand = jnp.asarray(np.arange(4, dtype=np.int32))
    Ti = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (4, 4, 4))
    budget["closure_match_icp"] = _timeit(
        lambda: cm.match_pools_many(jnp.int32(39), cand, db.desc, db.p_cam,
                                    db.valid, Ti), reps)
    # the production path: everything above in ONE dispatch (r4)
    budget["closure_query_fused"] = _timeit(
        lambda: cm.closure_query_fused(
            vocab.centroids, vocab.child_valid, vocab.weights,
            db.bow.vectors, jnp.int32(39), db.desc, db.p_cam, db.valid,
            db.T_wc, jnp.int32(29), jnp.float32(np.inf), jnp.int32(25),
            vocab.k, 16, 4, 25), reps)
    return budget


def format_budget(budget: dict) -> str:
    """tracker_gt.cpp:285-308-style stage table."""
    total_fe = sum(v for k, v in budget.items()
                   if not k.startswith(("ba_", "pose_graph", "closure_")))
    lines = ["per-stage device timing (isolated jitted stages; dispatch incl.)",
             "-" * 58]
    for k, v in budget.items():
        lines.append(f"  {k:24s} {v:8.2f} ms")
    lines.append("-" * 58)
    lines.append(f"  front-end stage sum      {total_fe:8.2f} ms "
                 "(fused frame step is cheaper)")
    return "\n".join(lines)
