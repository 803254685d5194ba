"""Tests for the back-end: BA, pose graph, ICP, loop-closure subsystem."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svi_mapper_tpu.geometry import se3
from svi_mapper_tpu.mapping import closure
from svi_mapper_tpu.solvers import ba, icp, pose_graph as pg
from tests.test_solvers import make_cam, make_world, observe


def _chain(rng, n, step=0.8, noise=0.0):
    """Ground-truth pose chain + optionally noisy odometry estimate."""
    T_true = [np.eye(4, dtype=np.float32)]
    for k in range(1, n):
        d = np.asarray(se3.exp_se3(jnp.asarray(
            [0.01 * rng.normal(), 0, step, 0, 0.02 * np.sin(k * 0.3), 0], jnp.float32)))
        T_true.append(np.asarray(d @ T_true[-1], dtype=np.float32))
    T_true = np.stack(T_true)
    if noise == 0.0:
        return T_true, T_true.copy()
    T_est = [T_true[0]]
    for k in range(1, n):
        M = T_true[k] @ np.linalg.inv(T_true[k - 1])
        nz = np.asarray(se3.exp_se3(jnp.asarray(rng.normal(0, noise, 6).astype(np.float32))))
        T_est.append((nz @ M @ T_est[-1]).astype(np.float32))
    return T_true, np.stack(T_est)


# ---------------------------------------------------------------------------
# bundle adjustment
# ---------------------------------------------------------------------------

def test_ba_recovers_poses_and_points(rng):
    cam = make_cam()
    K, L = 6, 200
    X_true = make_world(rng, L)
    T_true = np.stack([
        np.asarray(se3.exp_se3(jnp.asarray([0, 0, -0.6 * k, 0, 0.01 * k, 0], jnp.float32)))
        for k in range(K)
    ])
    obs = np.zeros((K, L, 4), np.float32)
    for k in range(K):
        uv4, _ = observe(cam, T_true[k], X_true, noise=0.2, rng=rng)
        obs[k] = uv4
    T0 = T_true.copy()
    for k in range(1, K):
        d = np.asarray(se3.exp_se3(jnp.asarray(rng.normal(0, 0.03, 6).astype(np.float32))))
        T0[k] = d @ T0[k]
    X0 = X_true + rng.normal(0, 0.3, (L, 3)).astype(np.float32)
    fix = np.zeros(K, bool); fix[0] = True
    res = ba.bundle_adjust(
        jnp.asarray(T0), jnp.asarray(X0), jnp.asarray(obs),
        jnp.ones((K, L), bool), cam, jnp.asarray(fix),
    )
    assert float(res.chi2_final) < 0.05 * float(res.chi2_initial)
    T_err = max(np.abs(np.asarray(res.T_wc)[k] - T_true[k]).max() for k in range(K))
    assert T_err < 0.01
    X_err = np.linalg.norm(np.asarray(res.points_w) - X_true, axis=-1)
    assert np.median(X_err) < 0.15
    # gauge: fixed pose untouched
    assert np.allclose(np.asarray(res.T_wc)[0], T0[0])


def test_ba_respects_observation_mask(rng):
    cam = make_cam()
    K, L = 4, 64
    X_true = make_world(rng, L)
    T_true = np.stack([
        np.asarray(se3.exp_se3(jnp.asarray([0, 0, -0.5 * k, 0, 0, 0], jnp.float32)))
        for k in range(K)
    ])
    obs = np.zeros((K, L, 4), np.float32)
    for k in range(K):
        uv4, _ = observe(cam, T_true[k], X_true)
        obs[k] = uv4
    # garbage in masked-out entries must not affect the solution
    obs_bad = obs.copy()
    mask = np.ones((K, L), bool)
    mask[2, :20] = False
    obs_bad[2, :20] = 9999.0
    fix = np.zeros(K, bool); fix[0] = True
    res = ba.bundle_adjust(
        jnp.asarray(T_true), jnp.asarray(X_true), jnp.asarray(obs_bad),
        jnp.asarray(mask), cam, jnp.asarray(fix),
    )
    assert float(res.chi2_final) < 1e-3
    assert np.abs(np.asarray(res.T_wc) - T_true).max() < 1e-3


def test_ba_robust_to_outlier_observations(rng):
    cam = make_cam()
    K, L = 5, 128
    X_true = make_world(rng, L)
    T_true = np.stack([
        np.asarray(se3.exp_se3(jnp.asarray([0, 0, -0.5 * k, 0, 0.01 * k, 0], jnp.float32)))
        for k in range(K)
    ])
    obs = np.zeros((K, L, 4), np.float32)
    for k in range(K):
        uv4, _ = observe(cam, T_true[k], X_true, noise=0.2, rng=rng)
        obs[k] = uv4
    obs[:, :10, 0] += 50.0  # 10 badly corrupted landmarks
    T0 = T_true.copy()
    for k in range(1, K):
        d = np.asarray(se3.exp_se3(jnp.asarray(rng.normal(0, 0.02, 6).astype(np.float32))))
        T0[k] = d @ T0[k]
    fix = np.zeros(K, bool); fix[0] = True
    res = ba.bundle_adjust(
        jnp.asarray(T0), jnp.asarray(X_true), jnp.asarray(obs),
        jnp.ones((K, L), bool), cam, jnp.asarray(fix),
    )
    T_err = max(np.abs(np.asarray(res.T_wc)[k] - T_true[k]).max() for k in range(K))
    assert T_err < 0.02


# ---------------------------------------------------------------------------
# pose graph
# ---------------------------------------------------------------------------

def test_pose_graph_closes_loop(rng):
    N = 40
    T_true, T_est = _chain(rng, N, noise=0.01)
    ei, ej, Ms, ws = [], [], [], []
    for k in range(1, N):
        M = (T_est[k] @ np.linalg.inv(T_est[k - 1])).astype(np.float32)
        ei.append(k - 1); ej.append(k); Ms.append(M); ws.append(1.0)
    # exact loop-closure measurement between ends
    ei.append(0); ej.append(N - 1)
    Ms.append((T_true[N - 1] @ np.linalg.inv(T_true[0])).astype(np.float32)); ws.append(1.0)
    edges = pg.PoseGraphEdges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        T_ij=jnp.asarray(np.stack(Ms)), weight=jnp.asarray(ws, jnp.float32),
        valid=jnp.ones(len(ei), bool),
    )
    fix = np.zeros(N, bool); fix[0] = True
    res = pg.optimize_pose_graph(jnp.asarray(T_est), edges, jnp.asarray(fix))
    drift0 = np.linalg.norm(
        np.linalg.inv(T_est)[-1, :3, 3] - np.linalg.inv(T_true)[-1, :3, 3])
    opt = np.asarray(res.T_wc)
    drift1 = np.linalg.norm(
        np.linalg.inv(opt)[-1, :3, 3] - np.linalg.inv(T_true)[-1, :3, 3])
    assert drift1 < 0.05 * max(drift0, 1e-9)
    assert float(res.chi2_final) < float(res.chi2_initial)
    assert np.allclose(opt[0], T_est[0])  # gauge


def test_pose_graph_invalid_edges_ignored(rng):
    N = 10
    T_true, T_est = _chain(rng, N, noise=0.0)
    ei, ej, Ms = [], [], []
    for k in range(1, N):
        M = (T_true[k] @ np.linalg.inv(T_true[k - 1])).astype(np.float32)
        ei.append(k - 1); ej.append(k); Ms.append(M)
    # an absurd but INVALID edge must have no effect
    ei.append(0); ej.append(N - 1)
    bogus = np.eye(4, dtype=np.float32); bogus[0, 3] = 500.0
    Ms.append(bogus)
    valid = np.ones(len(ei), bool); valid[-1] = False
    edges = pg.PoseGraphEdges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        T_ij=jnp.asarray(np.stack(Ms)), weight=jnp.ones(len(ei), jnp.float32),
        valid=jnp.asarray(valid),
    )
    fix = np.zeros(N, bool); fix[0] = True
    res = pg.optimize_pose_graph(jnp.asarray(T_est), edges, jnp.asarray(fix))
    assert np.abs(np.asarray(res.T_wc) - T_true).max() < 1e-3


def test_ba_depth_weighting_beats_uniform(rng):
    """Depth-tiered observation information (ref dInformationFactor = 1/z,
    Cg2oOptimizer.cpp:1403-1466): on a scene where far landmarks carry the
    realistically larger stereo-matching noise, the 1/z weighting must
    recover poses better than uniform weighting."""
    cam = make_cam()
    K = 6
    L_near, L_far = 96, 96
    X_near = rng.uniform([-4, -2, 4], [4, 2, 10], (L_near, 3)).astype(np.float32)
    X_far = rng.uniform([-30, -10, 50], [30, 10, 90], (L_far, 3)).astype(np.float32)
    X_true = np.concatenate([X_near, X_far])
    L = L_near + L_far
    T_true = np.stack([
        np.asarray(se3.exp_se3(jnp.asarray([0, 0, -0.5 * k, 0, 0.01 * k, 0], jnp.float32)))
        for k in range(K)
    ])
    obs = np.zeros((K, L, 4), np.float32)
    for k in range(K):
        uv_n, _ = observe(cam, T_true[k], X_near, noise=0.3, rng=rng)
        uv_f, _ = observe(cam, T_true[k], X_far, noise=2.5, rng=rng)
        obs[k] = np.concatenate([uv_n, uv_f])
    T0 = T_true.copy()
    for k in range(1, K):
        d = np.asarray(se3.exp_se3(jnp.asarray(rng.normal(0, 0.02, 6).astype(np.float32))))
        T0[k] = d @ T0[k]
    X0 = X_true + rng.normal(0, 0.2, (L, 3)).astype(np.float32)
    fix = np.zeros(K, bool); fix[0] = True
    # information weight from the MEASURED depth (disparity), as _run_ba does
    bq = float(cam.right.P[0, 3])
    disp = obs[..., 0] - obs[..., 2]
    z = np.where(disp > 0.01, -bq / np.maximum(disp, 0.01), np.inf)
    w = 1.0 / np.clip(z, 1.0, 1e4)
    w = (w / w.mean()).astype(np.float32)
    errs = {}
    for name, obs_w in (("uniform", None), ("tiered", jnp.asarray(w))):
        res = ba.bundle_adjust(
            jnp.asarray(T0), jnp.asarray(X0), jnp.asarray(obs),
            jnp.ones((K, L), bool), cam, jnp.asarray(fix), obs_w=obs_w,
        )
        errs[name] = max(
            np.abs(np.asarray(res.T_wc)[k] - T_true[k]).max() for k in range(K))
    assert errs["tiered"] < errs["uniform"], errs


def test_pose_graph_z_damped_closure_edge(rng):
    """Anisotropic closure information (ref _getInformationNoZ,
    Cg2oOptimizer.cpp:1542-1550): a closure measurement with a large
    optical-axis (z) error must not drag the trajectory when its z
    information is damped x100."""
    N = 30
    T_true, T_est = _chain(rng, N, noise=0.008)
    ei, ej, Ms, ws = [], [], [], []
    for k in range(1, N):
        M = (T_est[k] @ np.linalg.inv(T_est[k - 1])).astype(np.float32)
        ei.append(k - 1); ej.append(k); Ms.append(M)
        ws.append(float(pg.sequential_edge_weight(jnp.asarray(M))))
    # closure with a 2 m z error in the local (camera) frame — the noisy
    # ICP depth direction
    M_clo = (T_true[N - 1] @ np.linalg.inv(T_true[0])).astype(np.float32)
    z_err = np.eye(4, dtype=np.float32); z_err[2, 3] = 2.0
    ei.append(0); ej.append(N - 1)
    Ms.append((z_err @ M_clo).astype(np.float32)); ws.append(1.0)
    E = len(ei)
    fix = np.zeros(N, bool); fix[0] = True
    errs = {}
    for name, zdamp in (("iso", 1.0), ("damped", 0.01)):
        info6 = np.ones((E, 6), np.float32)
        info6[-1, 2] = zdamp
        edges = pg.PoseGraphEdges(
            i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
            T_ij=jnp.asarray(np.stack(Ms)),
            weight=jnp.asarray(ws, jnp.float32),
            valid=jnp.ones(E, bool), info6=jnp.asarray(info6),
        )
        res = pg.optimize_pose_graph(jnp.asarray(T_est), edges, jnp.asarray(fix))
        opt = np.asarray(res.T_wc)
        c_opt = np.linalg.inv(opt)[:, :3, 3]
        c_true = np.linalg.inv(T_true)[:, :3, 3]
        errs[name] = float(np.sqrt(((c_opt - c_true) ** 2).sum(-1).mean()))
    assert errs["damped"] < errs["iso"], errs


def test_adjoint_identity(rng):
    """Ad(T) must satisfy T exp(xi) T^-1 = exp(Ad(T) xi)."""
    T = np.asarray(se3.exp_se3(jnp.asarray(rng.normal(0, 0.5, 6).astype(np.float32))))
    xi = rng.normal(0, 0.1, 6).astype(np.float32)
    lhs = T @ np.asarray(se3.exp_se3(jnp.asarray(xi))) @ np.linalg.inv(T)
    Ad = np.asarray(pg.adjoint(jnp.asarray(T)))
    rhs = np.asarray(se3.exp_se3(jnp.asarray(Ad @ xi)))
    assert np.allclose(lhs, rhs, atol=1e-4)


# ---------------------------------------------------------------------------
# ICP
# ---------------------------------------------------------------------------

def test_icp_recovers_transform(rng):
    p_ref = make_world(rng, 100)
    T_true = np.asarray(se3.exp_se3(jnp.asarray([1.0, -0.5, 2.0, 0.05, 0.1, -0.02], jnp.float32)))
    p_query = np.array(se3.transform(jnp.asarray(T_true), jnp.asarray(p_ref)))
    p_query += rng.normal(0, 0.02, p_query.shape).astype(np.float32)
    res = icp.align_clouds(jnp.asarray(p_query), jnp.asarray(p_ref), jnp.ones(100, bool))
    assert bool(res.ok)
    assert np.abs(np.asarray(res.T_qr) - T_true).max() < 0.02
    assert int(res.inliers) == 100


def test_icp_robust_and_gates(rng):
    p_ref = make_world(rng, 60)
    T_true = np.asarray(se3.exp_se3(jnp.asarray([0.5, 0, 1.0, 0, 0.05, 0], jnp.float32)))
    p_query = np.array(se3.transform(jnp.asarray(T_true), jnp.asarray(p_ref)))
    p_query[:12] += 30.0  # 20% gross outliers
    res = icp.align_clouds(jnp.asarray(p_query), jnp.asarray(p_ref), jnp.ones(60, bool))
    assert bool(res.ok)
    assert np.abs(np.asarray(res.T_qr) - T_true).max() < 0.05
    # too few points -> gate fails
    res2 = icp.align_clouds(
        jnp.asarray(p_query[:10]), jnp.asarray(p_ref[:10]), jnp.ones(10, bool))
    assert not bool(res2.ok)


# ---------------------------------------------------------------------------
# loop closure pipeline
# ---------------------------------------------------------------------------

def _fake_pool(rng, n):
    desc = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint64).astype(np.uint32)
    return desc


def test_score_pools_identifies_revisit(rng):
    db = closure.KeyframeDatabase.create(capacity=8, pool_size=64)
    pools = [_fake_pool(rng, 50) for _ in range(4)]
    pts = [make_world(rng, 50) for _ in range(4)]
    for d, p in zip(pools, pts):
        db.add(d, p, np.eye(4))
    # query = noisy copy of pool 1 (flip 2 bits/descriptor)
    q = pools[1].copy()
    q[:, 0] ^= 0b11
    scores = np.asarray(closure.score_pools(
        jnp.asarray(np.pad(q, ((0, 14), (0, 0)))), jnp.asarray([True] * 50 + [False] * 14),
        db.desc, db.valid, cutoff=25,
    ))
    assert scores[1] == 50
    assert scores[1] > 2 * max(scores[0], scores[2], scores[3])


def test_find_closures_end_to_end(rng):
    """A revisited place must produce a validated closure with the correct
    relative transform; unrelated keyframes must not."""
    db = closure.KeyframeDatabase.create(capacity=32, pool_size=128)
    world_pts = make_world(rng, 100)
    desc_shared = _fake_pool(rng, 100)

    # keyframe 0: sees the place from identity
    T0 = np.eye(4, dtype=np.float32)
    db.add(desc_shared, world_pts, T0)
    # keyframes 1..11: elsewhere (random descriptors/points)
    for k in range(11):
        db.add(_fake_pool(rng, 100), make_world(rng, 100), np.eye(4))
    # keyframe 12: revisits the place with a pose offset
    T12 = np.asarray(se3.exp_se3(jnp.asarray([0.5, 0.1, 1.0, 0.02, 0.3, 0.01], jnp.float32)))
    p_cam_12 = np.asarray(se3.transform(jnp.asarray(T12), jnp.asarray(world_pts)))
    db.add(desc_shared, p_cam_12, T12)

    found = closure.find_closures(db, 12, exclude_recent=2)
    assert len(found) == 1
    c = found[0]
    assert c.ref_kf == 0
    T_expected = T12 @ np.linalg.inv(T0)
    assert np.abs(c.T_qr - T_expected).max() < 0.02
    assert c.inliers >= 90


def test_find_closures_batch_matches_sequential(rng):
    """The chunk-batched query (one vmapped dispatch for all of a chunk's
    keyframes, r5) must return exactly what per-keyframe find_closures
    returns for the same queries."""
    db = closure.KeyframeDatabase.create(capacity=32, pool_size=128)
    world_pts = make_world(rng, 100)
    desc_shared = _fake_pool(rng, 100)
    db.add(desc_shared, world_pts, np.eye(4, dtype=np.float32))
    for k in range(11):
        db.add(_fake_pool(rng, 100), make_world(rng, 100), np.eye(4))
    T12 = np.asarray(se3.exp_se3(
        jnp.asarray([0.5, 0.1, 1.0, 0.02, 0.3, 0.01], jnp.float32)))
    p_cam_12 = np.asarray(se3.transform(jnp.asarray(T12),
                                        jnp.asarray(world_pts)))
    db.add(desc_shared, p_cam_12, T12)
    db.add(_fake_pool(rng, 100), make_world(rng, 100), np.eye(4))

    queries = [11, 12, 13]
    seq_results = [closure.find_closures(db, q, exclude_recent=2)
                   for q in queries]
    batch_results = closure.find_closures_batch(db, queries,
                                                exclude_recent=2)
    assert len(batch_results) == len(queries)
    for seq_r, bat_r in zip(seq_results, batch_results):
        assert len(seq_r) == len(bat_r)
        for a, b in zip(seq_r, bat_r):
            assert (a.query_kf, a.ref_kf) == (b.query_kf, b.ref_kf)
            assert a.matches == b.matches
            assert a.inliers == b.inliers
            assert np.allclose(a.T_qr, b.T_qr, atol=1e-5)
            assert np.array_equal(a.pairs, b.pairs)
    # the revisit query found its closure through the batched path
    assert len(batch_results[1]) == 1 and batch_results[1][0].ref_kf == 0


def test_consensus_filters_bad_closures(rng):
    """Two agreeing closures + one inconsistent one: consensus keeps the
    agreeing pair (ref LoopClosureChecker semantics)."""
    N = 20
    T_true, T_est = _chain(rng, N, noise=0.02)
    # candidates: edges ref 0 -> queries 17, 18 with TRUE transforms (agree),
    # plus one bogus edge
    idx_i = np.asarray([0, 0, 1], np.int32)
    idx_j = np.asarray([17, 18, 19], np.int32)
    M = np.stack([
        T_true[17] @ np.linalg.inv(T_true[0]),
        T_true[18] @ np.linalg.inv(T_true[0]),
        np.asarray(se3.exp_se3(jnp.asarray([5.0, 2.0, 1.0, 0.4, 0.2, 0.1], jnp.float32))),
    ]).astype(np.float32)
    chi2 = closure.consensus_matrix(
        jnp.asarray(M), jnp.asarray(T_est[idx_i]), jnp.asarray(T_est[idx_j]),
        jnp.ones(3, bool),
    )
    accept, count = closure.consensus_filter(np.asarray(chi2), jnp.ones(3, bool), threshold=0.25)
    accept = np.asarray(accept)
    assert accept[0] and accept[1] and not accept[2]
    assert int(count) == 2
    # host mirror (the production consensus path — zero device round
    # trips): same chi^2 matrix to float32 tolerance, same decision
    chi2_np = closure.consensus_matrix_np(M, T_est[idx_i], T_est[idx_j])
    np.testing.assert_allclose(chi2_np, np.asarray(chi2), rtol=2e-3,
                               atol=2e-3)


def test_log_se3_np_matches_device(rng):
    """Host float64 SE(3) log (consensus path) == geometry.se3.log_se3 on
    random, small-angle and identity transforms."""
    xs = rng.normal(0, 1.0, (64, 6)).astype(np.float32)
    xs[:8] *= 1e-5                               # near-identity branch
    xs[8] = 0.0                                  # exact identity
    xs[9, 3:] = [np.pi - 1e-5, 0, 0]             # near-pi branch
    T = np.asarray(se3.exp_se3(jnp.asarray(xs)))
    got = closure._log_se3_np(T)
    want = np.asarray(se3.log_se3(jnp.asarray(T)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_keyframe_db_grows_and_shortlists_by_default():
    """VERDICT item-7 acceptance: the capacity assert is gone (the DB
    doubles when full), and closure queries run through a shortlist by
    default — the native descriptor index when built, else a BoW
    vocabulary trained in-run on the first keyframes
    (ref always-on DBoW2 shortlisting, CTrackerGT.cpp:39,411)."""
    rng = np.random.default_rng(5)
    db = closure.KeyframeDatabase.create(capacity=4, pool_size=64)
    assert db.auto_vocab and db.bow is None     # trains once pools accrue

    def pool(seed):
        r = np.random.default_rng(seed)
        d = r.integers(0, 2 ** 32, (48, 8), dtype=np.uint64).astype(np.uint32)
        p = r.uniform(-5, 5, (48, 3)).astype(np.float32)
        return d, p

    T = np.eye(4, dtype=np.float32)
    n_total = 40
    revisit_of = 3
    for k in range(n_total):
        Tk = T.copy(); Tk[0, 3] = 0.3 * k
        if k == n_total - 1:
            d, p = pool(revisit_of)       # exact revisit of keyframe 3
            # a couple of flipped bits so it isn't a byte-identical pool
            d = d.copy(); d[:, 0] ^= np.uint32(1)
            Tk = np.eye(4, dtype=np.float32); Tk[0, 3] = 0.3 * revisit_of
        else:
            d, p = pool(k)
        db.add(d, p, Tk)
    assert db.n == n_total
    assert db.capacity >= n_total        # grew past the initial 4
    assert db.bow is not None            # in-run vocabulary trained

    found = closure.find_closures(db, n_total - 1, min_matches=20,
                                  min_relative=0.25)
    assert any(c.ref_kf == revisit_of for c in found)
    # matched identity pairs come with the candidate
    c = next(c for c in found if c.ref_kf == revisit_of)
    assert len(c.pairs) >= 20
