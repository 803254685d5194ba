"""Photometric-stress accuracy regression (VERDICT r2 Next-1).

The reference proves itself on recorded KITTI / VI-sensor imagery
(tracker_gt.cpp:182-267); no recorded data exists in this sandbox, so the
accuracy claims are instead gated on the photometric stressor suite
(io/stress.py): sensor noise, exposure/gamma drift, motion blur, vignette,
low-texture wall spans, view-dependent sheen, and disparity-correct
occluder panels. Bounds are calibrated on the 2026-08-20 build (1.5-2x the
measured values):

    corridor 120 frames / 48 m, 384x192:
        clean    opt ATE 0.064 m
        mild     opt ATE 0.045 m
        moderate opt ATE 0.162 m
        severe   opt ATE 0.629 m
    loop 120 frames, 512x256, radius 12 m:
        moderate: 7 closures found/accepted via probabilistic matching
                  (exact-Hamming matching finds ZERO — the bit-statistics
                  path is what keeps recall under stress)
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.eval import trajectory as ev
from svi_mapper_tpu.io import stress as st
from svi_mapper_tpu.io.synthetic import SyntheticSequence, default_camera
from svi_mapper_tpu.models.slam import SLAMSystem


# ---------------------------------------------------------------------------
# renderer unit tests (fast)
# ---------------------------------------------------------------------------

def _render_pair(level, i=3, w=128, h=64):
    cam = default_camera(w, h)
    T = jnp.eye(4)
    return st.render_stressed_stereo(cam, T, i, st.PRESETS[level])


def test_stress_deterministic():
    a = np.asarray(_render_pair("severe")[0])
    b = np.asarray(_render_pair("severe")[0])
    np.testing.assert_array_equal(a, b)


def test_clean_preset_matches_quantized_clean_render():
    from svi_mapper_tpu.io.synthetic import render_stereo

    cam = default_camera(128, 64)
    T = jnp.eye(4)
    clean = np.clip(np.round(np.asarray(render_stereo(cam, T)[0])), 0, 255)
    stressed = np.asarray(_render_pair("clean")[0])
    np.testing.assert_allclose(stressed, clean, atol=1.0)


def test_noise_level_measured():
    """Mild preset noise_std=2: the difference from the noise-free variant
    of the same preset must measure ~2 DN (quantization adds ~0.29)."""
    sp = dataclasses.replace(st.MILD, noise_std=0.0)
    cam = default_camera(128, 64)
    T = jnp.eye(4)
    no_noise = np.asarray(st.render_stressed_stereo(cam, T, 3, sp)[0])
    with_noise = np.asarray(_render_pair("mild")[0])
    d = with_noise - no_noise
    assert 1.2 < d.std() < 3.0


def test_exposure_drift_changes_over_frames():
    sp = st.StressParams(gain_amp=0.2, gain_period=10.0)
    cam = default_camera(128, 64)
    T = jnp.eye(4)
    means = [float(np.asarray(
        st.render_stressed_stereo(cam, T, i, sp)[0]).mean())
        for i in (0, 2, 5, 7)]
    assert max(means) - min(means) > 5.0


def test_occluder_disparity_consistent():
    """The occluder panel must appear shifted by fx*b/z in the right view
    (a physical panel, not painted-on dirt at infinity)."""
    sp = st.StressParams(occluders=((0.5, 0.5, 0.1, 0.1, 2.0, 0.0),),
                         occluder_intensity=0.0)
    cam = default_camera(256, 128)
    T = jnp.eye(4)
    L, R = st.render_stressed_stereo(cam, T, 0, sp)
    cL, cR = _render_pair("clean", i=0, w=256, h=128)
    L, R, cL, cR = (np.asarray(a) for a in (L, R, cL, cR))
    row = 64
    # occluded = blacked out relative to the clean render (texture pixels
    # that are already near-black are excluded)
    dark_l = np.nonzero((L[row] == 0.0) & (cL[row] > 10))[0]
    dark_r = np.nonzero((R[row] == 0.0) & (cR[row] > 10))[0]
    disp = float(cam.left.fx * cam.baseline / 2.0)
    assert len(dark_l) and len(dark_r)
    assert abs((np.median(dark_l) - np.median(dark_r)) - disp) < 2.0


def test_lowtex_span_reduces_contrast():
    sp = st.StressParams(lowtex_spans=((5.0, 40.0),), lowtex_strength=0.9)
    cam = default_camera(128, 64)
    T = jnp.eye(4)
    flat = np.asarray(st.render_stressed_stereo(cam, T, 0, sp)[0])
    clean = np.asarray(_render_pair("clean", i=0)[0])
    # the lower half of the image is dominated by near ground-plane hits
    # inside the span -> its contrast must collapse (the 2 m sigmoid
    # shoulders and hits beyond the span keep some residual contrast)
    assert flat[40:].std() < 0.55 * clean[40:].std()


def test_specular_differs_between_views():
    sp = st.StressParams(specular_amp=0.4)
    L, R = _render_pair("clean")
    cam = default_camera(128, 64)
    T = jnp.eye(4)
    Ls, Rs = st.render_stressed_stereo(cam, T, 0, sp)
    dL = np.abs(np.asarray(Ls) - np.asarray(L))
    dR = np.abs(np.asarray(Rs) - np.asarray(R))
    # sheen present in both, but at DIFFERENT pixels (view-dependent)
    assert dL.max() > 20 and dR.max() > 20
    assert np.abs(dL - dR).max() > 20


# ---------------------------------------------------------------------------
# probabilistic closure matching under descriptor noise (fast)
# ---------------------------------------------------------------------------

def test_probabilistic_matching_survives_bit_noise(rng):
    """Pools whose snapshots differ by ~30 random bits: exact Hamming at
    cutoff 25 matches almost nothing, expected-Hamming against the bit
    means (noise-free here) stays well under the probability cutoff 50
    (ref CKeyFrame.h:13)."""
    from svi_mapper_tpu.mapping import closure as cm
    from svi_mapper_tpu.ops.descriptors import pack_bits

    P = 64
    base = rng.integers(0, 2, size=(P, 256)).astype(np.uint8)

    def noisy(bits):
        flip = rng.random(bits.shape) < (30.0 / 256.0)
        return np.where(flip, 1 - bits, bits).astype(np.uint8)

    desc_q = np.asarray(pack_bits(jnp.asarray(noisy(base))))
    desc_r = np.asarray(pack_bits(jnp.asarray(noisy(base))))
    p_q = rng.normal(size=(P, 3)).astype(np.float32)
    prob = (base * 255).astype(np.uint8)  # converged bit means
    valid = np.ones(P, bool)

    _, _, ok_exact, _ = cm.match_pools(
        jnp.asarray(desc_q), jnp.asarray(p_q), jnp.asarray(valid),
        jnp.asarray(desc_r), jnp.asarray(p_q), jnp.asarray(valid), cutoff=25)
    _, _, ok_prob, fwd = cm.match_pools(
        jnp.asarray(desc_q), jnp.asarray(p_q), jnp.asarray(valid),
        jnp.asarray(desc_r), jnp.asarray(p_q), jnp.asarray(valid),
        prob_q=jnp.asarray(prob), prob_r=jnp.asarray(prob), prob_cutoff=50.0)
    n_exact = int(np.sum(np.asarray(ok_exact)))
    n_prob = int(np.sum(np.asarray(ok_prob)))
    assert n_exact < P // 3          # exact matching starved
    assert n_prob > 0.9 * P          # probabilistic keeps nearly all
    # and the matches are the RIGHT correspondences
    ok = np.asarray(ok_prob)
    assert (np.asarray(fwd)[ok] == np.arange(P)[ok]).all()


def test_db_stores_quantized_probabilities(rng):
    from svi_mapper_tpu.mapping import closure as cm

    db = cm.KeyframeDatabase.create(capacity=4, pool_size=8, auto_vocab=False)
    desc = rng.integers(0, 2**32, size=(5, 8), dtype=np.uint32)
    prob = rng.integers(0, 256, size=(5, 256), dtype=np.uint8)
    db.add(desc, rng.normal(size=(5, 3)).astype(np.float32), np.eye(4),
           prob=prob)
    np.testing.assert_array_equal(np.asarray(db.prob[0][:5]), prob)
    # no-prob add falls back to the 0/255 binary degenerate
    db.add(desc, rng.normal(size=(5, 3)).astype(np.float32), np.eye(4))
    stored = np.asarray(db.prob[1][:5])
    assert set(np.unique(stored)) <= {0, 255}


# ---------------------------------------------------------------------------
# end-to-end accuracy under stress (slow)
# ---------------------------------------------------------------------------

def _run_corridor(level: str, n: int = 120):
    params = dataclasses.replace(DEFAULT_PARAMS, max_landmarks=512,
                                 max_detections=512)
    seq = st.StressedSequence(n_frames=n, width=384, height=192, step=0.4,
                              stress=level)
    frames = [(np.asarray(f[0]), np.asarray(f[1]), f[2]) for f in seq]
    Ls = np.stack([f[0] for f in frames])
    Rs = np.stack([f[1] for f in frames])
    Ts = np.stack([f[2] for f in frames])
    s = SLAMSystem(seq.cam, params)
    s.process_many(Ls, Rs, chunk=16)
    tracked = np.asarray([int(o.n_tracked) for o in s.outputs])
    m = ev.evaluate(s.optimized_trajectory(), Ts)
    return tracked, m


@pytest.mark.slow
def test_corridor_accuracy_moderate_stress():
    tracked, m = _run_corridor("moderate")
    assert (tracked[5:] >= 40).all(), \
        f"tracking collapsed: min {tracked[5:].min()}"
    assert m.ate_rmse_m < 0.35, f"ATE {m.ate_rmse_m:.3f}"
    assert m.rel_trans_ratio < 0.10


@pytest.mark.slow
def test_corridor_survives_severe_stress():
    """Severe stress degrades accuracy but must not break tracking."""
    tracked, m = _run_corridor("severe")
    assert (tracked[5:] >= 30).all(), \
        f"tracking collapsed: min {tracked[5:].min()}"
    assert m.ate_rmse_m < 1.3, f"ATE {m.ate_rmse_m:.3f}"


@pytest.mark.slow
def test_loop_closure_recall_under_stress():
    """Moderate stress pushes revisit descriptors ~30 bits apart: exact
    matching finds zero closures; the probabilistic (bit-statistics) path
    must keep recall (measured 2026-08-20: 7 vs 0)."""
    seq = st.StressedSequence(n_frames=120, width=512, height=256,
                              trajectory="loop", loop_radius=12.0,
                              stress="moderate")
    frames = [(np.asarray(f[0]), np.asarray(f[1]), f[2]) for f in seq]
    Ls = np.stack([f[0] for f in frames])
    Rs = np.stack([f[1] for f in frames])
    Ts = np.stack([f[2] for f in frames])

    # circular-loop world overrides (see tests/test_slam.py PARAMS rationale)
    loop_params = dataclasses.replace(
        DEFAULT_PARAMS, closure_exclude_recent=10,
        max_motion_scaling_for_optimization=2.5)
    s = SLAMSystem(seq.cam, loop_params, enable_local_ba=True,
                   enable_loop_closure=True)
    s.process_many(Ls, Rs, chunk=16)
    s.flush_closures()
    assert s.stats["closures_found"] >= 2
    assert s.stats["closures_accepted"] >= 1
    m = ev.evaluate(s.optimized_trajectory(), Ts)
    mr = ev.evaluate(s.trajectory_array, Ts)
    assert mr.ate_rmse_m < 0.55
    # noisy ICP closures must not blow up the optimized trajectory
    assert m.ate_rmse_m < 1.6 * mr.ate_rmse_m + 0.05


# ---------------------------------------------------------------------------
# closure PRECISION under perceptual aliasing (VERDICT r3 Next-5)
# ---------------------------------------------------------------------------

def test_alias_period_renders_identical_places():
    """The aliased world really is an aliasing attack: views 24 m apart
    along the corridor are pixel-identical."""
    seq = SyntheticSequence(n_frames=2, width=128, height=64,
                            alias_period=24.0)
    from svi_mapper_tpu.io.synthetic import render_stereo
    import jax.numpy as jnp

    T0 = np.eye(4, dtype=np.float32)
    T1 = T0.copy(); T1[2, 3] = -24.0   # camera advanced 24 m along +z
    a = np.asarray(render_stereo(seq.cam, jnp.asarray(T0), 24.0)[0])
    b = np.asarray(render_stereo(seq.cam, jnp.asarray(T1), 24.0)[0])
    # identical except for the (distant) far-wall region near the
    # vanishing point, whose distance is NOT period-folded
    assert (np.abs(a - b) > 1.0).mean() < 0.02


@pytest.mark.slow
@pytest.mark.parametrize("probabilistic", [False, True],
                         ids=["exact", "probabilistic"])
def test_no_false_closures_in_aliased_corridor(probabilistic):
    """A straight corridor whose texture repeats every 24 m: every place
    has a perfect visual twin 24/48 m away, and NO true revisit exists —
    any accepted closure is a false positive. The metric search-radius
    gate (ref m_dLoopClosingRadiusSquaredMetersL2 = 25, CTrackerSV.h:89)
    must hold precision at zero false closures under exact AND
    probabilistic matching."""
    params = dataclasses.replace(
        DEFAULT_PARAMS, max_landmarks=512, max_detections=512,
        keyframe_translation_m2=9.0,     # keyframe every 3 m -> dense pools
        closure_probabilistic=probabilistic,
    )
    seq = SyntheticSequence(n_frames=160, width=512, height=256, step=0.4,
                            alias_period=24.0)
    frames = [(np.asarray(f[0]), np.asarray(f[1]), f[2]) for f in seq]
    Ls = np.stack([f[0] for f in frames])
    Rs = np.stack([f[1] for f in frames])
    s = SLAMSystem(seq.cam, params, enable_local_ba=True,
                   enable_loop_closure=True)
    s.process_many(Ls, Rs, chunk=16)
    s.finalize_backend()
    assert len(s.slam_keyframes) >= 12      # pools actually accumulated
    assert s.stats["closures_accepted"] == 0, (
        f"false closures accepted in aliased corridor: "
        f"{[(c.ref_kf, c.query_kf) for c in s.accepted_closures]}")
