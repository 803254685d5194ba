"""Pallas stereo scanline-profile kernel vs the XLA row-slice path.

match_stereo(force_kernel=True) (interpret mode on CPU) must reproduce the
default path's outputs exactly — same matches, disparities, distances and
acceptance — since the kernel only replaces the candidate fetch + popcount
of the CTriangulator-analog matcher (CTriangulator.cpp:13-356).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svi_mapper_tpu.frontend.stereo import match_stereo
from svi_mapper_tpu.io.synthetic import SyntheticSequence
from svi_mapper_tpu.ops.descriptors import brief_at, smooth_brief_dense


@pytest.fixture(scope="module")
def scene():
    seq = SyntheticSequence(n_frames=2, width=512, height=256, step=0.8)
    l, r, _ = seq.frame(0)
    dense_l = smooth_brief_dense(jnp.asarray(l))
    dense_r = smooth_brief_dense(jnp.asarray(r))
    return seq.cam, dense_l, dense_r


def _compare(sm_a, sm_b, atol=0.0):
    np.testing.assert_array_equal(np.asarray(sm_a.ok), np.asarray(sm_b.ok))
    acc = np.asarray(sm_a.ok)
    # rejected rows carry argmin-of-all-masked garbage that legitimately
    # differs between span widths; values only matter where accepted
    for field in ("disparity", "distance", "depth"):
        np.testing.assert_allclose(
            np.asarray(getattr(sm_a, field))[acc],
            np.asarray(getattr(sm_b, field))[acc], atol=atol,
            err_msg=field)


def test_kernel_matches_xla_path(scene, rng):
    cam, dense_l, dense_r = scene
    K = 256
    uv = jnp.asarray(np.stack([
        rng.uniform(0, 511, K), rng.uniform(0, 255, K)], 1).astype(np.float32))
    desc = brief_at(dense_l, uv)
    valid = jnp.ones(K, bool)
    a = match_stereo(dense_r, uv, desc, valid, cam)
    b = match_stereo(dense_r, uv, desc, valid, cam, force_kernel=True)
    assert int(np.asarray(a.ok).sum()) > 50
    _compare(a, b)


def test_kernel_matches_with_disparity_bounds(scene, rng):
    cam, dense_l, dense_r = scene
    K = 128
    uv = jnp.asarray(np.stack([
        rng.uniform(30, 480, K), rng.uniform(10, 250, K)], 1).astype(np.float32))
    desc = brief_at(dense_l, uv)
    valid = jnp.ones(K, bool)
    center = jnp.asarray(rng.uniform(2, 50, K).astype(np.float32))
    rngs = jnp.maximum(jnp.asarray(20.0), 0.5 * center)
    a = match_stereo(dense_r, uv, desc, valid, cam,
                     disparity_center=center, search_range=rngs, cutoff=50)
    b = match_stereo(dense_r, uv, desc, valid, cam,
                     disparity_center=center, search_range=rngs, cutoff=50,
                     force_kernel=True)
    _compare(a, b)


def test_kernel_small_image(rng):
    """Width below the search range (EuRoC-test-sized frames)."""
    seq = SyntheticSequence(n_frames=1, width=64, height=48, step=0.4)
    l, r, _ = seq.frame(0)
    dense_l = smooth_brief_dense(jnp.asarray(l))
    dense_r = smooth_brief_dense(jnp.asarray(r))
    K = 32
    uv = jnp.asarray(np.stack([
        rng.uniform(0, 63, K), rng.uniform(0, 47, K)], 1).astype(np.float32))
    desc = brief_at(dense_l, uv)
    valid = jnp.ones(K, bool)
    a = match_stereo(dense_r, uv, desc, valid, seq.cam)
    b = match_stereo(dense_r, uv, desc, valid, seq.cam, force_kernel=True)
    _compare(a, b)


def test_kernel_nan_uv_safe(scene, rng):
    cam, dense_l, dense_r = scene
    uv = jnp.asarray(np.stack([
        rng.uniform(0, 511, 16), rng.uniform(0, 255, 16)], 1).astype(np.float32))
    uv = uv.at[2].set(jnp.nan)
    desc = brief_at(dense_l, jnp.nan_to_num(uv))
    sm = match_stereo(dense_r, uv, desc, jnp.ones(16, bool), cam,
                      force_kernel=True)
    assert not bool(np.asarray(sm.ok)[2])
