"""Pallas band-sweep tracking scorer vs the XLA lattice path (bit parity).

ops.track_kernel.track_scores (interpret mode on CPU) must reproduce the
lattice scoring of frontend.tracking exactly for in-FoV landmarks — same
accepted candidate, same biased score, same Hamming distance — since both
implement the 3-stage cascade of CFundamentalMatcher.cpp:391-2397.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svi_mapper_tpu.frontend.tracking import _OFFSETS, _TIERS, _TIER_BIAS, _BIG
from svi_mapper_tpu.ops import track_kernel as tk
from svi_mapper_tpu.ops.descriptors import brief_at


def _xla_reference(dense, uv_pred, dlast, dref, cutoff_s1=25, cutoff_s2=50,
                   cutoff_ref=50):
    """The lattice scoring block of frontend.tracking, standalone."""
    cand_uv = uv_pred[:, None, :] + _OFFSETS[None, :, :]
    cand_desc = brief_at(dense, cand_uv)
    d_last = jnp.sum(
        jax.lax.population_count(cand_desc ^ dlast[:, None, :]), -1
    ).astype(jnp.int32)
    d_ref = jnp.sum(
        jax.lax.population_count(cand_desc ^ dref[:, None, :]), -1
    ).astype(jnp.int32)
    tier_cutoff = jnp.where(_TIERS == 0, cutoff_s1, cutoff_s2)
    accept = (d_last <= tier_cutoff[None, :]) & (d_ref <= cutoff_ref)
    score = jnp.where(accept, d_last + _TIER_BIAS[_TIERS][None, :], _BIG)
    best = jnp.argmin(score, axis=1).astype(jnp.int32)
    best_score = jnp.take_along_axis(score, best[:, None], 1)[:, 0]
    uv_best = jnp.take_along_axis(cand_uv, best[:, None, None], 1)[:, 0]
    best_dist = jnp.take_along_axis(d_last, best[:, None], 1)[:, 0]
    return np.asarray(best_score), np.asarray(uv_best), np.asarray(best_dist)


def _random_case(rng, h=96, w=256, L=64, planted=24):
    dense = rng.integers(0, 2 ** 32, (h, w, 8), dtype=np.uint64).astype(np.uint32)
    uv = np.stack([
        rng.uniform(29, w - 30, L), rng.uniform(29, h - 30, L)
    ], 1).astype(np.float32)
    dlast = rng.integers(0, 2 ** 32, (L, 8), dtype=np.uint64).astype(np.uint32)
    dref = dlast.copy()
    # plant near-exact matches at known lattice offsets for the first few
    offs = np.asarray(_OFFSETS)
    for i in range(planted):
        off = offs[rng.integers(0, len(offs))]
        x = int(round(uv[i, 0] + off[0]))
        y = int(round(uv[i, 1] + off[1]))
        d = dlast[i].copy()
        d[0] ^= np.uint32(0b111)  # 3 flipped bits
        dense[y, x] = d
    return (jnp.asarray(dense), jnp.asarray(uv), jnp.asarray(dlast),
            jnp.asarray(dref))


def test_kernel_matches_xla_lattice(rng):
    dense, uv, dlast, dref = _random_case(rng)
    score_k, lin, dist_k, xb, yb = tk.track_scores(
        dense, uv, dlast, dref, interpret=True)
    score_x, uv_x, dist_x = _xla_reference(dense, uv, dlast, dref)

    score_k = np.asarray(score_k)
    accepted = score_x < _BIG
    assert accepted.sum() >= 16, "planted matches should be found"
    np.testing.assert_array_equal(score_k, score_x)
    np.testing.assert_array_equal(
        np.asarray(dist_k)[accepted], dist_x[accepted])
    # matched pixel agrees: kernel pixel = (xb + lin % W, yb + lin // W)
    px_k = np.asarray(xb) + np.asarray(lin) % tk.BLOCK_W
    py_k = np.asarray(yb) + np.asarray(lin) // tk.BLOCK_W
    px_x = np.round(uv_x[:, 0]).astype(np.int64)
    py_x = np.round(uv_x[:, 1]).astype(np.int64)
    np.testing.assert_array_equal(px_k[accepted], px_x[accepted])
    np.testing.assert_array_equal(py_k[accepted], py_x[accepted])


def test_kernel_rejects_when_nothing_matches(rng):
    dense, uv, dlast, dref = _random_case(rng, planted=0)
    # random 256-bit descriptors are ~128 bits apart — nothing under cutoff
    score_k, *_ = tk.track_scores(dense, uv, dlast, dref, interpret=True)
    assert (np.asarray(score_k) >= tk.BIG).all()


def test_kernel_handles_band_edges(rng):
    """Landmarks concentrated at band boundaries and image corners."""
    h, w, L = 96, 256, 48
    dense = rng.integers(0, 2 ** 32, (h, w, 8), dtype=np.uint64).astype(np.uint32)
    ys = np.concatenate([
        np.full(L // 4, 29.0), np.full(L // 4, float(h - 30)),
        np.full(L // 4, 24.0 - 0.4), np.full(L // 4, 48.0 + 0.4),
    ])
    uv = np.stack([rng.uniform(29, w - 30, L), ys[:L]], 1).astype(np.float32)
    dlast = rng.integers(0, 2 ** 32, (L, 8), dtype=np.uint64).astype(np.uint32)
    # every landmark sees its exact field descriptor at offset 0
    for i in range(L):
        dlast[i] = dense[int(round(uv[i, 1])), int(round(uv[i, 0]))]
    dref = dlast.copy()
    dj = jnp.asarray(dense)
    score_k, lin, dist_k, xb, yb = tk.track_scores(
        dj, jnp.asarray(uv), jnp.asarray(dlast), jnp.asarray(dref),
        interpret=True)
    score_x, uv_x, dist_x = _xla_reference(
        dj, jnp.asarray(uv), jnp.asarray(dlast), jnp.asarray(dref))
    np.testing.assert_array_equal(np.asarray(score_k), score_x)
    assert (np.asarray(score_k) == 0).all()   # exact self-matches, tier 0


def test_kernel_nan_positions_are_safe(rng):
    dense, uv, dlast, dref = _random_case(rng, L=16, planted=0)
    uv = uv.at[3].set(jnp.nan).at[7].set(jnp.inf)
    score_k, *_ = tk.track_scores(dense, uv, dlast, dref, interpret=True)
    assert np.isfinite(np.asarray(score_k)).all()
