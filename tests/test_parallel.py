"""Multi-device (8 virtual CPU) sharding tests: tracking step + distributed BA."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svi_mapper_tpu.config import DEFAULT_PARAMS
from svi_mapper_tpu.geometry import se3
from svi_mapper_tpu.models import frame as frame_mod
from svi_mapper_tpu.parallel import mesh as mesh_mod
from svi_mapper_tpu.parallel import sharded_ba
from svi_mapper_tpu.solvers import ba as ba_mod
from svi_mapper_tpu.io.synthetic import default_camera
from tests.test_solvers import make_cam, make_world, observe

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.mark.slow
@requires_8
def test_sharded_frame_step_matches_single_device():
    """The full frame step with the landmark axis sharded over 8 devices
    must produce the same result as unsharded execution."""
    params = dataclasses.replace(
        DEFAULT_PARAMS, max_landmarks=128, max_detections=128, max_measurements=4
    )
    cam = default_camera(256, 128)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((128, 256)).astype(np.float32) * 255)

    state = frame_mod.init_state(params)
    step = lambda s, l, r: frame_mod.process_frame(
        s, l, r, cam, params, use_gt_pose=False, do_landmark_opt=True
    )
    # single-device
    s1, o1 = jax.jit(step)(state, img, img)
    # sharded
    mesh = mesh_mod.make_map_mesh(8)
    state_sh = mesh_mod.shard_state(state, mesh)
    img_sh = mesh_mod.replicate(img, mesh)
    with mesh:
        s2, o2 = jax.jit(step)(state_sh, img_sh, img_sh)
    assert int(o1.n_active) == int(o2.n_active)
    assert int(o1.n_new) == int(o2.n_new)
    assert np.allclose(np.asarray(o1.T_wc), np.asarray(o2.T_wc), atol=1e-5)
    a1 = np.asarray(s1.table.pos_w)[np.asarray(s1.table.active)]
    a2 = np.asarray(s2.table.pos_w)[np.asarray(s2.table.active)]
    assert np.allclose(np.sort(a1.ravel()), np.sort(a2.ravel()), atol=1e-4)


@requires_8
def test_sharded_ba_matches_single_device(rng):
    cam = make_cam()
    K, L = 5, 192
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
        d = np.asarray(se3.exp_se3(jnp.asarray(rng.normal(0, 0.02, 6).astype(np.float32))))
        T0[k] = d @ T0[k]
    X0 = X_true + rng.normal(0, 0.2, (L, 3)).astype(np.float32)
    fix = np.zeros(K, bool); fix[0] = True

    res1 = ba_mod.bundle_adjust(
        jnp.asarray(T0), jnp.asarray(X0), jnp.asarray(obs),
        jnp.ones((K, L), bool), cam, jnp.asarray(fix),
    )
    mesh = mesh_mod.make_map_mesh(8)
    res8 = sharded_ba.bundle_adjust_sharded(
        mesh, jnp.asarray(T0), jnp.asarray(X0), jnp.asarray(obs),
        jnp.ones((K, L), bool), cam, jnp.asarray(fix),
    )
    assert np.allclose(np.asarray(res1.T_wc), np.asarray(res8.T_wc), atol=1e-3)
    assert np.allclose(
        np.asarray(res1.points_w), np.asarray(res8.points_w), atol=1e-2
    )
    # both reached a comparable chi2
    assert np.isclose(
        float(res1.chi2_final), float(res8.chi2_final),
        rtol=0.2,
    )


@requires_8
def test_sharded_ba_pads_nondivisible_landmarks(rng):
    """L not divisible by the mesh size must work via padding."""
    cam = make_cam()
    K, L = 3, 101   # 101 % 8 != 0
    X = make_world(rng, L)
    T = np.stack([
        np.asarray(se3.exp_se3(jnp.asarray([0, 0, -0.5 * k, 0, 0, 0], jnp.float32)))
        for k in range(K)
    ])
    obs = np.zeros((K, L, 4), np.float32)
    for k in range(K):
        uv4, _ = observe(cam, T[k], X)
        obs[k] = uv4
    fix = np.zeros(K, bool); fix[0] = True
    mesh = mesh_mod.make_map_mesh(8)
    res = sharded_ba.bundle_adjust_sharded(
        mesh, jnp.asarray(T), jnp.asarray(X), jnp.asarray(obs),
        jnp.ones((K, L), bool), cam, jnp.asarray(fix),
    )
    assert res.points_w.shape == (L, 3)
    assert float(res.chi2_final) < 1e-2
