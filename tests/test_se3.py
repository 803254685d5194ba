"""Unit tests for the SE(3)/SO(3) core against NumPy/SciPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from svi_mapper_tpu.geometry import se3


def random_rotvecs(rng, n, max_angle=np.pi - 0.05):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(0, max_angle, size=(n, 1))
    return axis * angle


def test_hat_vee_roundtrip(rng):
    w = rng.normal(size=(17, 3)).astype(np.float32)
    W = se3.hat(jnp.asarray(w))
    assert np.allclose(se3.vee(W), w)
    # antisymmetry
    assert np.allclose(np.swapaxes(np.asarray(W), -1, -2), -np.asarray(W))


def test_exp_so3_matches_scipy(rng):
    phi = random_rotvecs(rng, 64).astype(np.float32)
    R = np.asarray(se3.exp_so3(jnp.asarray(phi)))
    R_ref = Rotation.from_rotvec(phi).as_matrix()
    assert np.allclose(R, R_ref, atol=2e-6)


def test_log_so3_roundtrip(rng):
    phi = random_rotvecs(rng, 64).astype(np.float32)
    R = Rotation.from_rotvec(phi).as_matrix().astype(np.float32)
    phi_rt = np.asarray(se3.log_so3(jnp.asarray(R)))
    assert np.allclose(phi_rt, phi, atol=5e-5)


def test_log_so3_small_and_zero():
    R = np.eye(3, dtype=np.float32)[None]
    assert np.allclose(np.asarray(se3.log_so3(jnp.asarray(R))), 0.0)
    phi = np.array([[1e-5, -2e-5, 0.5e-5]], dtype=np.float32)
    R = Rotation.from_rotvec(phi).as_matrix().astype(np.float32)
    assert np.allclose(np.asarray(se3.log_so3(jnp.asarray(R))), phi, atol=1e-7)


def test_log_so3_near_pi(rng):
    # the hard branch: rotations within 1e-4 of pi about random axes
    axis = rng.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    phi = axis * (np.pi - 1e-4)
    R = Rotation.from_rotvec(phi).as_matrix()
    phi_rt = np.asarray(se3.log_so3(jnp.asarray(R, dtype=jnp.float32)))
    R_rt = Rotation.from_rotvec(np.asarray(phi_rt, np.float64)).as_matrix()
    # compare rotations, not rotvecs (sign of axis is ambiguous at pi)
    ang = np.asarray(se3.rotation_geodesic_angle(jnp.asarray(R, jnp.float32), jnp.asarray(R_rt, jnp.float32)))
    assert np.all(ang < 5e-3)


def test_exp_log_se3_roundtrip(rng):
    xi = np.concatenate(
        [rng.normal(size=(64, 3)) * 2.0, random_rotvecs(rng, 64, max_angle=3.0)], axis=-1
    ).astype(np.float32)
    T = se3.exp_se3(jnp.asarray(xi))
    xi_rt = np.asarray(se3.log_se3(T))
    assert np.allclose(xi_rt, xi, atol=2e-4)


def test_exp_se3_is_rigid(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32)
    T = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    R = T[:, :3, :3]
    assert np.allclose(R @ np.swapaxes(R, -1, -2), np.eye(3), atol=1e-5)
    assert np.allclose(T[:, 3], [0, 0, 0, 1])


def test_inv_and_transform(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    T = se3.exp_se3(jnp.asarray(xi))
    Ti = se3.inv_T(T)
    assert np.allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-5)
    p = rng.normal(size=(8, 3)).astype(np.float32)
    q = se3.transform(T, jnp.asarray(p))
    p_rt = se3.transform(Ti, q)
    assert np.allclose(np.asarray(p_rt), p, atol=1e-5)


def test_reorthogonalize(rng):
    phi = random_rotvecs(rng, 8).astype(np.float32)
    R = Rotation.from_rotvec(phi).as_matrix().astype(np.float32)
    noisy = R + rng.normal(size=R.shape).astype(np.float32) * 1e-3
    fixed = np.asarray(se3.reorthogonalize(jnp.asarray(noisy)))
    err_before = np.abs(noisy @ np.swapaxes(noisy, -1, -2) - np.eye(3)).max()
    err_after = np.abs(fixed @ np.swapaxes(fixed, -1, -2) - np.eye(3)).max()
    assert err_after < err_before * 0.1


def test_quat_to_R_matches_scipy(rng):
    q = rng.normal(size=(16, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(se3.quat_to_R(jnp.asarray(q, jnp.float32)))
    R_ref = Rotation.from_quat(q).as_matrix()  # scipy is xyzw like the ref files
    assert np.allclose(R, R_ref, atol=1e-5)


def test_rotation_geodesic_angle(rng):
    phi = random_rotvecs(rng, 16)
    Ra = Rotation.from_rotvec(phi).as_matrix()
    ang = np.linalg.norm(phi, axis=-1)
    got = np.asarray(
        se3.rotation_geodesic_angle(
            jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (16, 3, 3)),
            jnp.asarray(Ra, jnp.float32),
        )
    )
    assert np.allclose(got, ang, atol=1e-3)


def test_apply_left_update_first_order(rng):
    # exp(xi) T ~= (I + hat_se3(xi)) T for small xi
    T = se3.exp_se3(jnp.asarray(rng.normal(size=(6,)).astype(np.float32)))
    xi = jnp.asarray(rng.normal(size=(6,)).astype(np.float32) * 1e-4)
    T_new = se3.apply_left_update(xi, T)
    lin = np.eye(4, dtype=np.float32)
    lin[:3, :3] += np.asarray(se3.hat(xi[3:]))
    lin[:3, 3] += np.asarray(xi[:3])
    assert np.allclose(np.asarray(T_new), lin @ np.asarray(T), atol=1e-6)


def test_jit_and_vmap_compatible():
    xi = jnp.ones((4, 6), jnp.float32) * 0.1
    f = jax.jit(jax.vmap(se3.exp_se3))
    out = f(xi)
    assert out.shape == (4, 4, 4)


def test_inv3x3_matches_numpy():
    from svi_mapper_tpu.geometry import linalg as gl
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    A = rng.normal(size=(64, 3, 3))
    M = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(3)   # SPD batch
    # x64 is disabled in the test session -> f32 tolerances
    inv = np.asarray(gl.inv3x3(jnp.asarray(M)))
    np.testing.assert_allclose(inv, np.linalg.inv(M), rtol=5e-4, atol=1e-5)


def test_solve6x6_spd_matches_numpy():
    from svi_mapper_tpu.geometry import linalg as gl
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    A = rng.normal(size=(32, 6, 6))
    M = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(6)
    b = rng.normal(size=(32, 6))
    x = np.asarray(gl.solve6x6_spd(jnp.asarray(M), jnp.asarray(b)))
    np.testing.assert_allclose(
        x, np.linalg.solve(M, b[..., None])[..., 0], rtol=5e-3, atol=1e-4)
