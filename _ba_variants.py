# Experiment: reformulate _jacobians' [K,L]-batched tiny matmuls as
# broadcast-sums; measure one LM-iteration-equivalent pipeline at 32x4096.
import time, functools
import jax, jax.numpy as jnp, numpy as np
from svi_mapper_tpu.io.synthetic import default_camera
from svi_mapper_tpu.solvers import ba as ba_mod
from svi_mapper_tpu.geometry import se3

_PREC = jax.lax.Precision.HIGHEST
K, Lm = 32, 4096
cam = default_camera(1241, 376)
rng = np.random.default_rng(3)
X = rng.uniform([-20, -2, 5], [20, 2, 60], (Lm, 3)).astype(np.float32)
T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
T[:, 2, 3] = -np.arange(K, dtype=np.float32)
fx = float(cam.left.fx); cx = float(cam.left.cx); cy = float(cam.left.cy)
bq = float(cam.right.P[0, 3])
p_c = np.einsum("kij,lj->kli", T[:, :3, :3], X) + T[:, None, :3, 3]
z = p_c[..., 2]
obs = np.stack([fx*p_c[...,0]/z+cx, fx*p_c[...,1]/z+cy, (fx*p_c[...,0]+bq)/z+cx, fx*p_c[...,1]/z+cy], -1)
mask = (z > 1.0)
Tj, Xj = jnp.asarray(T), jnp.asarray(X + 0.1)
obs_j, mask_j = jnp.asarray(obs, jnp.float32), jnp.asarray(mask)
fixj = jnp.zeros(K, bool).at[0].set(True)

def tt(f, *a, reps=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/reps*1e3

def jac_bsum(p_c, T_wc, fx, fy, bq):
    x, y, zc = p_c[..., 0], p_c[..., 1], p_c[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(zc) < 1e-6, 1e-6, zc)
    iz2 = iz * iz
    zr = jnp.zeros_like(x)
    J_ul = jnp.stack([fx * iz, zr, -fx * x * iz2], -1)
    J_vl = jnp.stack([zr, fy * iz, -fy * y * iz2], -1)
    J_ur = jnp.stack([fx * iz, zr, -(fx * x + bq) * iz2], -1)
    J_uv = jnp.stack([J_ul, J_vl, J_ur, J_vl], -2)            # [K,L,4,3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p_c.dtype), p_c.shape[:-1] + (3, 3))
    J_pc = jnp.concatenate([eye, -se3.hat(p_c)], -1)          # [K,L,3,6]
    # broadcast-sum instead of batched tiny matmul
    J_pose = sum(J_uv[..., :, i, None] * J_pc[..., None, i, :] for i in range(3))
    R = T_wc[:, :3, :3]
    J_point = sum(J_uv[..., :, i, None] * R[:, None, None, i, :] for i in range(3))
    return J_pose, J_point

@jax.jit
def full_orig(T, X):
    res = ba_mod.bundle_adjust(T, X, obs_j, mask_j, cam, fixj,
                               max_iterations=1, min_rel_improvement=0.0)
    return res.chi2_final

print("orig 1 iter:", f"{tt(full_orig, Tj, Xj):.2f} ms")

# patch _jacobians and retime
orig_jac = ba_mod._jacobians
ba_mod._jacobians = jac_bsum
@jax.jit
def full_bsum(T, X):
    res = ba_mod.bundle_adjust(T, X, obs_j, mask_j, cam, fixj,
                               max_iterations=1, min_rel_improvement=0.0)
    return res.chi2_final
print("bsum 1 iter:", f"{tt(full_bsum, Tj, Xj):.2f} ms")
c1, c2 = float(full_orig(Tj, Xj)), float(full_bsum(Tj, Xj))
print("chi2 agree:", c1, c2)
ba_mod._jacobians = orig_jac
