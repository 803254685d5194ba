"""Synthetic stereo sequence generator with exact ground truth.

The reference is verified by replaying recorded KITTI message dumps
(SURVEY.md §4 — its fixtures are dataset files we do not ship). This module
replaces those fixtures with a *renderer*: a deterministic multi-plane world
with a smooth procedural texture evaluated at the 3D hit point, so

  * left/right images are exactly photoconsistent (same world point -> same
    intensity in both views, modulo sampling),
  * ground-truth poses and depths are exact,
  * sequences of any length are generated on the fly, no data files needed.

The world is a KITTI-like corridor (ground plane + two walls + far wall,
y-down camera convention) and the texture is a fixed-seed sum of ~sin waves
over world coordinates — smooth, corner-rich, view-independent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from svi_mapper_tpu.geometry import se3
from svi_mapper_tpu.geometry.camera import StereoCamera, pinhole_from_projection


def default_camera(width: int = 512, height: int = 256, baseline: float = 0.54) -> StereoCamera:
    """A KITTI-like stereo camera at reduced resolution."""
    fx = 718.856 * width / 1241.0
    cx, cy = width / 2.0, height / 2.0
    P_l = np.array([[fx, 0, cx, 0], [0, fx, cy, 0], [0, 0, 1, 0]], np.float64)
    P_r = P_l.copy()
    P_r[0, 3] = -fx * baseline
    return StereoCamera(
        left=pinhole_from_projection(P_l, width, height),
        right=pinhole_from_projection(P_r, width, height),
    )


def _make_texture_params(seed: int = 5, n_waves: int = 48):
    rng = np.random.default_rng(seed)
    # log-uniform spatial frequencies, 0.3 .. 20 rad/m
    freq_mag = np.exp(rng.uniform(np.log(0.3), np.log(20.0), n_waves))
    dirs = rng.normal(size=(n_waves, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    omega = dirs * freq_mag[:, None]
    phase = rng.uniform(0, 2 * np.pi, n_waves)
    amp = rng.uniform(0.5, 1.0, n_waves) / np.sqrt(n_waves)
    return (
        jnp.asarray(omega, jnp.float32),
        jnp.asarray(phase, jnp.float32),
        jnp.asarray(amp, jnp.float32),
    )


_OMEGA, _PHASE, _AMP = _make_texture_params()

# planes: (point, normal, axis1, extent1, axis2, extent2)
# camera convention: x right, y DOWN, z forward. Ground at y=+1.5 (below).
_PLANES = [
    # ground
    ((0.0, 1.5, 0.0), (0.0, -1.0, 0.0), (1.0, 0.0, 0.0), 60.0, (0.0, 0.0, 1.0), 500.0),
    # left wall
    ((-9.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), 4.0, (0.0, 0.0, 1.0), 500.0),
    # right wall
    ((9.0, 0.0, 0.0), (-1.0, 0.0, 0.0), (0.0, 1.0, 0.0), 4.0, (0.0, 0.0, 1.0), 500.0),
    # far wall (keeps the vanishing region textured)
    ((0.0, 0.0, 480.0), (0.0, 0.0, -1.0), (1.0, 0.0, 0.0), 60.0, (0.0, 1.0, 0.0), 40.0),
]


def ring_world(radius: float, half_width: float = 9.0,
               n_segments: int = 16, wall_half_height: float = 4.0) -> tuple:
    """Plane world for LARGE circular loops: an annular circuit.

    The default corridor world (`_PLANES`) is sized for the small test
    loops (walls at x = ±9, ground ±60 m): a reference-scale loop —
    ``loop_trajectory`` with radius ~100 m, the KITTI-00-like operating
    point of `bench.py --endurance` — leaves it entirely and the tracker
    correctly starves (measured r5: 2,048-frame endurance collapsed at the
    first-quartile boundary with black frames). This builds a world that
    CONTAINS such a loop: a big ground plane plus inner/outer polygon
    fence walls (n_segments planar segments each) bracketing the ring the
    camera drives, so every viewpoint on the loop sees textured ground
    ahead and depth-structured walls to both sides — the synthetic analog
    of a city-block circuit.

    ``loop_trajectory(n, radius)`` starts at the origin heading +z and
    curves toward +x, so its circle is centered at (radius, 0, 0) — the
    returned world is centered there too.
    """
    import math

    cx = float(radius)
    e_ground = radius + half_width + 30.0
    planes = [
        ((cx, 1.5, 0.0), (0.0, -1.0, 0.0),
         (1.0, 0.0, 0.0), e_ground, (0.0, 0.0, 1.0), e_ground),
    ]
    fences = [radius + half_width]
    if radius - half_width > 1.0:
        fences.append(radius - half_width)
    for r_f in fences:
        e1 = r_f * math.tan(math.pi / n_segments) + 0.5   # overlap corners
        for s in range(n_segments):
            phi = 2.0 * math.pi * s / n_segments
            c, sn = math.cos(phi), math.sin(phi)
            planes.append((
                (cx + r_f * c, 0.0, r_f * sn),
                (-c, 0.0, -sn),                 # sign irrelevant: raycast
                (-sn, 0.0, c), float(e1),       # has no backface culling
                (0.0, 1.0, 0.0), float(wall_half_height),
            ))
    return tuple(planes)


def _texture(p: jax.Array) -> jax.Array:
    """Procedural intensity at world points ``p`` [..., 3] -> [0, 255].

    A mostly piecewise-constant "blob" field (thresholded sine sum) with a
    smooth component: blob boundaries give strong, BRIEF-stable corners —
    binary tests over locally constant regions survive the perspective
    warps between revisits far better than a smooth field does.
    """
    phases = jnp.einsum("...i,ki->...k", p, _OMEGA) + _PHASE
    val = jnp.sum(jnp.sin(phases) * _AMP, axis=-1)
    hard = (val > 0).astype(jnp.float32)
    soft = val * 0.5 + 0.5
    return (0.75 * hard + 0.25 * soft) * 255.0


def raycast(
    T_wc: jax.Array, fx: jax.Array, cx: jax.Array, cy: jax.Array,
    baseline_shift: jax.Array, width: int, height: int,
    planes: tuple = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Intersect the per-pixel view rays with the plane world.

    Returns ``(o, dir_w, best_t)``: camera center in world [3], world-frame
    ray directions [H, W, 3], and ray parameter of the first hit [H, W]
    (``inf`` where no plane is hit). Shared by the clean renderer below and
    the photometric stressor renderer (`io/stress.py`). ``planes`` defaults
    to the corridor world `_PLANES`; pass `ring_world(...)` for large-loop
    sequences.
    """
    if planes is None:
        planes = _PLANES
    T_cw = se3.inv_T(T_wc)
    R_cw = T_cw[:3, :3]
    # camera center in world = T_cw @ [shift,0,0]
    o = T_cw[:3, 3] + R_cw[:, 0] * baseline_shift

    u = jnp.arange(width, dtype=jnp.float32)[None, :]
    v = jnp.arange(height, dtype=jnp.float32)[:, None]
    dir_cam = jnp.stack(
        [
            jnp.broadcast_to((u - cx) / fx, (height, width)),
            jnp.broadcast_to((v - cy) / fx, (height, width)),
            jnp.ones((height, width), jnp.float32),
        ],
        axis=-1,
    )
    dir_w = jnp.einsum("ij,hwj->hwi", R_cw, dir_cam,
                       precision=jax.lax.Precision.HIGHEST)

    best_t = jnp.full((height, width), jnp.inf, jnp.float32)
    for (p0, n, a1, e1, a2, e2) in planes:
        p0 = jnp.asarray(p0, jnp.float32)
        n = jnp.asarray(n, jnp.float32)
        a1 = jnp.asarray(a1, jnp.float32)
        a2 = jnp.asarray(a2, jnp.float32)
        denom = jnp.einsum("hwi,i->hw", dir_w, n)
        t_num = jnp.einsum("i,i->", p0, n) - jnp.einsum("i,i->", o, n)
        t = t_num / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        hit = o[None, None, :] + t[..., None] * dir_w
        d1 = jnp.einsum("hwi,i->hw", hit - p0[None, None, :], a1)
        d2 = jnp.einsum("hwi,i->hw", hit - p0[None, None, :], a2)
        ok = (t > 0.1) & (jnp.abs(d1) <= e1) & (jnp.abs(d2) <= e2)
        best_t = jnp.where(ok & (t < best_t), t, best_t)
    return o, dir_w, best_t


@functools.partial(
    jax.jit, static_argnames=("width", "height", "alias_period", "planes"))
def render_view(
    T_wc: jax.Array, fx: jax.Array, cx: jax.Array, cy: jax.Array,
    baseline_shift: jax.Array, width: int, height: int,
    alias_period: float = 0.0,
    planes: tuple = None,
) -> jax.Array:
    """Render one camera view of the plane world.

    ``baseline_shift`` is the camera-center x-offset in the LEFT camera frame
    (0 for left, +baseline for right). With ``alias_period > 0`` the texture
    is evaluated on the world-z coordinate folded modulo the period: the
    corridor repeats the SAME visual motif every ``alias_period`` meters —
    geographically distinct places that look identical, the perceptual-
    aliasing attack a loop-closure pipeline's precision gates must survive.
    """
    o, dir_w, best_t = raycast(T_wc, fx, cx, cy, baseline_shift, width, height,
                               planes)
    hit_w = o[None, None, :] + best_t[..., None] * dir_w
    if alias_period > 0.0:
        hit_w = hit_w.at[..., 2].set(jnp.mod(hit_w[..., 2], alias_period))
    img = _texture(hit_w)
    return jnp.where(jnp.isfinite(best_t), img, 0.0)


def render_stereo(cam: StereoCamera, T_wc: jax.Array,
                  alias_period: float = 0.0,
                  planes: tuple = None) -> tuple[jax.Array, jax.Array]:
    """Render the (left, right) pair for a world->LEFT-camera pose."""
    fx = cam.left.fx
    imgL = render_view(T_wc, fx, cam.left.cx, cam.left.cy,
                       jnp.asarray(0.0, jnp.float32), cam.width, cam.height,
                       alias_period, planes)
    imgR = render_view(T_wc, fx, cam.right.cx, cam.right.cy,
                       cam.baseline.astype(jnp.float32), cam.width, cam.height,
                       alias_period, planes)
    return imgL, imgR


def corridor_trajectory(n_frames: int, step: float = 0.8, yaw_amp: float = 0.003) -> np.ndarray:
    """Ground-truth poses T_wc [N,4,4]: forward motion with gentle weaving."""
    poses = []
    T_cw = np.eye(4, dtype=np.float32)  # camera->world ("where am I")
    for i in range(n_frames):
        yaw = yaw_amp * np.sin(i * 0.15)
        d = np.asarray(
            se3.exp_se3(jnp.asarray([0.0, 0.0, step, 0.0, yaw, 0.0], jnp.float32))
        )
        T_cw = T_cw @ d
        poses.append(np.linalg.inv(T_cw).astype(np.float32))
    return np.stack(poses)


def loop_trajectory(n_frames: int, radius: float = 5.0,
                    frames_per_loop: int | None = None) -> np.ndarray:
    """Ground-truth poses T_wc [N,4,4] around a circle (camera heading
    tangent) — the loop-closure test trajectory. With
    ``frames_per_loop < n_frames`` the path continues past 2*pi, so late
    frames REVISIT early poses (closure opportunities at near-identical
    viewpoints, the operating condition of the reference's closure gates)."""
    poses = []
    if frames_per_loop is None:
        frames_per_loop = n_frames
    step_angle = 2.0 * np.pi / frames_per_loop
    arc = radius * step_angle
    T_cw = np.eye(4, dtype=np.float32)
    for _ in range(n_frames):
        d = np.asarray(
            se3.exp_se3(jnp.asarray([0.0, 0.0, arc, 0.0, step_angle, 0.0], jnp.float32))
        )
        T_cw = T_cw @ d
        poses.append(np.linalg.inv(T_cw).astype(np.float32))
    return np.stack(poses)


class SyntheticSequence:
    """Iterable stereo sequence with ground truth (the fixture generator)."""

    def __init__(self, n_frames: int = 40, width: int = 512, height: int = 256,
                 step: float = 0.8, yaw_amp: float = 0.003,
                 trajectory: str = "corridor", loop_radius: float = 5.0,
                 alias_period: float = 0.0, world: tuple | None = None):
        self.cam = default_camera(width, height)
        # None = the default corridor `_PLANES`; large loops must pass a
        # world that contains them (ring_world) — the corridor's ground
        # ends at |x| = 60 m and its walls at x = ±9 m
        self.world = world
        if trajectory == "corridor":
            self.poses_wc = corridor_trajectory(n_frames, step, yaw_amp)
        elif trajectory == "loop":
            self.poses_wc = loop_trajectory(
                n_frames, loop_radius, frames_per_loop=int(n_frames / 1.15))
        else:
            raise ValueError(f"unknown trajectory {trajectory!r}")
        self.n_frames = n_frames
        self.alias_period = alias_period

    def frame(self, i: int) -> tuple[jax.Array, jax.Array, np.ndarray]:
        T = jnp.asarray(self.poses_wc[i])
        imgL, imgR = render_stereo(self.cam, T, self.alias_period, self.world)
        return imgL, imgR, self.poses_wc[i]

    def __iter__(self):
        for i in range(self.n_frames):
            yield self.frame(i)
