"""Photometric stressor layer over the synthetic renderer.

The reference validates accuracy by replaying *recorded* KITTI / VI-sensor
imagery (ref `src/runnable/tracker_gt.cpp:182-267`, readme.txt datasets) —
real sensors with read noise, auto-exposure hunting, motion blur, blank
walls, specular surfaces and moving occluders. This sandbox has no recorded
data, so this module is the next-best thing (VERDICT r2 Next-1): it degrades
the clean synthetic renders with a physically grounded sensor + scene model
so that accuracy claims do not rest on noise-free, perfectly photoconsistent
images.

Two stressor classes:

**World-level** (coherent between the two views — they perturb what is
*seen*, not how it is sensed):

* *low-texture spans* — texture contrast collapses over corridor segments
  of world-``z`` (the blank-wall condition; starves detection and forces
  the stage-2/3 recovery paths),
* *specular sheen* — a view-DEPENDENT intensity term (moves between the
  left and right eye and across frames; violates the photoconsistency the
  epipolar stereo matcher relies on),
* *occluders* — untextured dark panels fixed in the camera frame at
  physical depths (windshield-dirt condition), projected with the correct
  disparity into each view: they blank out features, introduce false
  corners at panel edges, and any landmark triangulated on one moves
  rigidly with the camera — a direct attack on the rigid-world assumption
  that the posit solver's robust gates must absorb.

**Sensor-level** (independent per view):

* additive Gaussian read noise + 8-bit quantization,
* exposure gain drift and gamma drift over time, out of phase between the
  two cameras (independent auto-exposure hunting),
* horizontal motion blur (yaw smear),
* vignetting.

Everything is deterministic in (seed, frame index, view) and jitted per
(StressParams, width, height).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from svi_mapper_tpu.geometry.camera import StereoCamera
from svi_mapper_tpu.io import synthetic as syn


@dataclasses.dataclass(frozen=True)
class StressParams:
    """Photometric stress configuration (hashable -> usable as a jit static).

    All intensities are on the renderer's 0..255 scale.
    """

    # sensor
    noise_std: float = 0.0          # additive Gaussian read noise, DN
    gain_amp: float = 0.0           # exposure gain drift amplitude (x(1 +- amp))
    gain_period: float = 60.0       # frames per exposure-hunt cycle
    gamma_amp: float = 0.0          # gamma drift amplitude (gamma = 1 +- amp)
    gamma_period: float = 97.0
    blur_taps: int = 1              # horizontal box-blur length in px (1 = off)
    vignette: float = 0.0           # corner attenuation fraction (0..1)
    # world
    lowtex_spans: tuple[tuple[float, float], ...] = ()  # world-z intervals
    lowtex_strength: float = 0.0    # contrast kept = 1 - strength inside spans
    specular_amp: float = 0.0       # sheen amplitude as fraction of 255
    # occluders: (u_center_frac, v_center_frac, half_w_frac, half_h_frac,
    #             depth_m, drift_px_per_frame)
    occluders: tuple[tuple[float, float, float, float, float, float], ...] = ()
    occluder_intensity: float = 24.0
    seed: int = 0


# Calibrated presets (accuracy table in README; bounds in tests/test_stress.py)
MILD = StressParams(
    noise_std=2.0, gain_amp=0.06, gamma_amp=0.04, vignette=0.15,
)
MODERATE = StressParams(
    noise_std=4.0, gain_amp=0.12, gamma_amp=0.08, blur_taps=3, vignette=0.25,
    lowtex_spans=((60.0, 90.0),), lowtex_strength=0.75, specular_amp=0.12,
    occluders=((0.22, 0.72, 0.05, 0.08, 2.2, 0.0),),
)
SEVERE = StressParams(
    noise_std=8.0, gain_amp=0.25, gamma_amp=0.15, blur_taps=5, vignette=0.35,
    lowtex_spans=((50.0, 80.0), (130.0, 165.0)), lowtex_strength=0.9,
    specular_amp=0.25,
    occluders=(
        (0.20, 0.70, 0.06, 0.09, 2.2, 0.0),
        (0.80, 0.28, 0.05, 0.07, 3.0, 0.15),
    ),
)
PRESETS = {"clean": StressParams(), "mild": MILD, "moderate": MODERATE,
           "severe": SEVERE}


def _lowtex_contrast(z: jax.Array, sp: StressParams) -> jax.Array:
    """Per-hit contrast multiplier from the low-texture world-z spans."""
    c = jnp.ones_like(z)
    for (z0, z1) in sp.lowtex_spans:
        # smooth 2 m shoulders so the wall fades in like paint, not a seam
        inside = (jax.nn.sigmoid((z - z0) / 2.0) * jax.nn.sigmoid((z1 - z) / 2.0))
        c = c * (1.0 - sp.lowtex_strength * inside)
    return c


# fixed pseudo-reflection direction fields for the sheen term
_SPEC_KP = jnp.asarray([0.9, 2.3, 0.31], jnp.float32)
_SPEC_KO = jnp.asarray([1.7, 0.4, 1.13], jnp.float32)


@functools.partial(jax.jit, static_argnames=("sp", "width", "height"))
def render_stressed_view(
    T_wc: jax.Array, fx: jax.Array, cx: jax.Array, cy: jax.Array,
    baseline_shift: jax.Array, frame_idx: jax.Array, view: int,
    sp: StressParams, width: int, height: int,
) -> jax.Array:
    """Render one view with world- and sensor-level stress applied."""
    o, dir_w, best_t = syn.raycast(T_wc, fx, cx, cy, baseline_shift,
                                   width, height)
    hit_w = o[None, None, :] + best_t[..., None] * dir_w

    img = syn._texture(hit_w)
    # world-level: low-texture spans (contrast collapse around mid-gray)
    if sp.lowtex_spans and sp.lowtex_strength > 0.0:
        c = _lowtex_contrast(hit_w[..., 2], sp)
        img = 127.5 + (img - 127.5) * c
    # world-level: view-dependent specular sheen
    if sp.specular_amp > 0.0:
        h = jnp.sin(jnp.einsum("hwi,i->hw", hit_w, _SPEC_KP)
                    + jnp.einsum("i,i->", o, _SPEC_KO))
        sheen = jax.nn.sigmoid(10.0 * (h - 0.6))
        img = img + sp.specular_amp * 255.0 * sheen
    img = jnp.where(jnp.isfinite(best_t), img, 0.0)

    f = frame_idx.astype(jnp.float32)
    # occluders: camera-frame panels at depth, disparity-correct per view
    for i, (ufc, vfc, hwf, hhf, depth, drift) in enumerate(sp.occluders):
        disp = fx * baseline_shift / depth
        u0 = ufc * width + drift * f * ((i % 2) * 2 - 1) - disp
        v0 = vfc * height
        u = jnp.arange(width, dtype=jnp.float32)[None, :]
        v = jnp.arange(height, dtype=jnp.float32)[:, None]
        inside = ((jnp.abs(u - u0) <= hwf * width)
                  & (jnp.abs(v - v0) <= hhf * height))
        img = jnp.where(inside, sp.occluder_intensity, img)

    # sensor-level: exposure gain + gamma drift (out of phase between views)
    phase = 2.1 * view
    if sp.gain_amp > 0.0:
        gain = 1.0 + sp.gain_amp * jnp.sin(2.0 * jnp.pi * f / sp.gain_period + phase)
        img = img * gain
    if sp.gamma_amp > 0.0:
        gamma = 1.0 + sp.gamma_amp * jnp.sin(2.0 * jnp.pi * f / sp.gamma_period
                                             + phase + 1.3)
        img = 255.0 * jnp.power(jnp.clip(img / 255.0, 0.0, 1.0), gamma)
    # horizontal motion blur (edge-replicated box filter)
    if sp.blur_taps > 1:
        k = sp.blur_taps
        padded = jnp.pad(img, ((0, 0), (k // 2, k - 1 - k // 2)), mode="edge")
        img = sum(padded[:, i:i + width] for i in range(k)) / k
    if sp.vignette > 0.0:
        u = (jnp.arange(width, dtype=jnp.float32)[None, :] - width / 2) / (width / 2)
        v = (jnp.arange(height, dtype=jnp.float32)[:, None] - height / 2) / (height / 2)
        img = img * (1.0 - sp.vignette * 0.5 * (u * u + v * v))
    if sp.noise_std > 0.0:
        key = jax.random.fold_in(jax.random.PRNGKey(sp.seed),
                                 frame_idx * 2 + view)
        img = img + sp.noise_std * jax.random.normal(key, img.shape, jnp.float32)
    # 8-bit sensor output
    return jnp.clip(jnp.round(img), 0.0, 255.0)


def render_stressed_stereo(
    cam: StereoCamera, T_wc: jax.Array, frame_idx: int, sp: StressParams,
) -> tuple[jax.Array, jax.Array]:
    fi = jnp.asarray(frame_idx, jnp.int32)
    fx = cam.left.fx
    imgL = render_stressed_view(T_wc, fx, cam.left.cx, cam.left.cy,
                                jnp.asarray(0.0, jnp.float32), fi, 0, sp,
                                cam.width, cam.height)
    imgR = render_stressed_view(T_wc, fx, cam.right.cx, cam.right.cy,
                                cam.baseline.astype(jnp.float32), fi, 1, sp,
                                cam.width, cam.height)
    return imgL, imgR


class StressedSequence(syn.SyntheticSequence):
    """SyntheticSequence with the photometric stress model applied.

    Drop-in for SyntheticSequence everywhere (same ``cam`` / ``poses_wc`` /
    ``frame`` API); ``stress`` is a StressParams or a preset name from
    PRESETS ("clean" / "mild" / "moderate" / "severe").
    """

    def __init__(self, *args, stress: StressParams | str = "moderate",
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.stress = PRESETS[stress] if isinstance(stress, str) else stress

    def frame(self, i: int) -> tuple[jax.Array, jax.Array, np.ndarray]:
        T = jnp.asarray(self.poses_wc[i])
        imgL, imgR = render_stressed_stereo(self.cam, T, i, self.stress)
        return imgL, imgR, self.poses_wc[i]
