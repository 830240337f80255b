"""Deterministic 4-variant augmentation suite: orig / color-jitter /
horizontal-flip / temporal-reverse.

Parity targets: reference src/dataset.py:158-207 and 411-426 — the variant
set, the jitter strengths (brightness .3, contrast .3, saturation .2,
hue .05), hflip joint/K adjustment, and that photometric ops see [0,1] video
*before* ImageNet normalization.

TPU-first differences:
  - pixel transforms are jnp (they run fused on device inside the extraction
    step, not on CPU workers);
  - jitter factors come from a jax PRNG key per clip (deterministic given the
    seed), rather than torch's global RNG;
  - temporal-reverse *features* are obtained for free on the host by
    reversing the orig features in time — the backbone is per-frame, so
    backbone(reverse(video)) == reverse(backbone(video)); no 4th forward pass.

Joint-side adjustments (numpy, host) mirror the pixel-side ops exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from h36x.geometry.skeleton import flip_permutation

AUG_NAMES = ("orig", "cjitter", "hflip", "trev")

_FLIP_PERM = flip_permutation()

# numpy, not jnp, on purpose: module-level jnp constants would initialize
# the JAX backend (a tunnel TPU client here) the moment any host-only
# consumer imports this module; jnp ops accept numpy operands unchanged.
_GRAY = np.array([0.2989, 0.587, 0.114], dtype=np.float32)


# ---------------------------------------------------------------------------
# Photometric jitter (device, channels-last, video (T, H, W, 3) in [0, 1])
# ---------------------------------------------------------------------------


def _blend(a, b, factor):
    return jnp.clip(factor * a + (1.0 - factor) * b, 0.0, 1.0)


def _adjust_brightness(v, factor):
    return jnp.clip(v * factor, 0.0, 1.0)


def _adjust_contrast(v, factor):
    gray_mean = jnp.mean(v @ _GRAY, axis=(-2, -1), keepdims=True)[..., None]
    return _blend(v, gray_mean, factor)


def _adjust_saturation(v, factor):
    gray = (v @ _GRAY)[..., None]
    return _blend(v, gray, factor)


def _rgb_to_hsv(v):
    r, g, b = v[..., 0], v[..., 1], v[..., 2]
    maxc = jnp.max(v, axis=-1)
    minc = jnp.min(v, axis=-1)
    val = maxc
    rng = maxc - minc
    sat = jnp.where(maxc > 0, rng / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(rng, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(rng > 0, (h / 6.0) % 1.0, 0.0)
    return h, sat, val


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def _adjust_hue(v, shift):
    h, s, val = _rgb_to_hsv(v)
    h = (h + shift) % 1.0
    return _hsv_to_rgb(h, s, val)


# RGB -> YIQ (NTSC); hue rotation is a rotation of the (I, Q) chroma plane.
# numpy at module scope (see _GRAY): np.linalg.inv runs on the host at
# import; the jnp matmuls below consume the constants as-is.
_RGB2YIQ = np.array(
    [[0.299, 0.587, 0.114],
     [0.595716, -0.274453, -0.321263],
     [0.211456, -0.522591, 0.311135]],
    dtype=np.float32,
)
_YIQ2RGB = np.linalg.inv(_RGB2YIQ).astype(np.float32)


def _adjust_hue_yiq(v, shift):
    """Hue rotation as one 3x3 pixel matmul (lane-friendly).

    The HSV formulation needs per-pixel max/min, 3-way selects and a
    6-branch un-mapping — all VPU select chains. Rotating the YIQ chroma
    plane by 2*pi*shift is two tiny matmuls the MXU eats with zero
    branching; it preserves luma exactly and tracks the HSV hue-shift's
    direction and magnitude at the jitter strengths used here (|shift| <=
    0.05: mean |delta| ~5e-2 vs HSV on random pixels — the residual is the
    inherent linear-circular vs hexagonal rotation difference; fine for an
    augmentation, and the host/production path keeps exact HSV).
    """
    # negative: +shift in HSV moves red toward green; +theta in the (I, Q)
    # plane rotates red toward blue
    theta = -2.0 * jnp.pi * shift
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    rot = rot.at[1, 1].set(c).at[1, 2].set(-s).at[2, 1].set(s).at[2, 2].set(c)
    t = _YIQ2RGB @ rot @ _RGB2YIQ
    return jnp.clip(v @ t.T, 0.0, 1.0)


def color_jitter(
    video01: jnp.ndarray,
    key,
    brightness: float = 0.3,
    contrast: float = 0.3,
    saturation: float = 0.2,
    hue: float = 0.05,
    hue_mode: str = "yiq",
) -> jnp.ndarray:
    """One factor set per clip, ops applied in a seeded random order.

    hue_mode='yiq' (default) rotates the YIQ chroma plane — one 3x3 pixel
    matmul, the lane-friendly device formulation. hue_mode='hsv' keeps the
    exact torchvision HSV semantics (what the host/production path uses);
    it is select-heavy and measured several times slower on the VPU.
    """
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(key, 5)
    fb = jax.random.uniform(k_b, (), minval=1.0 - brightness, maxval=1.0 + brightness)
    fc = jax.random.uniform(k_c, (), minval=1.0 - contrast, maxval=1.0 + contrast)
    fs = jax.random.uniform(k_s, (), minval=1.0 - saturation, maxval=1.0 + saturation)
    fh = jax.random.uniform(k_h, (), minval=-hue, maxval=hue)
    order = jax.random.permutation(k_perm, 4)

    hue_fn = _adjust_hue_yiq if hue_mode == "yiq" else _adjust_hue
    ops = (
        lambda v: _adjust_brightness(v, fb),
        lambda v: _adjust_contrast(v, fc),
        lambda v: _adjust_saturation(v, fs),
        lambda v: hue_fn(v, fh),
    )
    out = video01
    for slot in range(4):
        out = jax.lax.switch(order[slot], ops, out)
    return out


# ---------------------------------------------------------------------------
# Host (numpy) photometric jitter — used by the extraction decode workers.
#
# The device (jnp) implementation above is kept for device-resident
# pipelines (with the YIQ hue default it measures 29k frames/s on-chip —
# no longer the bottleneck it was with HSV hue, which ran 79x slower); the
# production extract stage still jitters on the decode workers where the u8
# crops already live, overlapping with decode for free. Variants are
# re-quantized to u8 for transfer (max error 1/510, below jpeg noise).
# ---------------------------------------------------------------------------

def _np_blend(a, b, factor):
    return np.clip(factor * a + (1.0 - factor) * b, 0.0, 1.0)


def _np_hue_cv2(v, shift):
    """cv2-backed hue shift: exact match with :func:`_np_hue` (delta ~1e-6,
    tested) at ~40x the speed (SIMD cvtColor vs numpy choose chains) —
    1.3 s -> 32 ms per 40-frame clip on this host."""
    import cv2

    out = np.empty_like(v)
    deg = shift * 360.0
    for i in range(v.shape[0]):
        hsv = cv2.cvtColor(v[i], cv2.COLOR_RGB2HSV)
        hsv[..., 0] = (hsv[..., 0] + deg) % 360.0
        out[i] = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return out


def _np_hue(v, shift):
    r, g, b = v[..., 0], v[..., 1], v[..., 2]
    maxc = v.max(axis=-1)
    minc = v.min(axis=-1)
    rng_ = maxc - minc
    sat = np.where(maxc > 0, rng_ / np.maximum(maxc, 1e-12), 0.0)
    safe = np.maximum(rng_, 1e-12)
    rc, gc, bc = (maxc - r) / safe, (maxc - g) / safe, (maxc - b) / safe
    h = np.where(maxc == r, bc - gc, np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = np.where(rng_ > 0, (h / 6.0) % 1.0, 0.0)
    h = (h + shift) % 1.0
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = maxc * (1.0 - sat)
    q = maxc * (1.0 - f * sat)
    t = maxc * (1.0 - (1.0 - f) * sat)
    i = i.astype(np.int32) % 6
    r = np.choose(i, [maxc, q, p, p, t, maxc])
    g = np.choose(i, [t, maxc, maxc, q, p, p])
    b = np.choose(i, [p, p, t, maxc, maxc, q])
    return np.stack([r, g, b], axis=-1)


def sample_jitter_params(
    rng: np.random.Generator,
    brightness: float = 0.3,
    contrast: float = 0.3,
    saturation: float = 0.2,
    hue: float = 0.05,
):
    """Draw one (order, brightness, contrast, saturation, hue) factor set.

    Split out of :func:`color_jitter_host` so the factor set can be keyed
    per clip (reference parity), per video, or per frame — the latter two
    make the jittered variant deterministic per frame and therefore
    dedupable across overlapping clip windows (h36x/extract/dedup.py).
    """
    order = rng.permutation(4)
    fb = rng.uniform(1.0 - brightness, 1.0 + brightness)
    fc = rng.uniform(1.0 - contrast, 1.0 + contrast)
    fs = rng.uniform(1.0 - saturation, 1.0 + saturation)
    fh = rng.uniform(-hue, hue)
    return order, fb, fc, fs, fh


def apply_jitter_params(video01: np.ndarray, params) -> np.ndarray:
    """Apply a :func:`sample_jitter_params` factor set to (T, H, W, 3) or
    (H, W, 3) video in [0, 1]. Every op's statistics are per-frame (the
    contrast gray-mean reduces over H, W only), so applying per frame and
    per window commute."""
    order, fb, fc, fs, fh = params
    v = video01
    for op in order:
        if op == 0:
            v = np.clip(v * fb, 0.0, 1.0)
        elif op == 1:
            gray_mean = (v @ _GRAY).mean(axis=(-2, -1), keepdims=True)[..., None]
            v = _np_blend(v, gray_mean, fc)
        elif op == 2:
            v = _np_blend(v, (v @ _GRAY)[..., None], fs)
        else:
            try:
                v = _np_hue_cv2(v.reshape((-1,) + v.shape[-3:]), fh).reshape(v.shape)
            except ImportError:  # cv2-less host: exact numpy fallback
                v = _np_hue(v, fh)
    return v


def color_jitter_host(
    video01: np.ndarray,
    rng: np.random.Generator,
    brightness: float = 0.3,
    contrast: float = 0.3,
    saturation: float = 0.2,
    hue: float = 0.05,
) -> np.ndarray:
    """numpy mirror of :func:`color_jitter`: one factor set per clip, ops in
    a seeded random order. video01 (T, H, W, 3) float32 in [0, 1]."""
    return apply_jitter_params(
        video01, sample_jitter_params(rng, brightness, contrast, saturation, hue)
    )


def jitter_u8(crops_u8: np.ndarray, params, n_threads: int = 4) -> np.ndarray:
    """(T, H, W, 3) u8 -> jittered u8, one quantize at the end.

    The single entry point both extraction schedulers use for the jittered
    variant, so a run's store is internally byte-consistent whichever
    backend is picked: the fused native kernel (h36x/native, no clip-sized
    f32 temporaries, GIL-free threading — the numpy chain below is the
    dominant host cost of the default --jitter-key clip schedule), or the
    numpy/cv2 chain when the library is unavailable (same math within u8
    rounding; the two backends may differ by +-1 on rint-boundary pixels,
    which is why call sites must not mix them within one store).
    """
    from h36x import native

    if native.jitter_available():
        return native.jitter_clip_u8(crops_u8, params, n_threads=n_threads)
    video01 = crops_u8.astype(np.float32) * (1.0 / 255.0)
    out = apply_jitter_params(video01, params)
    return np.clip(np.rint(out * 255.0), 0, 255).astype(np.uint8)


def make_clip_variants_u8(crops_u8: np.ndarray, rng: np.random.Generator):
    """(T, o, o, 3) u8 person crops -> (orig, cjitter, hflip) u8 stack.

    Pixel-side half of the 4-variant suite (temporal-reverse needs no pixel
    work — its features are orig's reversed). Returns (3, T, o, o, 3) u8.
    """
    cj = jitter_u8(crops_u8, sample_jitter_params(rng))
    hf = crops_u8[:, :, ::-1, :]
    return np.stack([crops_u8, cj, hf])


# ---------------------------------------------------------------------------
# Geometric variants
# ---------------------------------------------------------------------------


def hflip_video(video: jnp.ndarray) -> jnp.ndarray:
    """Mirror the W axis of (..., H, W, C) video."""
    return video[..., ::-1, :]


def reverse_time(video: jnp.ndarray, time_axis: int = 0) -> jnp.ndarray:
    return jnp.flip(video, axis=time_axis)


def hflip_joints(joints3d: np.ndarray, joints2d: np.ndarray, K: np.ndarray, width: int):
    """Host-side joint/K adjustment for a horizontal flip.

    joints2d x -> W - x; joints3d x -> -x (camera convention); left/right
    joint identities swap; K's cx mirrors (reference src/dataset.py:158-185).
    """
    j2 = np.asarray(joints2d).copy()
    j3 = np.asarray(joints3d).copy()
    j2[..., 0] = width - j2[..., 0]
    j3[..., 0] = -j3[..., 0]
    j2 = j2[..., _FLIP_PERM, :]
    j3 = j3[..., _FLIP_PERM, :]
    Kf = np.asarray(K).copy()
    Kf[0, 2] = width - Kf[0, 2]
    return j3, j2, Kf


def reverse_joints(joints3d: np.ndarray, joints2d: np.ndarray):
    return np.asarray(joints3d)[::-1].copy(), np.asarray(joints2d)[::-1].copy()
