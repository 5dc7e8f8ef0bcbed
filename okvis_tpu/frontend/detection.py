"""Keypoint detection: Harris corner score + NMS + top-K selection.

TPU-native replacement for the reference's BRISK ScaleSpaceFeatureDetector
with HarrisScoreCalculator (external brisk-2.0.5 lib, wired up at
/root/reference/okvis_frontend/src/Frontend.cpp:813-843; EuRoC config runs a
single octave with threshold 40 and ≤400 keypoints,
config/config_fpga_p2_euroc.yaml:66-68).

Everything is fixed-shape: detection always returns `max_keypoints` slots with
a validity mask, so downstream description/matching never retraces. The whole
detect+describe path is one jitted XLA program per image batch; convolutions
and the top-k ride XLA's native TPU lowerings.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Keypoints(NamedTuple):
    uv: jnp.ndarray  # (K, 2) float pixel coordinates (x, y)
    score: jnp.ndarray  # (K,)
    mask: jnp.ndarray  # (K,) bool


def _shift(img, dy, dx):
    """Shifted copy with edge padding (img: (H, W))."""
    return jnp.roll(img, (dy, dx), axis=(0, 1))


def _sep_blur(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable 1D blur along both axes via depthwise conv."""
    k = kernel / jnp.sum(kernel)
    pad = (len(k) - 1) // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1, out_axes=1)(x)
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"), in_axes=0, out_axes=0)(x)
    return x


def gaussian_kernel(sigma: float, radius: int = None) -> jnp.ndarray:
    radius = radius or max(1, int(3.0 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def harris_response(img: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    """Harris corner response on a (H, W) float image in [0, 255]."""
    img = img.astype(jnp.float32)
    # Scharr gradients (better rotational symmetry than Sobel)
    gx = (
        3.0 * (_shift(img, -1, -1) - _shift(img, -1, 1))
        + 10.0 * (_shift(img, 0, -1) - _shift(img, 0, 1))
        + 3.0 * (_shift(img, 1, -1) - _shift(img, 1, 1))
    ) / 32.0
    gy = (
        3.0 * (_shift(img, -1, -1) - _shift(img, 1, -1))
        + 10.0 * (_shift(img, -1, 0) - _shift(img, 1, 0))
        + 3.0 * (_shift(img, -1, 1) - _shift(img, 1, 1))
    ) / 32.0
    gk = gaussian_kernel(1.5)
    Ixx = _sep_blur(gx * gx, gk)
    Iyy = _sep_blur(gy * gy, gk)
    Ixy = _sep_blur(gx * gy, gk)
    det = Ixx * Iyy - Ixy * Ixy
    tr = Ixx + Iyy
    return det - k * tr * tr


def nms(score: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Non-maximum suppression: keep pixels that are the max in a
    (2r+1)² window (the reference's uniformity radius semantics —
    config threshold doc calls it 'uniformity radius in pixels')."""
    w = 2 * radius + 1
    m = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(w, w),
        window_strides=(1, 1),
        padding="SAME",
    )
    return jnp.where(score >= m, score, -jnp.inf)


def _use_pallas_default() -> bool:
    """Pallas fused kernel on real TPU; XLA conv path elsewhere (CPU tests)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "nms_radius", "border", "use_pallas"),
)
def detect_keypoints(
    img: jnp.ndarray,
    threshold: float = 30.0,
    max_keypoints: int = 400,
    nms_radius: int = 4,
    border: int = 20,
    mask: jnp.ndarray = None,
    use_pallas: bool = None,
) -> Keypoints:
    """Detect up to max_keypoints Harris corners with subpixel refinement.

    Fixed output shape; invalid slots masked. `border` excludes the image rim
    where the descriptor pattern would leave the image; an optional (H, W)
    boolean `mask` suppresses detections outside it (ref CameraBase image
    mask, okvis_cv/include/okvis/cameras/CameraBase.hpp isMasked).

    On TPU the response+NMS runs as the fused Pallas kernel
    (ops.detection_pallas, equivalent inside the border); set
    `use_pallas` to force either path.
    """
    H, W = img.shape
    # border mask (selection only — subpixel refinement reads score_raw so a
    # detection at the mask edge never sees the -inf sentinel)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inb = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    if mask is not None:
        inb = inb & mask
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from ..ops.detection_pallas import harris_suppressed_pallas

        score_raw, sup = harris_suppressed_pallas(
            img.astype(jnp.float32), inb.astype(jnp.float32), nms_radius=nms_radius
        )
    else:
        score_raw = harris_response(img)
        score = jnp.where(inb, score_raw, -jnp.inf)
        sup = nms(score, nms_radius)

    if nms_radius >= 3 and ((H + 3) // 4) * ((W + 3) // 4) >= max_keypoints:
        # NMS survivors are > nms_radius apart (Chebyshev), so a 4x4
        # non-overlapping max-pool keeps EVERY survivor (two points in one
        # cell would be <=3 apart — both can't be window maxima) while
        # shrinking the top-k input 16x. top_k over the full (H*W) map is
        # ~70% of detection device time; over the pooled map it's noise.
        cell = 4
        Hp = -(-H // cell) * cell
        Wp = -(-W // cell) * cell
        sp = jnp.pad(
            sup, ((0, Hp - H), (0, Wp - W)), constant_values=-jnp.inf
        )
        cell_max = sp.reshape(Hp // cell, cell, Wp // cell, cell).max(
            axis=(1, 3)
        )
        Wc = Wp // cell
        vals, cidx = jax.lax.top_k(cell_max.ravel(), max_keypoints)
        cy = cidx // Wc
        cx = cidx % Wc
        # within-cell argmax via ONE flat 1-D gather (K, 16) — batched 2-D
        # advanced indexing lowers poorly on TPU
        dyx = (
            jnp.arange(cell)[:, None] * Wp + jnp.arange(cell)[None, :]
        ).ravel()  # (16,)
        base = (cy * cell) * Wp + cx * cell  # (K,)
        patch = jnp.take(sp.ravel(), base[:, None] + dyx[None, :], axis=0)
        sub = jnp.argmax(patch, axis=1)
        yy = (cy * cell + sub // cell).astype(jnp.float32)
        xx = (cx * cell + sub % cell).astype(jnp.float32)
    else:
        flat = sup.ravel()
        vals, idx = jax.lax.top_k(flat, max_keypoints)
        yy = (idx // W).astype(jnp.float32)
        xx = (idx % W).astype(jnp.float32)

    # subpixel quadratic refinement on the raw (un-masked) response; the
    # 5-point stencil for ALL keypoints is one flat 1-D gather (K, 5)
    yi = jnp.clip(yy.astype(jnp.int32), 1, H - 2)
    xi = jnp.clip(xx.astype(jnp.int32), 1, W - 2)
    base = yi * W + xi
    offs = jnp.asarray([0, 1, -1, W, -W], jnp.int32)
    v = jnp.take(score_raw.ravel(), base[:, None] + offs[None, :], axis=0)
    c, vr, vl, vd, vu = v[:, 0], v[:, 1], v[:, 2], v[:, 3], v[:, 4]
    dx = 0.5 * (vr - vl)
    dy = 0.5 * (vd - vu)
    dxx = vr + vl - 2 * c
    dyy = vd + vu - 2 * c
    ox = jnp.where(jnp.abs(dxx) > 1e-6, -dx / dxx, 0.0)
    oy = jnp.where(jnp.abs(dyy) > 1e-6, -dy / dyy, 0.0)
    ox = jnp.clip(ox, -0.5, 0.5)
    oy = jnp.clip(oy, -0.5, 0.5)
    uv = jnp.stack([xx + ox, yy + oy], axis=-1)
    mask = (vals > threshold) & jnp.isfinite(vals)
    return Keypoints(uv=uv, score=vals, mask=mask)


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x area downsample (average pooling)."""
    H, W = img.shape
    return img[: H - H % 2, : W - W % 2].reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))


@functools.partial(
    jax.jit, static_argnames=("max_keypoints", "nms_radius", "border", "octaves")
)
def detect_keypoints_pyramid(
    img: jnp.ndarray,
    threshold: float = 30.0,
    max_keypoints: int = 400,
    nms_radius: int = 4,
    border: int = 20,
    octaves: int = 2,
    mask: jnp.ndarray = None,
) -> Tuple[Keypoints, jnp.ndarray]:
    """Scale-space detection over `octaves`+1 pyramid levels
    (ref brisk::ScaleSpaceFeatureDetector with octaves>0; the detection_options
    'octaves' knob, config/config_fpga_p2_euroc.yaml:66-68).

    Per level: Harris + NMS + per-level top-K; coordinates are scaled back to
    the base image and the global strongest max_keypoints survive. Returns
    (Keypoints, sizes) where sizes[k] = base_size · 2^octave — feeding the
    observation weighting information = 64/size²."""
    BASE_SIZE = 8.0
    levels = [img]
    masks = [mask]
    for _ in range(octaves):
        levels.append(_downsample2(levels[-1]))
        masks.append(
            None if masks[-1] is None else masks[-1][::2, ::2]
        )

    all_uv, all_score, all_mask, all_size = [], [], [], []
    for o, im in enumerate(levels):
        kps = detect_keypoints(
            im,
            threshold=threshold,
            max_keypoints=max_keypoints,
            nms_radius=nms_radius,
            border=max(4, border // (2**o)),
            mask=masks[o],
        )
        scale = float(2**o)
        all_uv.append(kps.uv * scale + (scale - 1.0) / 2.0)
        all_score.append(kps.score)
        all_mask.append(kps.mask)
        all_size.append(jnp.full((max_keypoints,), BASE_SIZE * scale))
    uv = jnp.concatenate(all_uv)
    score = jnp.concatenate(all_score)
    valid = jnp.concatenate(all_mask)
    size = jnp.concatenate(all_size)
    # cross-scale suppression: drop any detection with a strictly stronger
    # one within nms_radius (base-image pixels) at ANY level
    d2 = jnp.sum((uv[:, None, :] - uv[None, :, :]) ** 2, axis=-1)
    neg_all = jnp.where(valid, score, -jnp.inf)
    stronger = (
        (neg_all[None, :] > neg_all[:, None])
        & (d2 < float(nms_radius) ** 2)
        & valid[None, :]
    )
    valid = valid & ~jnp.any(stronger, axis=1)
    # global strongest max_keypoints
    neg = jnp.where(valid, score, -jnp.inf)
    vals, idx = jax.lax.top_k(neg, max_keypoints)
    return (
        Keypoints(uv=uv[idx], score=score[idx], mask=valid[idx] & jnp.isfinite(vals)),
        size[idx],
    )
