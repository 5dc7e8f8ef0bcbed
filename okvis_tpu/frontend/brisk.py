"""BRISK-style binary descriptor with gravity-aligned extraction direction.

TPU-native replacement for the external brisk-2.0.5 descriptor extractor the
reference wires up in /root/reference/okvis_frontend/src/Frontend.cpp:107-110
and :833-843: a radially-symmetric sampling pattern of smoothed intensity
points; short-distance point pairs compare into a 512-bit binary string. The
reference rotates the pattern per keypoint to the *gravity direction projected
into the image* (extractionDirection, Frontend.cpp:92-110) instead of an
estimated orientation — we do the same, which makes the rotation a single
per-frame angle: the whole extraction is one batched gather + compare.

Pattern: 4 concentric rings (+ center), 60 points, following the BRISK layout
(N per ring, radius, per-ring smoothing sigma); pairs are the 512 shortest
point pairs (the classic "short pairs" with distance < 9.75·scale).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .detection import Keypoints

DESCRIPTOR_BITS = 512
DESCRIPTOR_WORDS = DESCRIPTOR_BITS // 32


def _build_pattern() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (points (60,2), point_sigma (60,), pair_i (512,), pair_j (512,)).

    Ring layout (radius in px at scale 1, #points, sigma): BRISK-like.
    """
    rings = [
        (0.0, 1, 0.7),
        (2.9, 10, 0.8),
        (4.9, 14, 1.1),
        (7.4, 15, 1.6),
        (10.8, 20, 2.3),
    ]
    pts, sig = [], []
    for r, n, s in rings:
        for k in range(n):
            a = 2 * np.pi * k / n + (0.5 if r > 0 else 0.0) * np.pi / n
            pts.append([r * np.cos(a), r * np.sin(a)])
            sig.append(s)
    pts = np.asarray(pts, dtype=np.float32)
    sig = np.asarray(sig, dtype=np.float32)
    # all pairs sorted by distance; take the 512 shortest non-degenerate
    n = len(pts)
    ii, jj = np.triu_indices(n, k=1)
    d = np.linalg.norm(pts[ii] - pts[jj], axis=1)
    order = np.argsort(d, kind="stable")
    sel = order[:DESCRIPTOR_BITS]
    return pts, sig, ii[sel].astype(np.int32), jj[sel].astype(np.int32)


_PATTERN_PTS, _PATTERN_SIG, _PAIR_I, _PAIR_J = _build_pattern()
# distinct smoothing sigmas -> blur pyramid levels
_SIGMAS = np.unique(_PATTERN_SIG)
_PT_LEVEL = np.searchsorted(_SIGMAS, _PATTERN_SIG).astype(np.int32)
# static grouping of pattern points by blur level: each point is gathered from
# exactly its own level (vs sampling all levels and selecting — 5× the gathers)
_LEVEL_ORDER = np.argsort(_PT_LEVEL, kind="stable")
_LEVEL_INV = np.argsort(_LEVEL_ORDER)
_LEVEL_COUNTS = np.bincount(_PT_LEVEL, minlength=len(_SIGMAS))


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _multi_sigma_kernels(sigmas: np.ndarray) -> Tuple[np.ndarray, int]:
    """Zero-padded Gaussian taps, one row per sigma (L, 2·rad+1).

    Per-sigma radius = int(3σ+0.5) exactly as detection.gaussian_kernel; the
    zero taps beyond each radius contribute nothing, so padding every kernel
    to the widest radius changes no output values."""
    rads = [max(1, int(3.0 * s + 0.5)) for s in sigmas]
    rad = max(rads)
    taps = np.zeros((len(sigmas), 2 * rad + 1), np.float32)
    for i, (s, r) in enumerate(zip(sigmas, rads)):
        x = np.arange(-r, r + 1, dtype=np.float64)
        k = np.exp(-0.5 * (x / s) ** 2)
        taps[i, rad - r:rad + r + 1] = (k / k.sum()).astype(np.float32)
    return taps, rad


_BLUR_TAPS, _BLUR_RAD = _multi_sigma_kernels(_SIGMAS)


@functools.lru_cache(maxsize=None)
def _blur_toeplitz_bank(n: int) -> np.ndarray:
    """(L, n, n) banded Toeplitz matrices: column w of level l holds the
    level's Gaussian taps centered at w, with out-of-range taps folded onto
    the clamped border row — exactly the edge-replicate conv semantics
    (out[w] = Σ_t k[t]·img[clamp(w+t−r, 0, n−1)])."""
    L, taps = _BLUR_TAPS.shape
    r = _BLUR_RAD
    T = np.zeros((L, n, n), np.float32)
    for l in range(L):
        for t in range(taps):
            w = np.arange(n)
            src = np.clip(w + t - r, 0, n - 1)
            np.add.at(T[l], (src, w), _BLUR_TAPS[l, t])
    return T


def blur_pyramid(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) → (B, L, H, W): every pattern-sigma blur of every image as
    TWO banded-Toeplitz matmul contractions (horizontal then vertical).

    Output is always float32 regardless of input dtype (the Toeplitz bank is
    f32 and the contractions run at HIGHEST precision); descriptor sampling
    downstream only compares smoothed intensities, so callers never need the
    input dtype back.

    A separable blur with 1 input channel and L output channels is a
    worst-case conv for the MXU (the systolic array wants ≥128-deep channel
    contractions; C_in=1 leaves it ~1% utilized — measured 2.5 ms for
    (2,5,480,752) on v5e). Expressed as dense (n,n) banded matrices the
    same math contracts over the 480/752-long spatial axis and runs at
    matmul speed (~0.3 ms). The matrices bake in the edge-replicate
    clamping, so outputs equal the conv formulation to float rounding.
    HIGHEST precision: descriptor bits compare smoothed intensities, so the
    blur must not lose precision to single-pass bf16."""
    B, H, W = images.shape
    x = images.astype(jnp.float32)
    Tw = jnp.asarray(_blur_toeplitz_bank(W))  # (L, W, W)
    Th = jnp.asarray(_blur_toeplitz_bank(H))  # (L, H, H)
    out = jnp.einsum("bhw,lwv->blhv", x, Tw, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("blhv,lhg->blgv", out, Th, precision=jax.lax.Precision.HIGHEST)
    return out


def _blur_pyramid_conv(images: jnp.ndarray) -> jnp.ndarray:
    """Reference conv formulation of blur_pyramid (kept for the equivalence
    test; the Toeplitz matmul path above is the production implementation)."""
    B, H, W = images.shape
    L = len(_SIGMAS)
    dtype = images.dtype
    kh = jnp.asarray(_BLUR_TAPS, dtype)  # (L, taps)
    rad = _BLUR_RAD
    # horizontal: (B,1,H,W+2r) ⊛ (L,1,1,taps) -> (B,L,H,W)
    xp = jnp.pad(images, ((0, 0), (0, 0), (rad, rad)), mode="edge")
    out = jax.lax.conv_general_dilated(
        xp[:, None], kh[:, None, None, :], (1, 1), "VALID"
    )
    # vertical: depthwise over the L levels
    yp = jnp.pad(out, ((0, 0), (0, 0), (rad, rad), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        yp, kh[:, None, :, None], (1, 1), "VALID", feature_group_count=L
    )
    return out


def _describe_from_levels(
    levels: jnp.ndarray,  # (C, L, H, W) blur pyramid per camera
    uv: jnp.ndarray,  # (C, K, 2)
    angles: jnp.ndarray,  # (C,)
    sizes: jnp.ndarray = None,  # (C, K) keypoint sizes; None = base (8 px)
) -> jnp.ndarray:
    """(C, K, 16) packed descriptors via ONE flat 1-D gather per bilinear
    corner: all cameras/levels/keypoints index the flattened pyramid with
    linear offsets (TPU handles big 1-D gathers far better than batched 2-D
    gathers; level/camera offsets are static per group)."""
    C, L, H, W = levels.shape
    flat = levels.reshape(-1)
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # (C,)
    p = jnp.asarray(_PATTERN_PTS)  # (60, 2)
    # rotated offsets per camera: (C, 60)
    px = ca[:, None] * p[None, :, 0] - sa[:, None] * p[None, :, 1]
    py = sa[:, None] * p[None, :, 0] + ca[:, None] * p[None, :, 1]
    if sizes is not None:
        # scale-space keypoints: the sampling pattern scales with keypoint
        # size (BRISK semantics; detection sizes are 8·2^octave). Geometry is
        # exact; per-point smoothing stays at the base sigmas — acceptable
        # since cross-scale matching is gated by Hamming threshold anyway.
        s = (sizes / 8.0)[:, :, None]  # (C, K, 1)
        xs = uv[:, :, 0][:, :, None] + px[:, None, :] * s  # (C, K, 60)
        ys = uv[:, :, 1][:, :, None] + py[:, None, :] * s
    else:
        xs = uv[:, :, 0][:, :, None] + px[:, None, :]  # (C, K, 60)
        ys = uv[:, :, 1][:, :, None] + py[:, None, :]
    cam_off = (jnp.arange(C, dtype=jnp.int32) * (L * H * W))[:, None, None]

    groups, start = [], 0
    for lvl, cnt in enumerate(_LEVEL_COUNTS):
        sel = jnp.asarray(_LEVEL_ORDER[start:start + cnt])
        start += cnt
        x = xs[:, :, sel]
        y = ys[:, :, sel]
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
        fx = jnp.clip(x - x0, 0.0, 1.0)
        fy = jnp.clip(y - y0, 0.0, 1.0)
        base = cam_off + lvl * (H * W) + y0 * W + x0  # (C, K, cnt)
        v00 = flat[base]
        v01 = flat[base + 1]
        v10 = flat[base + W]
        v11 = flat[base + W + 1]
        groups.append(
            v00 * (1 - fx) * (1 - fy)
            + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy
            + v11 * fx * fy
        )
    samples = jnp.concatenate(groups, axis=-1)[:, :, jnp.asarray(_LEVEL_INV)]
    bits = (
        samples[:, :, jnp.asarray(_PAIR_I)] < samples[:, :, jnp.asarray(_PAIR_J)]
    ).astype(jnp.uint32)  # (C, K, 512)
    words = bits.reshape(C, -1, DESCRIPTOR_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts, axis=-1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=())
def describe_keypoints(
    img: jnp.ndarray,  # (H, W) float
    keypoints: Keypoints,
    extraction_angle: jnp.ndarray = None,  # scalar radians; gravity-aligned
    sizes: jnp.ndarray = None,  # (K,) keypoint sizes (scale-space detection)
) -> jnp.ndarray:
    """Extract (K, 16) uint32 packed 512-bit descriptors.

    extraction_angle rotates the sampling pattern (one angle per frame, from
    the gravity direction in the image — Frontend.cpp:107-110). None = 0.
    sizes scales the pattern per keypoint (multi-octave detection)."""
    img = img.astype(jnp.float32)
    if extraction_angle is None:
        extraction_angle = jnp.asarray(0.0, jnp.float32)
    levels = blur_pyramid(img[None])  # (1, L, H, W)
    return _describe_from_levels(
        levels,
        keypoints.uv[None],
        jnp.asarray(extraction_angle).reshape(1),
        None if sizes is None else jnp.asarray(sizes)[None],
    )[0]


def gravity_extraction_angle(g_in_camera: jnp.ndarray) -> jnp.ndarray:
    """Angle of the gravity direction projected into the image plane.

    g_in_camera: (3,) gravity direction in camera coordinates
    (C_CW @ [0,0,-1]); the image-plane projection (x, y) defines the pattern
    rotation so descriptors stay comparable under camera roll
    (Frontend.cpp:92-110)."""
    return jnp.arctan2(g_in_camera[1], g_in_camera[0])


def detect_and_describe(
    img: jnp.ndarray,
    threshold: float = 30.0,
    max_keypoints: int = 400,
    extraction_angle: jnp.ndarray = None,
):
    """Convenience: detection + description in one call (jit once)."""
    from .detection import detect_keypoints

    kps = detect_keypoints(img, threshold=threshold, max_keypoints=max_keypoints)
    desc = describe_keypoints(img, kps, extraction_angle)
    return kps, desc


@functools.partial(
    jax.jit, static_argnames=("threshold", "max_keypoints", "nms_radius", "border")
)
def detect_and_describe_batch(
    images: jnp.ndarray,  # (C, H, W)
    extraction_angles: jnp.ndarray,  # (C,)
    threshold: float = 30.0,
    max_keypoints: int = 400,
    nms_radius: int = 4,
    border: int = 20,
):
    """Detection + description for a whole multiframe in ONE program:
    vmapped over the camera axis (replaces the reference's thread-per-camera
    detection, ThreadedKFVio.cpp:130-132, with a single batched launch).

    Returns (Keypoints batched (C, K, ...), descriptors (C, K, 16))."""
    from .detection import detect_keypoints

    kps = jax.vmap(
        lambda img: detect_keypoints(
            img,
            threshold=threshold,
            max_keypoints=max_keypoints,
            nms_radius=nms_radius,
            border=border,
        )
    )(images)
    levels = blur_pyramid(images.astype(jnp.float32))  # (C, L, H, W)
    desc = _describe_from_levels(levels, kps.uv, extraction_angles)
    return kps, desc


@functools.partial(
    jax.jit,
    static_argnames=("threshold", "max_keypoints", "nms_radius", "border",
                     "octaves", "has_masks"),
)
def detect_and_describe_batch_pyramid(
    images: jnp.ndarray,  # (C, H, W)
    extraction_angles: jnp.ndarray,  # (C,)
    masks: jnp.ndarray = None,  # (C, H, W) bool or None
    threshold: float = 30.0,
    max_keypoints: int = 400,
    nms_radius: int = 4,
    border: int = 20,
    octaves: int = 2,
    has_masks: bool = False,
):
    """Scale-space (and/or masked) detection + scale-aware description for a
    whole multiframe in ONE program — the batched form of the per-camera
    fallback path. Returns (Keypoints (C,K,...), sizes (C,K), desc (C,K,16))."""
    from .detection import detect_keypoints, detect_keypoints_pyramid

    def one(img, mask):
        if octaves > 0:
            return detect_keypoints_pyramid(
                img, threshold=threshold, max_keypoints=max_keypoints,
                nms_radius=nms_radius, border=border, octaves=octaves,
                mask=mask,
            )
        kps = detect_keypoints(
            img, threshold=threshold, max_keypoints=max_keypoints,
            nms_radius=nms_radius, border=border, mask=mask,
        )
        return kps, jnp.full((max_keypoints,), 8.0, img.dtype)

    if has_masks:
        kps, sizes = jax.vmap(one)(images, masks)
    else:
        kps, sizes = jax.vmap(lambda im: one(im, None))(images)
    levels = blur_pyramid(images.astype(jnp.float32))
    desc = _describe_from_levels(
        levels, kps.uv, extraction_angles,
        sizes if octaves > 0 else None,
    )
    return kps, sizes, desc
