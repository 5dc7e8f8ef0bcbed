"""Pallas TPU kernel: fused Harris corner response + non-max suppression.

TPU-native replacement for the hot half of the reference's BRISK
ScaleSpaceFeatureDetector (external brisk-2.0.5, wired at
/root/reference/okvis_frontend/src/Frontend.cpp:813-843). The XLA reference
path (frontend.detection.harris_response + nms) lowers to ~6 separate
conv/reduce_window fusions with HBM round-trips between them; this kernel
keeps the whole image resident in VMEM and produces both the raw response
(needed for subpixel refinement) and the suppressed score map in ONE pass:

    gradients (Scharr) -> structure tensor -> separable Gaussian blur ->
    Harris det - k tr^2 -> border/user masking -> separable 9x9 window max ->
    suppression

Everything is elementwise/shift VPU work — no MXU — so the kernel is purely
HBM-bandwidth bound: it reads the image once and writes the two maps once
(3 x H x W x 4 bytes total), versus ~10+ map-sized HBM transfers for the
unfused op chain.

Boundary semantics: shifts are circular (pltpu.roll) while the XLA path uses
edge padding; the difference is confined to a 10-pixel rim (Scharr 1 + blur
radius 5 + NMS radius 4) which sits strictly inside the detection border
(default 20 px, masked to -inf before NMS in both paths), so inside the
border the response matches the XLA path to accumulation-order tolerance and
the suppressed maxima agree. Verified by
tests/test_frontend.py::test_pallas_harris_matches_xla.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gauss_taps(sigma: float = 1.5) -> Tuple[float, ...]:
    """Same taps as frontend.detection.gaussian_kernel (numpy, compile-time)."""
    radius = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    return tuple(float(v) for v in k)


def _roll(x, shift, axis):
    """Circular shift matching jnp.roll; pltpu.roll wants shift >= 0."""
    if shift == 0:
        return x
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _harris_nms_kernel(
    img_ref, inb_ref, raw_ref, sup_ref, *, k_harris, nms_radius, taps, halo
):
    img = img_ref[:]

    def sh(x, dy, dx):
        # matches jnp.roll(x, (dy, dx), (0, 1)): out[y, x] = in[y-dy, x-dx]
        y = x
        if dy:
            y = _roll(y, dy, 0)
        if dx:
            y = _roll(y, dx, 1)
        return y

    # Scharr gradients (identical coefficients to the XLA path)
    gx = (
        3.0 * (sh(img, -1, -1) - sh(img, -1, 1))
        + 10.0 * (sh(img, 0, -1) - sh(img, 0, 1))
        + 3.0 * (sh(img, 1, -1) - sh(img, 1, 1))
    ) / 32.0
    gy = (
        3.0 * (sh(img, -1, -1) - sh(img, 1, -1))
        + 10.0 * (sh(img, -1, 0) - sh(img, 1, 0))
        + 3.0 * (sh(img, -1, 1) - sh(img, 1, 1))
    ) / 32.0

    r = (len(taps) - 1) // 2

    def blur(x):
        # separable: out[y] = sum_i taps[i] * x[y + (i - r)]  (both axes)
        acc = taps[0] * _roll(x, r, 0)
        for i in range(1, len(taps)):
            acc = acc + taps[i] * _roll(x, r - i, 0)
        out = taps[0] * _roll(acc, r, 1)
        for i in range(1, len(taps)):
            out = out + taps[i] * _roll(acc, r - i, 1)
        return out

    Ixx = blur(gx * gx)
    Iyy = blur(gy * gy)
    Ixy = blur(gx * gy)
    tr = Ixx + Iyy
    raw = (Ixx * Iyy - Ixy * Ixy) - k_harris * tr * tr

    ninf = jnp.float32(-jnp.inf)
    score = jnp.where(inb_ref[:] > 0, raw, ninf)
    # separable (2r+1)^2 window max == reduce_window max in the interior
    m = score
    for d in range(1, nms_radius + 1):
        m = jnp.maximum(m, jnp.maximum(_roll(score, d, 0), _roll(score, -d, 0)))
    mc = m
    for d in range(1, nms_radius + 1):
        mc = jnp.maximum(mc, jnp.maximum(_roll(m, d, 1), _roll(m, -d, 1)))
    sup = jnp.where(score >= mc, score, ninf)
    # write the chunk interior only (halo rows are recomputation margin)
    tile = raw_ref.shape[0]
    raw_ref[:] = jax.lax.slice_in_dim(raw, halo, halo + tile, axis=0)
    sup_ref[:] = jax.lax.slice_in_dim(sup, halo, halo + tile, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("k_harris", "nms_radius", "sigma", "tile", "interpret"),
)
def harris_suppressed_pallas(
    img: jnp.ndarray,  # (H, W) float32
    inb: jnp.ndarray,  # (H, W) float32 1/0 validity (border & user mask)
    k_harris: float = 0.04,
    nms_radius: int = 4,
    sigma: float = 1.5,
    tile: int = 64,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(raw_response, suppressed_score) — one fused kernel launch per image.

    The image is processed in `tile`-row chunks with a recomputation halo
    (Scharr 1 + blur radius + NMS radius rows) so each grid program's working
    set stays well under the ~16 MB VMEM scoped limit; chunks are gathered on
    the XLA side and the chunk axis becomes the Pallas grid. vmap adds the
    camera axis as a second grid dimension, so the whole multiframe detects
    in a single launch — the TPU form of the reference's thread-per-camera
    detection (ThreadedKFVio.cpp:130-132).
    """
    H, W = img.shape
    img = img.astype(jnp.float32)
    inb = inb.astype(jnp.float32)
    radius = max(1, int(3.0 * sigma + 0.5))
    halo = 1 + radius + nms_radius  # scharr + blur + nms support
    G = -(-H // tile)  # cdiv
    Hp = G * tile
    # edge-pad rows; halo rows beyond the image are masked (inb pads with 0)
    imgp = jnp.pad(img, ((halo, Hp - H + halo), (0, 0)), mode="edge")
    inbp = jnp.pad(inb, ((halo, Hp - H + halo), (0, 0)))
    starts = jnp.arange(G) * tile
    chunk = tile + 2 * halo

    def take(a, s):
        return jax.lax.dynamic_slice(a, (s, 0), (chunk, W))

    img_c = jax.vmap(take, in_axes=(None, 0))(imgp, starts)  # (G, chunk, W)
    inb_c = jax.vmap(take, in_axes=(None, 0))(inbp, starts)

    kern = functools.partial(
        _harris_nms_kernel,
        k_harris=float(k_harris),
        nms_radius=int(nms_radius),
        taps=_gauss_taps(sigma),
        halo=halo,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def one_chunk(ic, bc):
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((tile, W), jnp.float32),
                jax.ShapeDtypeStruct((tile, W), jnp.float32),
            ),
            in_specs=[vmem, vmem],
            out_specs=(vmem, vmem),
            interpret=interpret,
        )(ic, bc)

    raw_c, sup_c = jax.vmap(one_chunk)(img_c, inb_c)
    return (
        raw_c.reshape(Hp, W)[:H],
        sup_c.reshape(Hp, W)[:H],
    )
