"""Pallas TPU kernel: Hamming distance matrix via XOR + popcount.

The integer-path alternative to the ±1 MXU matmul in ops.hamming (which is
the default). Works on packed uint32 descriptors directly — no bit expansion,
so HBM traffic is 16x lower than the bf16 ±1 route; for the 400×400 BRISK
workload both are microseconds, but this kernel wins when matching against
large keyframe databases (B ≫ 10⁴) where the expanded ±1 matrix would spill.

Kernel layout: grid over (A-tiles, B-tiles); each program XORs an
(TA, WORDS) block of A against a (TB, WORDS) block of B with broadcasting in
VMEM, popcounts, and reduces over the word axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hamming_kernel(a_ref, b_ref, out_ref):
    # a: (TA, W) uint32, b: (TB, W) uint32. Accumulate one (TA, TB) tile per
    # descriptor word so the vector registers stay in the natural
    # (sublane=TA, lane=TB) layout — a (TA, TB, W) broadcast XOR would put the
    # 16 words in the 128-wide lane dimension and waste 7/8 of the VPU.
    a = a_ref[:]
    b = b_ref[:]
    W = a.shape[1]
    acc = jnp.zeros((a.shape[0], b.shape[0]), jnp.int32)
    for w in range(W):  # static unroll (W=16)
        x = a[:, w][:, None] ^ b[:, w][None, :]  # (TA, TB)
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile_a", "tile_b", "interpret"))
def hamming_matrix_pallas(
    desc_a: jnp.ndarray,  # (NA, W) uint32, NA % tile_a == 0
    desc_b: jnp.ndarray,  # (NB, W) uint32, NB % tile_b == 0
    tile_a: int = 128,
    tile_b: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full (NA, NB) int32 Hamming distance matrix."""
    NA, W = desc_a.shape
    NB, _ = desc_b.shape
    ta = min(tile_a, NA)
    tb = min(tile_b, NB)
    assert NA % ta == 0 and NB % tb == 0, "pad descriptor tables to tile size"
    grid = (NA // ta, NB // tb)
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((NA, NB), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ta, W), lambda i, j: (i, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((tb, W), lambda i, j: (j, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ta, tb), lambda i, j: (i, j),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(desc_a, desc_b)
