"""Pallas TPU kernel: 1D parabolic min-plus transform (EDT inner loop).

Computes out[l, i] = min_j g[l, j] + ((i - j) * res)^2 — a matrix
product over the (min, +) semiring with the quadratic cost generated
in-kernel from iotas.  This is the O(L * n^2) hot loop of the separable
exact-EDT distance-field builder (ops/distance_field._build_edt); at the
reference's res-0.002 bunny operating point each pass is L~1e6 lines of
n~1e3 nodes (registration.cu:186-198 grid dims).

The XLA fallback in distance_field._minplus_1d bounds its intermediate
with lax.map/fori chunking, but the [line_chunk, n, out_chunk] broadcast
still round-trips HBM once per output chunk.  Here the broadcast lives
entirely in VMEM: grid (l_blocks, i_blocks, j_blocks) with j innermost,
accumulating the running min into the output block.

Layout notes (cost several iterations):
* The input rides TRANSPOSED ([n, L] blocks of [JBLK, LT]) so the
  per-iteration j-slice is a sublane-dim dynamic slice (lane-dim slices
  of width < 128 don't lower) and the [JSUB, LT, IT] broadcast reduces
  over its LEADING axis — no in-kernel transpose.
* The j sub-tile loop is a lax.fori_loop, not a Python loop: an
  unrolled loop allocates a fresh VMEM stack buffer per iteration
  (16 x 4.2 MB blew the 16 MB scoped-vmem limit); the traced body
  reuses one.
* Mosaic iota is integer-only: indices build in int32 and convert
  after the subtraction (|i - j| < 2^24, exact in f32).

Per-step traffic is one [JBLK, LT] g tile + the resident [LT, IT]
accumulator; compute is pure VPU add+min (no MXU involvement — the
semiring has no hardware matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30

LT = 256    # lines per block
IT = 128    # output nodes per block
JBLK = 512  # input nodes per grid step
JSUB = 32   # input nodes per VMEM broadcast (JSUB*LT*IT*4 = 4.2 MB)


def _kernel(res2_ref, gt_ref, out_ref):
    j_blk = pl.program_id(2)

    @pl.when(j_blk == 0)
    def _():
        out_ref[...] = jnp.full((LT, IT), BIG, jnp.float32)

    i_blk = pl.program_id(1)
    res2 = res2_ref[0, 0]
    i_iota = jax.lax.broadcasted_iota(jnp.int32, (JSUB, IT), 1)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (JSUB, IT), 0)

    def body(s, acc):
        j0 = j_blk * JBLK + s * JSUB
        diff = (i_blk * IT + i_iota - j0 - j_iota).astype(jnp.float32)
        cost = diff * diff * res2                          # [JSUB, IT]
        g_sub = gt_ref[pl.ds(s * JSUB, JSUB), :]           # [JSUB, LT]
        vals = g_sub[:, :, None] + cost[:, None, :]        # [JSUB, LT, IT]
        return jnp.minimum(acc, jnp.min(vals, axis=0))

    out_ref[...] = jax.lax.fori_loop(
        0, JBLK // JSUB, body, out_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def minplus_1d(g, resolution, interpret: bool = False):
    """out[l, i] = min_j g[l, j] + ((i - j) * resolution)^2.

    g: [L, n] float32.  Pads L to LT and n to block multiples
    internally (j padding with +BIG so padded nodes never win).
    """
    g = jnp.asarray(g, jnp.float32)
    l, n = g.shape
    n_pad = (-n) % max(IT, JBLK)
    l_pad = (-l) % LT
    if n_pad or l_pad:
        g = jnp.pad(g, [(0, l_pad), (0, n_pad)], constant_values=BIG)
    lp, np_ = g.shape
    res2 = jnp.asarray(resolution, jnp.float32).reshape(1, 1) ** 2

    out = pl.pallas_call(
        _kernel,
        grid=(lp // LT, np_ // IT, np_ // JBLK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((JBLK, LT), lambda li, ii, ji: (ji, li),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LT, IT), lambda li, ii, ji: (li, ii),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, np_), jnp.float32),
        interpret=interpret,
    )(res2, g.T)
    return out[:l, :n]
