"""Pallas TPU kernel for exact nearest-neighbor (min + argmin).

The ICP hot loop queries [G*ns] points against the full target every
iteration (/root/reference/fgoicp/icp3d.cu:11-28 does this brute-force on
CUDA).  The XLA path in ops/nn.py streams [8192, 2048] tiles through
sequential lax.map/lax.scan stages — latency-bound on TPU.  This kernel
walks the target in VMEM-resident tiles per query tile:

  grid (m_tiles,):                q tile [3, QT]
    for each target tile t (fori_loop):
      d2      = (cx - qx)^2 + (cy - qy)^2 + (cz - qz)^2  [TT, QT] (VPU)
      m, mi   = running (min, argmin)                    [1, QT]

d2 is computed by direct squared differences — exact in f32, unlike the
MXU norm-expansion form, which either rounds inputs to bf16 (35% wrong
argmins, measured) or costs 6 MXU passes at precision=HIGHEST.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e10

QT = 1024   # query lanes per grid step
TT = 512    # target sublanes per inner step


def _target_tile(t):
    """Target tile size: pad to 128 sublanes, cap at TT.  A fixed TT=512
    made every target <=512 (small proxy coresets) cost 512's worth of
    VPU work."""
    return min(TT, -(-t // 128) * 128)


def _kernel(n_t_tiles, tt):
    def kernel(q_ref, tgt_ref, d2_ref, idx_ref):
        qx = q_ref[0, 0:1, :]                                 # [1, QT]
        qy = q_ref[0, 1:2, :]
        qz = q_ref[0, 2:3, :]

        # Exact f32 squared differences on the VPU (the MXU norm-trick
        # either rounds inputs to bf16 — measured 35% wrong argmins — or
        # costs 6 passes with precision=HIGHEST).
        def body(t, carry):
            m, mi = carry
            c = tgt_ref[pl.ds(t * tt, tt), :]                 # [tt, 3]
            dx = c[:, 0:1] - qx                               # [tt, QT]
            dy = c[:, 1:2] - qy
            dz = c[:, 2:3] - qz
            d2 = dx * dx + dy * dy + dz * dz
            lm = jnp.min(d2, axis=0, keepdims=True)           # [1, QT]
            la = (jnp.argmin(d2, axis=0).astype(jnp.int32)[None, :]
                  + t * tt)
            upd = lm < m
            return jnp.where(upd, lm, m), jnp.where(upd, la, mi)

        m0 = jnp.full((1, QT), BIG, jnp.float32)
        mi0 = jnp.zeros((1, QT), jnp.int32)
        m, mi = jax.lax.fori_loop(0, n_t_tiles, body, (m0, mi0))
        d2_ref[0] = m
        idx_ref[0] = mi

    return kernel


def _kernel_min(n_t_tiles, tt):
    """Min-distance-only variant: bound evaluation needs d2 but not the
    winner's identity, and the per-tile argmin bookkeeping (iota +
    compare/select reductions) measurably dominates the plain min —
    skipping it nearly doubles query throughput (BASELINE.md round 3)."""
    def kernel(q_ref, tgt_ref, d2_ref):
        qx = q_ref[0, 0:1, :]
        qy = q_ref[0, 1:2, :]
        qz = q_ref[0, 2:3, :]

        def body(t, m):
            c = tgt_ref[pl.ds(t * tt, tt), :]                 # [tt, 3]
            dx = c[:, 0:1] - qx
            dy = c[:, 1:2] - qy
            dz = c[:, 2:3] - qz
            d2 = dx * dx + dy * dy + dz * dz
            return jnp.minimum(m, jnp.min(d2, axis=0, keepdims=True))

        m0 = jnp.full((1, QT), BIG, jnp.float32)
        d2_ref[0] = jax.lax.fori_loop(0, n_t_tiles, body, m0)

    return kernel


def _pad_axis(a, axis, size, value=0.0):
    pad = (-a.shape[axis]) % size
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_argmin(queries, points, interpret: bool = False):
    """(d2 [M], idx [M]) of the nearest point for each query; both exact
    in f32 (squared differences, no norm-expansion cancellation)."""
    queries = jnp.asarray(queries, jnp.float32).reshape(-1, 3)
    points = jnp.asarray(points, jnp.float32)
    m = queries.shape[0]

    q_t = _pad_axis(jnp.swapaxes(queries, 0, 1), 1, QT)       # [3, Mp]
    mp = q_t.shape[1]
    m_tiles = mp // QT
    q_t = q_t.reshape(3, m_tiles, QT).swapaxes(0, 1)          # [mt, 3, QT]
    # Far-away padding targets never win the min.
    tt = _target_tile(points.shape[0])
    tgt_p = _pad_axis(points, 0, tt, value=1e6)               # [Tp, 3]
    n_t_tiles = tgt_p.shape[0] // tt

    out_shape = [
        jax.ShapeDtypeStruct((m_tiles, 1, QT), jnp.float32),
        jax.ShapeDtypeStruct((m_tiles, 1, QT), jnp.int32),
    ]
    d2, idx = pl.pallas_call(
        _kernel(n_t_tiles, tt),
        grid=(m_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, QT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tgt_p.shape[0], 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, QT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, QT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(q_t, tgt_p)
    d2 = d2.reshape(mp)[:m]
    idx = idx.reshape(mp)[:m]
    # Clamp padding-target indices (can only appear if points is empty-ish).
    idx = jnp.minimum(idx, points.shape[0] - 1)
    return d2, idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_min(queries, points, interpret: bool = False):
    """d2 [M] of the nearest point for each query (no argmin — see
    _kernel_min)."""
    queries = jnp.asarray(queries, jnp.float32).reshape(-1, 3)
    points = jnp.asarray(points, jnp.float32)
    m = queries.shape[0]

    q_t = _pad_axis(jnp.swapaxes(queries, 0, 1), 1, QT)       # [3, Mp]
    mp = q_t.shape[1]
    m_tiles = mp // QT
    q_t = q_t.reshape(3, m_tiles, QT).swapaxes(0, 1)          # [mt, 3, QT]
    tt = _target_tile(points.shape[0])
    tgt_p = _pad_axis(points, 0, tt, value=1e6)               # [Tp, 3]
    n_t_tiles = tgt_p.shape[0] // tt

    d2 = pl.pallas_call(
        _kernel_min(n_t_tiles, tt),
        grid=(m_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, QT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tgt_p.shape[0], 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, QT), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_tiles, 1, QT), jnp.float32),
        interpret=interpret,
    )(q_t, tgt_p)
    return d2.reshape(mp)[:m]
