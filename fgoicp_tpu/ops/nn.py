"""Exact nearest-neighbor search as tiled matmul + streaming argmin.

Replaces the reference's O(ns*nt) brute-force CUDA loops
(/root/reference/fgoicp/registration.cu:162-174, icp3d.cu:11-28) with an
MXU/VPU-friendly formulation: ||q - p||^2 = ||q||^2 + ||p||^2 - 2 q.p, where
the cross term is a [M, 3] @ [3, nt] matmul.  The target axis is streamed in
fixed-size chunks with a running (min, argmin) carry — flash-attention-style
— so memory stays bounded for any nt, and the query axis is mapped in chunks
so any M works.

All functions are shape-polymorphic in Python but trace to static shapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from . import pallas_nn

BIG = jnp.float32(1e10)  # reference M_INF (common.hpp:18)


def use_pallas() -> bool:
    """Pallas NN kernel: default on TPU; FGOICP_TPU_NO_PALLAS opts out,
    FGOICP_TPU_FORCE_PALLAS opts in anywhere (interpret mode)."""
    if os.environ.get("FGOICP_TPU_NO_PALLAS"):
        return False
    if os.environ.get("FGOICP_TPU_FORCE_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


def _pallas_nn(queries, pct):
    """Exact f32 NN via the Pallas kernel (squared differences in-kernel,
    so no winner rescore is needed)."""
    return pallas_nn.nn_argmin(
        queries, pct, interpret=(jax.default_backend() != "tpu"))

# Streaming chunk sizes; multiples of 128 to line up with TPU lanes.
_T_CHUNK = 2048
_Q_CHUNK = 8192


def _pad_target(pct, t_chunk):
    """Pad target to a multiple of t_chunk with far-away sentinel points."""
    nt = pct.shape[0]
    pad = (-nt) % t_chunk
    if pad:
        sentinel = jnp.full((pad, 3), 1e18, dtype=pct.dtype)
        pct = jnp.concatenate([pct, sentinel], axis=0)
    return pct, nt


def _chunked_min(queries, pct, t_chunk, want_idx, rank_precision="highest"):
    """Core streaming reduction over target chunks.

    queries: [M, 3]; pct: [NT_padded, 3] (padded with sentinels).
    Returns d2[M] (and idx[M] into the padded target if want_idx).
    """
    m = queries.shape[0]
    n_chunks = pct.shape[0] // t_chunk
    pct_chunks = pct.reshape(n_chunks, t_chunk, 3)
    q_sq = jnp.sum(queries * queries, axis=-1)  # [M]

    def body(carry, chunk):
        best_d2, best_idx, chunk_i = carry
        p = chunk  # [T, 3]
        p_sq = jnp.sum(p * p, axis=-1)  # [T]
        # Ranking precision: TPU default matmul precision is bfloat16
        # (~3e-3 absolute error in d2); 'highest' costs ~4x but makes the
        # argmin ranking near-exact.  The winner is rescored exactly below
        # regardless, so lower precisions only risk small argmin flips.
        cross = jnp.dot(queries, p.T, precision=rank_precision,
                        preferred_element_type=jnp.float32)  # [M, T]
        d2 = q_sq[:, None] + p_sq[None, :] - 2.0 * cross
        local_min = jnp.min(d2, axis=-1)
        improved = local_min < best_d2
        new_d2 = jnp.where(improved, local_min, best_d2)
        local_arg = jnp.argmin(d2, axis=-1) + chunk_i * t_chunk
        new_idx = jnp.where(improved, local_arg, best_idx)
        return (new_d2, new_idx, chunk_i + 1), None

    init = (jnp.full((m,), BIG, jnp.float32), jnp.zeros((m,), jnp.int32), jnp.int32(0))
    (_, idx, _), _ = jax.lax.scan(body, init, pct_chunks)
    # Padding sentinels are ~1e18 away so they never win, but squared
    # distances to them overflow harmlessly into +inf and lose the min.
    # Rescore the winner exactly: ||q||^2 + ||p||^2 - 2 q.p cancels
    # catastrophically near zero; the direct difference does not.
    winner = pct[idx]
    diff = queries - winner
    d2 = jnp.sum(diff * diff, axis=-1)
    return (d2, idx) if want_idx else d2


def _q_chunked(fn, queries, q_chunk):
    """Map fn over query chunks to bound the [Q, T] tile size."""
    m = queries.shape[0]
    if m <= q_chunk:
        return fn(queries)
    pad = (-m) % q_chunk
    padded = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)], axis=0)
    chunks = padded.reshape(-1, q_chunk, 3)
    out = jax.lax.map(fn, chunks)
    out = jax.tree_util.tree_map(lambda a: a.reshape((-1,) + a.shape[2:])[:m], out)
    return out


@functools.partial(jax.jit, static_argnames=("t_chunk", "q_chunk",
                                              "rank_precision", "force_xla"))
def nearest_sqdist(queries, pct, t_chunk=_T_CHUNK, q_chunk=_Q_CHUNK,
                   rank_precision="highest", force_xla: bool = False):
    """Min squared distance from each query [M, 3] to the target cloud.

    force_xla=True pins the chunked XLA path regardless of backend — the
    independent reference for the real-device kernel gate
    (scripts/kernel_check.py); a distinct static arg keeps its cache
    entries separate from the production Pallas path."""
    queries = jnp.asarray(queries, jnp.float32).reshape(-1, 3)
    if use_pallas() and not force_xla:
        # Min-only kernel: skipping the argmin bookkeeping nearly
        # doubles throughput (pallas_nn._kernel_min).
        return pallas_nn.nn_min(
            queries, jnp.asarray(pct, jnp.float32),
            interpret=(jax.default_backend() != "tpu"))
    pct_p, _ = _pad_target(jnp.asarray(pct, jnp.float32), t_chunk)
    fn = lambda q: _chunked_min(q, pct_p, t_chunk, want_idx=False,
                                rank_precision=rank_precision)
    return _q_chunked(fn, queries, q_chunk)


@functools.partial(jax.jit, static_argnames=("t_chunk", "q_chunk", "rank_precision"))
def nearest_neighbor(queries, pct, t_chunk=_T_CHUNK, q_chunk=_Q_CHUNK,
                     rank_precision="highest"):
    """(min squared distance, argmin index) per query."""
    queries = jnp.asarray(queries, jnp.float32).reshape(-1, 3)
    if use_pallas():
        return _pallas_nn(queries, jnp.asarray(pct, jnp.float32))
    pct_p, _ = _pad_target(jnp.asarray(pct, jnp.float32), t_chunk)
    fn = lambda q: _chunked_min(q, pct_p, t_chunk, want_idx=True,
                                rank_precision=rank_precision)
    return _q_chunked(fn, queries, q_chunk)


def exact_sse(pct, pcs, R, t, trim_fraction: float = 0.0,
              t_chunk=_T_CHUNK, q_chunk=_Q_CHUNK):
    """Exact SSE of transformed source vs target: sum_i min_j ||R p_i + t - q_j||^2.

    Parity with Registration::compute_sse_error(R, t)
    (registration.cu:62-86).  With trim_fraction > 0, sums only the smallest
    (1 - trim_fraction) fraction of residuals (functional trimming; the
    reference parses `trim` but never implements it).
    """
    pcs = jnp.asarray(pcs, jnp.float32)
    q = jnp.dot(pcs, jnp.asarray(R, jnp.float32).T,
                precision=jax.lax.Precision.HIGHEST) + jnp.asarray(t, jnp.float32)
    d2 = nearest_sqdist(q, pct, t_chunk=t_chunk, q_chunk=q_chunk)
    if trim_fraction > 0.0:
        ns = d2.shape[0]
        keep = max(1, int(round(ns * (1.0 - trim_fraction))))
        d2 = jnp.sort(d2)[:keep]
    return jnp.sum(d2)
