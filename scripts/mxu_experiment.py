"""A/B: VPU direct-difference distance kernel vs MXU norm-expansion.

The bound kernel's inner op is a per-(query, proxy) squared distance
min-reduced over proxies (ops/pallas_bounds.py).  Two hardware mappings:

* VPU (shipped): d2 = (cx-qx)^2 + (cy-qy)^2 + (cz-qz)^2 — 9 f32
  ops/pair on the 8x128 vector unit, exact f32.
* MXU: d2 = |q|^2 + |c|^2 - 2 q.c with the cross term as a matmul
  (the reference-style norm expansion, SURVEY §7).  Two catches on TPU:
  (a) the contraction dim is 3 (xyz), so the 128x128 systolic array is
  at most 3/128 = 2.3% utilized — the op is rank-3 by nature and cannot
  be batched into a deeper contraction (packing points into k would sum
  cross terms of different points); (b) f32 matmul inputs round to bf16
  on the MXU (CLAUDE.md gotcha), so a single pass carries ~2^-8
  relative error in the cross term — unsound for certificates — and the
  double-bf16 hi/lo split (q = qh + ql, c = ch + cl; passes qh.ch +
  qh.cl + ql.ch) restores ~2^-16 accuracy at 3x the MXU passes.

This script MEASURES both (plus the unsound 1-pass bf16 ceiling) at
several source sizes on the real device, reporting wall time, effective
Top/s (9 ops/pair accounting), and max |d2 - exact_f32|.  Run:

    python scripts/mxu_experiment.py

Record the table in BASELINE.md whichever way it comes out (VERDICT r2
next-round #4).
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _min_d2(queries, prox, mode: str = "vpu", q_chunk: int = 2048):
    """Min squared distance per query against `prox` ([P, 3])."""
    import jax
    import jax.numpy as jnp

    prox = jnp.asarray(prox, jnp.float32)
    c2 = jnp.sum(prox * prox, axis=-1)                       # [P]
    ch = prox.astype(jnp.bfloat16)
    cl = (prox - ch.astype(jnp.float32)).astype(jnp.bfloat16)

    def chunk_fn(q):                                         # [C, 3]
        if mode == "vpu":
            dx = q[:, 0:1] - prox[None, :, 0]                # [C, P]
            dy = q[:, 1:2] - prox[None, :, 1]
            dz = q[:, 2:3] - prox[None, :, 2]
            d2 = dx * dx + dy * dy + dz * dz
            return jnp.min(d2, axis=-1)
        q2 = jnp.sum(q * q, axis=-1)                         # [C]
        if mode == "mxu_bf16":
            cross = jax.lax.dot_general(
                q.astype(jnp.bfloat16), ch.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode == "mxu_hilo":
            qh = q.astype(jnp.bfloat16)
            ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
            dot = lambda a, b: jax.lax.dot_general(
                a, b.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cross = dot(qh, ch) + (dot(qh, cl) + dot(ql, ch))
        else:
            raise ValueError(mode)
        d2 = q2[:, None] + c2[None, :] - 2.0 * cross
        return jnp.min(d2, axis=-1)

    n = queries.shape[0]
    pad = (-n) % q_chunk
    q = jnp.pad(jnp.asarray(queries, jnp.float32), [(0, pad), (0, 0)])
    out = jax.lax.map(chunk_fn, q.reshape(-1, q_chunk, 3))
    return out.reshape(-1)[:n]


def main():
    import jax
    import jax.numpy as jnp

    min_d2 = functools.partial(
        jax.jit(_min_d2, static_argnames=("mode", "q_chunk")))

    rng = np.random.default_rng(0)
    P = 4096
    prox = rng.uniform(-1, 1, size=(P, 3)).astype(np.float32)
    print(f"backend={jax.default_backend()} P={P}", flush=True)
    print(f"{'Q':>9} {'mode':>9} {'wall_ms':>8} {'Mq/s':>8} "
          f"{'Top/s(9op)':>10} {'max|d2 err|':>12}")

    sizes = (4_000_000,) if "--big-only" in sys.argv else (
        1_000_000, 4_000_000)
    for nq in sizes:
        q = rng.uniform(-1.2, 1.2, size=(nq, 3)).astype(np.float32)
        exact = None
        for mode in ("vpu", "mxu_hilo", "mxu_bf16"):
            fn = lambda: jax.block_until_ready(min_d2(q, prox, mode=mode))
            fn()  # compile + warm
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                out = fn()
            wall = (time.time() - t0) / reps
            out_np = np.asarray(out)
            if mode == "vpu":
                exact = out_np
                err = 0.0
            else:
                err = float(np.max(np.abs(out_np - exact)))
            mqs = nq / wall / 1e6
            tops = nq * P * 9 / wall / 1e12
            print(f"{nq:>9} {mode:>9} {wall * 1e3:>8.1f} {mqs:>8.1f} "
                  f"{tops:>10.2f} {err:>12.3e}", flush=True)


if __name__ == "__main__":
    main()
