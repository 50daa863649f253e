"""Micro-benchmark: pooled-frontier step cost vs bare kernel cost.

Times (a) the fused lane kernel alone in a fori_loop and (b) full
bnb_r3_pooled steps on an always-full synthetic pool (huge incumbent, no
pruning), via finite differences on max_steps.  The gap is the per-step
scheduler overhead (sort/merge/gathers/one-hots).

    python scripts/micro_step.py [--lanes 1024 --ns 1024 --proxy 4096]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _force(out):
    """Force a VALUE fetch: jax.block_until_ready does not reliably
    block through the axon tunnel (CLAUDE.md) — timings based on it
    under-report by the unflushed tail of the async queue."""
    import jax
    leaves = jax.tree.leaves(out)
    import numpy as np_
    return float(np_.asarray(leaves[0]).ravel()[0])


def timeit(fn, *args, reps=3):
    _force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _force(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--ns", type=int, default=1024)
    ap.add_argument("--nt", type=int, default=17953)
    ap.add_argument("--proxy", type=int, default=4096)
    ap.add_argument("--groups", type=int, default=256)
    ap.add_argument("--capacity", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--pool-update", default="sort",
                    choices=("sort", "merge"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fgoicp_tpu.ops import bounds as bounds_ops
    from fgoicp_tpu.ops import geometry as geo
    from fgoicp_tpu.ops import pallas_bounds
    from fgoicp_tpu.ops import pool_frontier

    rng = np.random.default_rng(0)
    pct = jnp.asarray(rng.uniform(-0.9, 0.9, (args.nt, 3)), jnp.float32)
    pcs = jnp.asarray(rng.uniform(-0.7, 0.7, (args.ns, 3)), jnp.float32)
    backend = bounds_ops.make_backend(pct, kind="proxy",
                                      proxy_size=args.proxy)
    g = args.groups
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (g, 3)), jnp.float32)
    R = geo.quat_cube_to_matrix(xyz)
    spans = jnp.full((g,), 0.25, jnp.float32)
    fix = jnp.zeros((g,), bool)

    # (a) bare kernel, L lanes per iteration.
    base = jnp.einsum("grc,nc->gnr", R, pcs,
                      precision=jax.lax.Precision.HIGHEST)
    norms = jnp.linalg.norm(pcs, axis=-1)
    gam_ub, gam_lb = bounds_ops.gamma_arrays(norms, spans, fix)
    slack = backend.coreset.eps
    gids = jnp.asarray(rng.integers(0, g, (args.lanes,)), jnp.int32)
    t_lanes = jnp.asarray(rng.uniform(-0.5, 0.5, (args.lanes, 3)),
                          jnp.float32)
    gam_t = geo.translation_uncertainty_radius(
        jnp.full((args.lanes,), 0.25))

    @jax.jit
    def kernel_loop(n, t0):
        def body(_, carry):
            lb, ub = pallas_bounds.fused_bounds_lanes(
                base, gids, carry[:, :3] * 0.999, backend.coreset.points,
                gam_ub, gam_t, slack, gam_lb=gam_lb)
            return carry * 0.9999 + lb[:, None] * 0.0
        return jax.lax.fori_loop(0, n, body, t0)

    w = timeit(kernel_loop, args.steps, t_lanes)
    w2 = timeit(kernel_loop, 2 * args.steps, t_lanes)
    per_kernel = (w2 - w) / args.steps
    print(f"kernel/step: {per_kernel * 1e3:.2f} ms "
          f"({per_kernel / args.lanes * 1e6:.1f} us/lane)")

    # (b) full pooled steps, pruning disabled by a huge incumbent and a
    # tiny min_span (children always spawn until max_steps).
    def pooled(ms):
        # min_span=0 + sse_threshold=-1 disable the USUAL exits, but the
        # pool still drains around step ~50: spans halve every
        # generation, groups converge EXACTLY (lb == ub == best_err),
        # every child is dominated, and emptied groups deactivate.  The
        # finite difference must therefore stay BELOW the drain point —
        # the original 40-vs-80 difference only measured 11 live steps
        # and under-reported the per-step cost ~4x.
        return pool_frontier.bnb_r3_pooled(
            backend, pcs, R, spans, fix, jnp.float32(1e12),
            jnp.float32(-1.0), min_span=0.0, lanes=args.lanes,
            capacity=args.capacity, max_steps=ms,
            pool_update=args.pool_update)

    lo, hi = args.steps, 2 * args.steps
    ran = int(pooled(hi).steps)
    if ran <= lo:
        raise SystemExit(
            f"pool drains at step {ran} <= --steps {lo}: the finite "
            f"difference would measure nothing — pass --steps <= "
            f"{max(1, ran // 2)}")
    if ran < hi:
        print(f"WARNING: pool drains at step {ran} < {hi}; pass "
              f"--steps <= {max(1, ran // 2)} for a clean difference",
              file=sys.stderr)
    w = timeit(pooled, lo)
    w2 = timeit(pooled, hi)
    per_step = (w2 - w) / (min(ran, hi) - lo)
    print(f"pooled/step: {per_step * 1e3:.2f} ms -> scheduler overhead "
          f"{(per_step - per_kernel) * 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
