"""Decompose the pooled-step fixed cost on the real TPU.

Times each structural piece of pool_frontier.body in isolation inside a
fori_loop (forced value fetch — axon block_until_ready is unreliable):
  sort   : argsort over [CP + 8L] + 4 payload gathers (the merge/truncate)
  minlb  : one-hot [CP, G] group-min reduction
  onehot : [L, G] incumbent update reductions
  kernel : the fused Pallas lane kernel
  step   : one full bnb_r3_pooled step (non-converging synthetic pool)

    python scripts/step_decomp.py [--lanes 1024 --capacity 32768 --groups 256]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(fn, reps=5):
    import jax.numpy as jnp
    out = fn()
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--capacity", type=int, default=32768)
    ap.add_argument("--groups", type=int, default=256)
    ap.add_argument("--ns", type=int, default=1024)
    ap.add_argument("--proxy", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fgoicp_tpu.ops import bounds as bounds_ops
    from fgoicp_tpu.ops import geometry as geo
    from fgoicp_tpu.ops import pallas_bounds

    rng = np.random.default_rng(0)
    L, CP, G = args.lanes, args.capacity, args.groups
    N = CP + 8 * L
    it = args.iters

    keys = jnp.asarray(rng.uniform(0, 1, (N,)), jnp.float32)
    gid = jnp.asarray(rng.integers(0, G, (N,)), jnp.int32)
    cen = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
    spn = jnp.asarray(rng.uniform(0, 1, (N,)), jnp.float32)

    @jax.jit
    def sort_loop(keys, gid, cen, spn):
        def body(i, carry):
            k, g_, c, s = carry
            order = jnp.argsort(k)
            k2 = k[order]
            g2 = g_[order]
            c2 = c[order]
            s2 = s[order]
            # perturb so the loop isn't hoisted
            k2 = k2 + jnp.float32(1e-7) * i
            return (k2, g2, c2, s2)
        return jax.lax.fori_loop(0, it, body, (keys, gid, cen, spn))[0]

    @jax.jit
    def minlb_loop(keys, gid):
        grange = jnp.arange(G, dtype=jnp.int32)
        k = keys[:CP]
        g_ = gid[:CP]
        def body(i, acc):
            onehot = g_[:, None] == grange[None, :]
            m = jnp.min(jnp.where(onehot, (k + 1e-7 * i)[:, None], 1e30),
                        axis=0)
            return acc + m
        return jax.lax.fori_loop(0, it, body, jnp.zeros((G,), jnp.float32))

    @jax.jit
    def onehot_loop(keys, gid):
        grange = jnp.arange(G, dtype=jnp.int32)
        k = keys[:L]
        g_ = gid[:L]
        def body(i, acc):
            onehot = g_[:, None] == grange[None, :]
            grid = jnp.where(onehot, (k + 1e-7 * i)[:, None], 1e10)
            m = jnp.min(grid, axis=0)
            a = jnp.argmin(grid, axis=0)
            return acc + m + a.astype(jnp.float32)
        return jax.lax.fori_loop(0, it, body, jnp.zeros((G,), jnp.float32))

    t_sort = bench(lambda: sort_loop(keys, gid, cen, spn))
    t_minlb = bench(lambda: minlb_loop(keys, gid))
    t_onehot = bench(lambda: onehot_loop(keys, gid))
    print(f"sort+gathers [{N}]: {t_sort / it * 1e3:.2f} ms/step")
    print(f"group_minlb [{CP}x{G}]: {t_minlb / it * 1e3:.2f} ms/step")
    print(f"onehot inc [{L}x{G}]: {t_onehot / it * 1e3:.2f} ms/step")

    # kernel
    pct = jnp.asarray(rng.uniform(-0.9, 0.9, (17953, 3)), jnp.float32)
    pcs = jnp.asarray(rng.uniform(-0.7, 0.7, (args.ns, 3)), jnp.float32)
    backend = bounds_ops.make_backend(pct, kind="proxy",
                                      proxy_size=args.proxy)
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (G, 3)), jnp.float32)
    R = geo.quat_cube_to_matrix(xyz)
    spans = jnp.full((G,), 0.25, jnp.float32)
    fix = jnp.zeros((G,), bool)
    base = jnp.einsum("grc,nc->gnr", R, pcs,
                      precision=jax.lax.Precision.HIGHEST)
    norms = jnp.linalg.norm(pcs, axis=-1)
    gam_ub, gam_lb = bounds_ops.gamma_arrays(norms, spans, fix)
    slack = backend.coreset.eps
    gids_l = jnp.asarray(rng.integers(0, G, (L,)), jnp.int32)
    t_lanes = jnp.asarray(rng.uniform(-0.5, 0.5, (L, 3)), jnp.float32)
    gam_t = geo.translation_uncertainty_radius(jnp.full((L,), 0.25))

    @jax.jit
    def kernel_loop(t0):
        def body(i, t):
            lb, ub = pallas_bounds.fused_bounds_lanes(
                base, gids_l, t, backend.coreset.points, gam_ub, gam_t,
                slack, gam_lb=gam_lb, interpret=False)
            return t + 1e-7 * lb[:, None]
        return jax.lax.fori_loop(0, it, body, t0)

    t_kernel = bench(lambda: kernel_loop(t_lanes))
    print(f"kernel [{L}x{args.ns}x{args.proxy}]: "
          f"{t_kernel / it * 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
