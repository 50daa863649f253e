#!/usr/bin/env python
"""Cubes-evaluated/s scaling harness (BASELINE config 5).

Runs the pooled-sharded inner BnB over growing cube-axis meshes on a
fixed synthetic workload and reports nodes/s and scaling efficiency.
Run on a real pod slice for meaningful numbers:

    python scripts/scaling_bench.py                 # all local devices
    python scripts/scaling_bench.py --max-devices 4

On a CPU host with virtual devices (XLA_FLAGS=
--xla_force_host_platform_device_count=8) this validates the collective
code path, but the "devices" share physical cores, so efficiency numbers
are NOT representative — the harness prints a warning.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--max-devices", type=int, default=0,
                   help="limit the device count (0 = all)")
    p.add_argument("--groups", type=int, default=64,
                   help="rotation groups in the workload")
    p.add_argument("--ns", type=int, default=2048, help="source points")
    p.add_argument("--nt", type=int, default=8192, help="target points")
    p.add_argument("--lanes", type=int, default=512,
                   help="pool lanes per shard")
    p.add_argument("--proxy", type=int, default=4096, help="proxy points")
    p.add_argument("--max-steps", type=int, default=400)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from fgoicp_tpu.ops import bounds as bounds_ops
    from fgoicp_tpu.ops import geometry as geo
    from fgoicp_tpu.parallel import bnb as pbnb
    from fgoicp_tpu.parallel import sharding as psh

    devices = jax.devices()
    n_avail = len(devices)
    if args.max_devices:
        n_avail = min(n_avail, args.max_devices)
    if jax.default_backend() == "cpu":
        print("WARNING: CPU backend — virtual devices share physical "
              "cores; efficiency numbers are functional-validation only.",
              file=sys.stderr)

    rng = np.random.default_rng(0)
    pct = jnp.asarray(rng.uniform(-0.9, 0.9, (args.nt, 3)), jnp.float32)
    pcs = jnp.asarray(rng.uniform(-0.7, 0.7, (args.ns, 3)), jnp.float32)
    backend = bounds_ops.make_backend(pct, kind="proxy",
                                      proxy_size=args.proxy)
    g = args.groups
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (g, 3)), jnp.float32)
    R = geo.quat_cube_to_matrix(xyz)
    spans = jnp.full((g,), 0.25, jnp.float32)
    fix = jnp.asarray([True, False] * (g // 2))

    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    base_rate = None
    print(f"{'devices':>8} {'nodes':>10} {'wall_s':>8} {'nodes/s':>12} "
          f"{'efficiency':>10}")
    for n in counts:
        mesh = psh.make_mesh(n, 1, devices=devices[:n])

        def run():
            st = pbnb.bnb_r3_pooled_sharded(
                backend, pcs, R, spans, fix, jnp.float32(1e9),
                jnp.float32(1e-3), mesh=mesh, lanes=args.lanes,
                capacity=args.lanes * 16, max_steps=args.max_steps)
            jax.block_until_ready(st)
            return int(np.asarray(st.evaluated).sum())

        run()                      # compile + first-call load
        t0 = time.time()
        nodes = run()
        wall = time.time() - t0
        rate = nodes / wall
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(f"{n:>8} {nodes:>10} {wall:>8.2f} {rate:>12.0f} {eff:>9.1%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
