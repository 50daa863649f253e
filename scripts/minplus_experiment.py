"""A/B: Pallas tiled min-plus kernel vs the XLA chunked form (EDT build).

The separable exact-EDT distance-field builder spends its time in the
1D parabolic min-plus transform (distance_field._minplus_1d).  This
script measures the hand-tiled Pallas kernel (ops/pallas_minplus.py)
against the chunked XLA composition at both a block-aligned synthetic
shape and the real production bunny field build, and checks equality on
the device.

Recorded result (v5e, BASELINE.md round-3 ledger): at the block-aligned
synthetic shape the kernel edges XLA by ~10% (1.20 s vs 1.33 s at
[262144, 1024]); at the REAL res-0.002 bunny build it loses 2x (10.6 s
vs 4.9 s) — the kernel pads n (741/946/960) up to its 512-wide j-blocks
and spends ~3 vreg-ops per element (sublane->lane broadcast + add +
min) where XLA's fused broadcast+reduce lowering achieves ~2.  The XLA
form is therefore the production path; the kernel stays as a measured
negative result (like the MXU norm-expansion experiment,
scripts/mxu_experiment.py).

    python scripts/minplus_experiment.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, reps=3):
    import jax
    import jax.numpy as jnp
    s = float(jnp.sum(fn()))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        s = float(jnp.sum(fn()))
        best = min(best, time.time() - t0)
    return best, s


def main():
    import jax
    import jax.numpy as jnp

    from fgoicp_tpu.ops import distance_field as df
    from fgoicp_tpu.ops import pallas_minplus

    rng = np.random.default_rng(0)
    interp = jax.default_backend() != "tpu"
    if interp:
        print("non-TPU backend: Pallas runs in interpret mode "
              "(functional check only; timings are meaningless)")

    # Equality on the real device.
    g_small = jnp.asarray(rng.uniform(0, 4.0, (2048, 1000)), jnp.float32)
    res = 0.002
    got = np.asarray(pallas_minplus.minplus_1d(g_small, res,
                                               interpret=interp))
    j = np.arange(1000, dtype=np.float64)
    ref = np.min(np.asarray(g_small, np.float64)[:, :, None]
                 + ((j[None, :, None] - j[None, None, :]) * res) ** 2,
                 axis=1)
    err = np.abs(got - ref).max()
    print(f"equality vs f64 reference: max err {err:.2e}")
    assert err < 1e-4

    # Throughput at a block-aligned shape.
    L, n = 262144, 1024
    g = jnp.asarray(rng.uniform(0, 4.0, (L, n)), jnp.float32)
    ops = 2 * L * n * n
    w_p, _ = timeit(lambda: pallas_minplus.minplus_1d(g, res,
                                                      interpret=interp))
    w_x, _ = timeit(lambda: df._minplus_1d(g, res))
    print(f"[{L} x {n}] pallas: {w_p*1e3:.0f} ms ({ops/w_p/1e12:.2f} Top/s)"
          f"   xla: {w_x*1e3:.0f} ms ({ops/w_x/1e12:.2f} Top/s)")

    # Production bunny field build (end to end, both paths).
    import os
    from fgoicp_tpu.io import load_cloud
    from fgoicp_tpu.ops import geometry as geo
    path = "/root/reference/data/bunny/model_bunny.txt"
    if not os.path.exists(path):
        print("bunny data missing; skipping the production build A/B")
        return
    pct = load_cloud(path, 0.5, seed=0)
    pcs = load_cloud("/root/reference/data/bunny/data_bunny.txt", 0.1,
                     seed=1)
    norm = geo.Normalization(pct, pcs)
    bounds = np.asarray(norm.target_bounds)

    import fgoicp_tpu.ops.distance_field as dfm

    for tag, flag in (("xla", False), ("pallas", True)):
        orig = dfm._use_pallas_minplus
        dfm._use_pallas_minplus = lambda: flag
        jax.clear_caches()
        try:
            walls = []
            for _ in range(2):
                t0 = time.time()
                f = df.build(np.asarray(norm.pct), bounds, 0.002,
                             builder="edt")
                jax.block_until_ready(f.values)
                walls.append(time.time() - t0)
            print(f"bunny res-0.002 build [{tag}]: steady {walls[-1]:.2f} s"
                  f" (cold {walls[0]:.2f} s), dims {f.dims}")
        finally:
            dfm._use_pallas_minplus = orig


if __name__ == "__main__":
    main()
