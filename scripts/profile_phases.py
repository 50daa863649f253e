"""Phase-level wall-clock breakdown of a GoICP run (perf tuning aid).

Wraps the engine's private phases with timers and prints where the
steady-state seconds go: initial ICP, inner-BnB device calls, triggered
ICPs, host bookkeeping, final ICP.  Run on the TPU:

    python scripts/profile_phases.py [--config configs/bunny.toml]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(model):
    """Monkey-patch timers around the engine phases."""
    acc = {"initial_icp": 0.0, "inner_bnb": 0.0, "refine_icp": 0.0,
           "final_icp": 0.0, "spawn": 0.0, "prep": 0.0}
    counts = {"inner_calls": 0, "refine_calls": 0}

    def wrap(name, fn, count_key=None):
        def inner(*a, **kw):
            t0 = time.time()
            out = fn(*a, **kw)
            acc[name] += time.time() - t0
            if count_key:
                counts[count_key] += 1
            return out
        return inner

    model._initial_icp = wrap("initial_icp", model._initial_icp)
    model._evaluate_children = wrap("inner_bnb", model._evaluate_children,
                                    "inner_calls")
    model._refine_candidates = wrap("refine_icp", model._refine_candidates,
                                    "refine_calls")
    model._final_icp = wrap("final_icp", model._final_icp)
    model._spawn_children = wrap("spawn", model._spawn_children)
    return acc, counts


def load_workload(name):
    """(pct, pcs, mse_threshold, trim_fraction) for a bench workload."""
    from fgoicp_tpu.io import load_cloud
    data = "/root/reference/data"
    if name == "bunny":
        return (load_cloud(f"{data}/bunny/model_bunny.txt", 0.5, seed=0),
                load_cloud(f"{data}/bunny/data_bunny.txt", 0.1, seed=1),
                1e-3, 0.0)
    if name == "scan_pair":  # bench.py bunny_scans_000_045_trimmed
        return (load_cloud(f"{data}/bunny/bun000.ply", 0.5, seed=0),
                load_cloud(f"{data}/bunny/bun045.ply", 0.25, seed=1),
                1e-4, 0.3)
    if name == "dragon":     # bench.py dragon_trimmed
        return (load_cloud(f"{data}/dragon/dragonClearSpace2_0.ply", 0.1,
                           seed=0),
                load_cloud(f"{data}/dragon/dragonToes3_0.ply", 0.05, seed=1),
                1e-3, 0.3)
    raise SystemExit(f"unknown workload {name!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="bunny",
                    choices=("bunny", "scan_pair", "dragon"))
    ap.add_argument("--source-coreset", type=int, default=0)
    ap.add_argument("--pool-lanes", type=int, default=1024)
    ap.add_argument("--proxy-size", type=int, default=4096)
    ap.add_argument("--rotation-batch", type=int, default=16)
    ap.add_argument("--icp-max-iter", type=int, default=100)
    ap.add_argument("--icp-width", type=int, default=16)  # engine default
    ap.add_argument("--pool-capacity", type=int, default=32768)
    ap.add_argument("--no-multi-start", action="store_true")
    ap.add_argument("--icp-search-subsample", type=int, default=2048)
    ap.add_argument("--pool-update", default="sort",
                    choices=("sort", "merge"))
    ap.add_argument("--outer-mode", default="host",
                    choices=("host", "device"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from fgoicp_tpu.config import EngineConfig
    from fgoicp_tpu.models.goicp import GoICP

    pct, pcs, mse, trim = load_workload(args.workload)

    eng = EngineConfig(source_coreset=args.source_coreset,
                       pool_lanes=args.pool_lanes,
                       rotation_batch=args.rotation_batch,
                       icp_max_iter=args.icp_max_iter,
                       icp_width=args.icp_width,
                       pool_capacity=args.pool_capacity,
                       icp_search_subsample=args.icp_search_subsample,
                       pool_update=args.pool_update,
                       outer_mode=args.outer_mode,
                       icp_multi_start=not args.no_multi_start)
    for run in range(args.runs):
        model = GoICP(pct, pcs, mse_threshold=mse, engine=eng,
                      proxy_size=args.proxy_size, trim_fraction=trim)
        acc, counts = timed(model)
        t0 = time.time()
        model.run()
        wall = time.time() - t0
        other = wall - sum(acc.values())
        out = {"run": run, "wall_s": round(wall, 3),
               "mse": float(model.mse), "sse": float(model.best_sse),
               "nodes": model.stats.translation_nodes,
               "inner_steps": model.stats.inner_loop_steps,
               "dropped": model.stats.dropped_nodes,
               "outer_steps": model.stats.outer_steps,
               "icp_runs": model.stats.icp_runs,
               "phases_s": {k: round(v, 3) for k, v in acc.items()},
               "other_s": round(other, 3), **counts}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
