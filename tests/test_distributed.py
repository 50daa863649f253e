"""Multi-host outer BnB, simulated with thread hosts (identical protocol
semantics to the jax.distributed communicator)."""
import threading

import numpy as np
import pytest

from util import std_engine
from fgoicp_tpu.models.goicp import GoICP
from fgoicp_tpu.parallel import distributed as dist


def test_partition_root_covers_and_disjoint():
    for size in (1, 2, 3, 8, 9):
        parts = [dist.partition_root(r, size) for r in range(size)]
        cells = [c for p in parts for c in p]
        # Disjoint.
        assert len(cells) == len(set(cells))
        # Spans halve per split level; total volume equals the root cube
        # (span 1 half-span cube has volume 8).
        vol = sum((2 * c[3]) ** 3 for c in cells)
        np.testing.assert_allclose(vol, 8.0, rtol=1e-12)


def _surface_cloud(rng, n):
    s = rng.uniform(0.0, 4.5, size=(n,))  # open curve: no self-symmetry
    pts = np.stack([np.cos(s), 0.7 * np.sin(2.0 * s),
                    0.4 * np.sin(3.0 * s + 0.5)], axis=1)
    return (pts + rng.normal(scale=0.01, size=(n, 3))).astype(np.float32)


def _problem(seed=0, n=150, angle=2.1):
    rng = np.random.default_rng(seed)
    pct = _surface_cloud(rng, n)
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.array([0.2, -0.1, 0.15], np.float32)
    pcs = (pct[:100] - t) @ R
    return pct, pcs, R, t


@pytest.mark.parametrize("n_hosts", [2])
def test_multihost_matches_single_host(n_hosts):
    pct, pcs, R_true, t_true = _problem()
    eng = std_engine()

    single = GoICP(pct, pcs, mse_threshold=5e-4, engine=eng,
                   bound_backend="exact")
    single.run()

    comms = dist.ThreadCommunicator.create(n_hosts)
    models = [None] * n_hosts
    results = [None] * n_hosts
    errors = []

    def host(rank):
        try:
            m = dist.MultiHostGoICP(
                pct, pcs, comms[rank], mse_threshold=5e-4,
                engine=std_engine(),
                bound_backend="exact")
            models[rank] = m
            results[rank] = m.run()
        except Exception as e:  # pragma: no cover
            errors.append((rank, e))

    threads = [threading.Thread(target=host, args=(r,))
               for r in range(n_hosts)]
    for t_ in threads:
        t_.start()
    for t_ in threads:
        t_.join(timeout=600)
    assert not errors, errors
    assert all(r is not None for r in results)

    # Every host ends at the same global optimum as the single-host run.
    for m in models:
        assert m.best_sse <= single.best_sse * 1.01 + 1e-9
        assert m.mse < 5e-4
    for (R, t) in results:
        np.testing.assert_allclose(R, R_true, atol=2e-3)
        np.testing.assert_allclose(t, t_true, atol=2e-3)
    # The cube partition actually split the work.
    total_children = sum(m.stats.rotation_children for m in models)
    assert total_children > 0
    assert all(m.sync_rounds == models[0].sync_rounds for m in models)
