"""Shared test helpers: one standard engine config so every e2e test hits
the same jit cache entries (CPU compiles of the frontier/ICP loops are
the dominant suite cost)."""
from fgoicp_tpu.config import EngineConfig

STD_ENGINE = dict(
    rotation_batch=2,
    frontier_capacity=512,
    pool_lanes=256,
    pool_capacity=8192,
)


def test_engine(**overrides) -> EngineConfig:
    kw = dict(STD_ENGINE)
    kw.update(overrides)
    return EngineConfig(**kw)
