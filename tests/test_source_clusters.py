"""Weighted source-cluster bounds: validity against the true SSE."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from util import std_engine
from fgoicp_tpu.models.goicp import GoICP
from fgoicp_tpu.ops import bounds as bounds_ops
from fgoicp_tpu.ops import coreset as coreset_ops
from fgoicp_tpu.ops import geometry as geo
from fgoicp_tpu.ops import nn as nn_ops


def _cloud(rng, n):
    s = rng.uniform(0.0, 4.5, size=(n,))
    pts = np.stack([np.cos(s), 0.7 * np.sin(2 * s),
                    0.4 * np.sin(3 * s + 0.5)], axis=1)
    return (pts + rng.normal(scale=0.01, size=(n, 3))).astype(np.float32)


def test_build_weighted_partitions():
    rng = np.random.default_rng(0)
    pts = _cloud(rng, 500)
    cl = coreset_ops.build_weighted(pts, size=64, seed=1)
    assert cl.reps.shape == (64, 3)
    np.testing.assert_allclose(float(jnp.sum(cl.weights)), 500.0)
    # Every point is within its cluster radius of some representative.
    d2, idx = nn_ops.nearest_neighbor(pts, cl.reps)
    d = np.sqrt(np.asarray(d2))
    assert np.all(d <= np.asarray(cl.deltas)[np.asarray(idx)] + 1e-6)


def test_cluster_bounds_bracket_true_sse():
    """Cluster lb <= min SSE over the node region; cluster ub >= SSE at
    the node center — checked against dense random samples in-region."""
    rng = np.random.default_rng(1)
    pct = _cloud(rng, 300)
    pcs = _cloud(rng, 220)
    backend = bounds_ops.make_backend(pct, kind="exact")
    cl = coreset_ops.build_weighted(pcs, size=48, seed=2)

    g = 4
    xyz = rng.uniform(-0.4, 0.4, size=(g, 3)).astype(np.float32)
    spans = np.full((g,), 0.15, np.float32)
    tc = rng.uniform(-0.3, 0.3, size=(g, 1, 3)).astype(np.float32)
    ts = np.full((g, 1), 0.1, np.float32)
    R = geo.quat_cube_to_matrix(jnp.asarray(xyz))
    # Half the groups fixed-rotation (the reference's ub pass), half
    # gamma-relaxed (the lb pass).
    fix = jnp.asarray([True, True, False, False])

    lb, ub = bounds_ops.evaluate_bounds(
        backend, cl.reps, R, jnp.asarray(spans), fix, jnp.asarray(tc),
        jnp.asarray(ts), point_weights=cl.weights, point_deltas=cl.deltas)
    lb = np.asarray(lb)[:, 0]
    ub = np.asarray(ub)[:, 0]

    def per_point_d(xyz_r, t_vec):
        Rm = geo.quat_cube_to_matrix(jnp.asarray(xyz_r, jnp.float32))
        q = jnp.asarray(pcs) @ Rm.T + jnp.asarray(t_vec, jnp.float32)
        return np.sqrt(np.maximum(
            np.asarray(nn_ops.nearest_sqdist(q, pct)), 0.0))

    norms = np.linalg.norm(pcs, axis=1)
    for k in range(g):
        d_center = per_point_d(xyz[k], tc[k, 0])
        if bool(fix[k]):
            # Fixed rotation: ub >= exact SSE at the center transform.
            center_sse = float(np.sum(d_center ** 2))
            assert ub[k] >= center_sse * (1 - 1e-4) - 1e-3, \
                f"group {k}: ub {ub[k]} < center SSE {center_sse}"
        else:
            # Relaxed: ub >= the per-point gamma-relaxed objective.
            gam = np.asarray(geo.rotation_uncertainty_radius(
                jnp.asarray(norms), jnp.float32(spans[k])))
            relaxed = float(np.sum(np.maximum(d_center - gam, 0.0) ** 2))
            assert ub[k] >= relaxed * (1 - 1e-4) - 1e-3, \
                f"group {k}: ub {ub[k]} < relaxed objective {relaxed}"
        # lb <= SSE everywhere in the region (sampled).  Fixed-rotation
        # groups only cover the translation region (gamma_r = 0).
        for _ in range(6):
            dt = rng.uniform(-ts[k, 0], ts[k, 0], size=3)
            if bool(fix[k]):
                v = xyz[k]
            else:
                dx = rng.uniform(-spans[k], spans[k], size=3)
                v = np.clip(xyz[k] + dx, -0.999, 0.999)
                if np.sum(v * v) > 1.0:
                    v = v / np.linalg.norm(v) * 0.999
            s = float(np.sum(per_point_d(v, tc[k, 0] + dt) ** 2))
            assert lb[k] <= s + 1e-3 + 1e-4 * s, \
                f"group {k}: lb {lb[k]} > sampled SSE {s}"


def test_goicp_with_source_coreset_recovers():
    rng = np.random.default_rng(3)
    pct = _cloud(rng, 400)
    ang = 2.0
    c, s = np.cos(ang), np.sin(ang)
    R_true = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t_true = np.array([0.2, -0.1, 0.15], np.float32)
    pcs = (pct[:300] - t_true) @ R_true
    m = GoICP(pct, pcs, mse_threshold=5e-4,
              engine=std_engine(source_coreset=96))
    assert m.src_clusters is not None
    R, t = m.run()
    np.testing.assert_allclose(R, R_true, atol=2e-3)
    np.testing.assert_allclose(t, t_true, atol=2e-3)
