"""Pallas NN kernel vs the XLA streaming path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from fgoicp_tpu.ops import nn as nn_ops
from fgoicp_tpu.ops import pallas_nn


def test_nn_argmin_matches_xla():
    rng = np.random.default_rng(0)
    queries = jnp.asarray(rng.uniform(-1, 1, size=(733, 3)), jnp.float32)
    points = jnp.asarray(rng.uniform(-1, 1, size=(517, 3)), jnp.float32)
    interp = jax.default_backend() != "tpu"
    d2_k, idx_k = pallas_nn.nn_argmin(queries, points, interpret=interp)
    d2_ref, idx_ref = nn_ops.nearest_neighbor(
        queries, points)  # XLA path (use_pallas() is False on CPU)
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_ref))
    # Kernel d2 uses the norm expansion; rescore like the production path.
    diff = queries - points[idx_k]
    d2_rescored = jnp.sum(diff * diff, axis=-1)
    np.testing.assert_allclose(np.asarray(d2_rescored), np.asarray(d2_ref),
                               rtol=1e-6, atol=1e-9)


def test_nn_argmin_exact_on_grid():
    # Queries exactly on target points: d2 == 0, idx == identity.
    pts = jnp.asarray(np.mgrid[0:4, 0:4, 0:4].reshape(3, -1).T, jnp.float32)
    interp = jax.default_backend() != "tpu"
    d2, idx = pallas_nn.nn_argmin(pts, pts, interpret=interp)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(len(pts)))
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-5)
