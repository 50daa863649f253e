"""Tests for the 3D distance field (ops/distance_field.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fgoicp_tpu.ops import distance_field as df
from fgoicp_tpu.ops import nn as nn_ops


def _bounds(pts):
    return np.stack([pts.min(0), pts.max(0)], axis=-1)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    return rng.uniform(-0.5, 0.5, size=(200, 3)).astype(np.float32)


class TestBuilders:
    def test_brute_matches_exact_nn(self, cloud):
        field = df.build(cloud, _bounds(cloud), 0.1, builder="brute")
        x, y, z = field.dims
        # Check a sample of grid nodes against exact NN.
        samples = [(0, 0, 0), (x - 1, y - 1, z - 1),
                   (x // 2, y // 2, z // 2), (1, y // 3, z // 4)]
        nodes = np.asarray(
            [np.asarray(field.origin) + np.array(ijk) * 0.1 for ijk in samples],
            np.float32)
        expect = np.sqrt(np.asarray(
            nn_ops.nearest_sqdist(jnp.asarray(nodes), jnp.asarray(cloud))))
        got = np.asarray([field.values[ijk] for ijk in samples])
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_edt_within_slack_of_brute(self, cloud):
        res = 0.05
        fb = df.build(cloud, _bounds(cloud), res, builder="brute")
        fe = df.build(cloud, _bounds(cloud), res, builder="edt")
        assert fb.values.shape == fe.values.shape
        err = np.abs(np.asarray(fb.values) - np.asarray(fe.values))
        assert float(fe.slack) == pytest.approx(np.sqrt(1.5) * res)
        assert err.max() <= float(fe.slack) + 1e-5

    def test_edt_zero_at_seeded_nodes(self):
        # Points exactly on grid nodes -> distance 0 there.
        pts = np.array([[0.0, 0.0, 0.0], [0.2, 0.2, 0.2]], np.float32)
        bounds = np.array([[0, 0.2], [0, 0.2], [0, 0.2]], np.float64)
        field = df.build(pts, bounds, 0.1, builder="edt")
        assert float(field.values[0, 0, 0]) == pytest.approx(0.0, abs=1e-6)
        assert float(field.values[2, 2, 2]) == pytest.approx(0.0, abs=1e-6)
        # A node one cell away along an axis: distance = res.
        assert float(field.values[1, 0, 0]) == pytest.approx(0.1, abs=1e-5)

    def test_dims_and_limits(self):
        bounds = np.array([[0, 1.0], [0, 0.5], [0, 0.25]], np.float64)
        assert df.grid_dims(bounds, 0.1) == (11, 6, 4)
        with pytest.raises(ValueError, match="exceed the limit"):
            df.grid_dims(bounds, 1e-5)


class TestLookup:
    def test_at_grid_nodes(self, cloud):
        field = df.build(cloud, _bounds(cloud), 0.1, builder="brute")
        x, y, z = field.dims
        idx = np.array([[0, 0, 0], [x - 1, y - 1, z - 1], [1, 2, 3]])
        q = np.asarray(field.origin) + idx * 0.1
        got = np.asarray(df.lookup(field, jnp.asarray(q, jnp.float32)))
        expect = [float(field.values[tuple(i)]) for i in idx]
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_interpolates_between_nodes(self):
        pts = np.array([[0.0, 0.0, 0.0]], np.float32)
        bounds = np.array([[0, 0.4], [0, 0.4], [0, 0.4]], np.float64)
        field = df.build(pts, bounds, 0.1, builder="brute")
        # Halfway along +x between nodes 1 and 2: lerp of 0.1 and 0.2.
        q = jnp.asarray([[0.15, 0.0, 0.0]])
        got = float(df.lookup(field, q)[0])
        assert got == pytest.approx(0.15, abs=1e-5)

    def test_out_of_box_clamps_to_border(self, cloud):
        field = df.build(cloud, _bounds(cloud), 0.1, builder="brute")
        far = jnp.asarray([[100.0, 100.0, 100.0]])
        corner = np.asarray(field.origin) + (np.array(field.dims) - 1) * 0.1
        got = float(df.lookup(field, far)[0])
        expect = float(df.lookup(field, jnp.asarray(corner)[None])[0])
        assert got == pytest.approx(expect, abs=1e-5)

    def test_lookup_close_to_true_distance(self, cloud):
        # Random queries: trilinear lookup within O(res) of the exact NN.
        res = 0.05
        field = df.build(cloud, _bounds(cloud), res, builder="brute")
        rng = np.random.default_rng(1)
        q = rng.uniform(-0.45, 0.45, size=(128, 3)).astype(np.float32)
        got = np.asarray(df.lookup(field, jnp.asarray(q)))
        true = np.sqrt(np.asarray(nn_ops.nearest_sqdist(jnp.asarray(q), jnp.asarray(cloud))))
        assert np.abs(got - true).max() <= np.sqrt(3) * res

    def test_batched_shapes(self, cloud):
        field = df.build(cloud, _bounds(cloud), 0.1, builder="brute")
        q = jnp.zeros((4, 5, 3))
        out = df.lookup(field, q)
        assert out.shape == (4, 5)
