"""Fused Pallas bounds kernel vs the XLA reference path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgoicp_tpu.ops import bounds as bounds_ops
from fgoicp_tpu.ops import geometry as geo
from fgoicp_tpu.ops import pallas_bounds


def _case(seed=0, g=3, b=5, ns=700, p=300):
    rng = np.random.default_rng(seed)
    pcs = jnp.asarray(rng.uniform(-0.7, 0.7, size=(ns, 3)), jnp.float32)
    proxies = jnp.asarray(rng.uniform(-0.9, 0.9, size=(p, 3)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(-0.4, 0.4, size=(g, 3)), jnp.float32)
    R = geo.quat_cube_to_matrix(xyz)
    rot_spans = jnp.asarray(rng.uniform(0.05, 0.4, size=(g,)), jnp.float32)
    fix = jnp.asarray([True, False, True][:g])
    tc = jnp.asarray(rng.uniform(-0.5, 0.5, size=(g, b, 3)), jnp.float32)
    ts = jnp.asarray(rng.uniform(0.05, 0.3, size=(g, b)), jnp.float32)
    return pcs, proxies, R, rot_spans, fix, tc, ts


def _xla_reference(pcs, proxies, R, rot_spans, fix, tc, ts, slack):
    backend = bounds_ops.ProxyBackend(
        coreset=bounds_ops.coreset_ops.ProxyCoreset(
            points=proxies, eps=jnp.float32(slack)))
    return bounds_ops.evaluate_bounds(
        backend, pcs, R, rot_spans, fix, tc, ts)


def test_fused_matches_xla_path():
    pcs, proxies, R, rot_spans, fix, tc, ts = _case()
    slack = 0.03
    lb_ref, ub_ref = _xla_reference(pcs, proxies, R, rot_spans, fix, tc, ts,
                                    slack)
    norms = jnp.linalg.norm(pcs, axis=-1)
    gam_r = geo.rotation_uncertainty_radius(norms[None, :],
                                            rot_spans[:, None])
    gam_r = jnp.where(fix[:, None], 0.0, gam_r)
    gam_t = geo.translation_uncertainty_radius(ts)
    base = jnp.einsum("grc,nc->gnr", R, pcs,
                      precision=jax.lax.Precision.HIGHEST)
    lb, ub = pallas_bounds.fused_bounds(
        base, tc, proxies, gam_r, gam_t, jnp.float32(slack),
        interpret=(jax.default_backend() != "tpu"))
    np.testing.assert_allclose(np.asarray(ub), np.asarray(ub_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lb_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_point_weights_mask_padding():
    pcs, proxies, R, rot_spans, fix, tc, ts = _case(seed=1, ns=600)
    # Zero-weight the last 100 points; reference drops them entirely.
    w = jnp.ones((600,), jnp.float32).at[500:].set(0.0)
    lb_ref, ub_ref = _xla_reference(pcs[:500], proxies, R, rot_spans, fix,
                                    tc, ts, 0.01)
    norms = jnp.linalg.norm(pcs, axis=-1)
    gam_r = jnp.where(
        fix[:, None], 0.0,
        geo.rotation_uncertainty_radius(norms[None, :], rot_spans[:, None]))
    gam_t = geo.translation_uncertainty_radius(ts)
    base = jnp.einsum("grc,nc->gnr", R, pcs,
                      precision=jax.lax.Precision.HIGHEST)
    lb, ub = pallas_bounds.fused_bounds(
        base, tc, proxies, gam_r, gam_t, jnp.float32(0.01), point_weights=w,
        interpret=(jax.default_backend() != "tpu"))
    np.testing.assert_allclose(np.asarray(ub), np.asarray(ub_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lb_ref),
                               rtol=2e-4, atol=2e-5)
