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


def test_fused_lanes_trimmed_matches_xla_bracket():
    """The in-kernel trimmed drop-sum bracket must reproduce the XLA
    trimmed lane path (same bisection semantics) exactly."""
    from fgoicp_tpu.ops.pool_frontier import _eval_lanes_xla

    rng = np.random.default_rng(7)
    g, L, ns, p = 4, 16, 700, 300
    pcs = jnp.asarray(rng.uniform(-0.7, 0.7, size=(ns, 3)), jnp.float32)
    proxies = jnp.asarray(rng.uniform(-0.9, 0.9, size=(p, 3)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(-0.4, 0.4, size=(g, 3)), jnp.float32)
    R = geo.quat_cube_to_matrix(xyz)
    rot_spans = jnp.asarray(rng.uniform(0.05, 0.4, size=(g,)), jnp.float32)
    fix = jnp.asarray([True, False, True, False])
    slack = jnp.float32(0.03)
    backend = bounds_ops.ProxyBackend(
        coreset=bounds_ops.coreset_ops.ProxyCoreset(
            points=proxies, eps=slack))
    base = jnp.einsum("grc,nc->gnr", R, pcs,
                      precision=jax.lax.Precision.HIGHEST)
    norms = jnp.linalg.norm(pcs, axis=-1)
    gam_ub, gam_lb = bounds_ops.gamma_arrays(norms, rot_spans, fix)
    gids = jnp.asarray(rng.integers(0, g, size=(L,)), jnp.int32)
    t_lanes = jnp.asarray(rng.uniform(-0.4, 0.4, size=(L, 3)), jnp.float32)
    gam_t = geo.translation_uncertainty_radius(
        jnp.asarray(rng.uniform(0.05, 0.3, size=(L,)), jnp.float32))
    for trim_keep in (ns - 1, int(0.7 * ns), ns // 3):
        lb_k, ub_k = pallas_bounds.fused_bounds_lanes_trimmed(
            base, gids, t_lanes, proxies, gam_ub, gam_t, slack,
            n_drop=ns - trim_keep, gam_lb=gam_lb,
            interpret=(jax.default_backend() != "tpu"))
        lb_x, ub_x = _eval_lanes_xla(backend, base, gids, t_lanes, gam_ub,
                                     gam_lb, gam_t, None, trim_keep)
        np.testing.assert_allclose(np.asarray(ub_k), np.asarray(ub_x),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(lb_k), np.asarray(lb_x),
                                   rtol=2e-4, atol=2e-5)
        # Trimmed bounds must bracket: lb <= ub lane-wise.
        assert bool(jnp.all(lb_k <= ub_k + 1e-5))


def test_fused_lanes_trimmed_weight_mask():
    """0/1 padding weights: trimmed kernel == XLA path on the real lanes
    (trim_ns = real count)."""
    from fgoicp_tpu.ops.pool_frontier import _eval_lanes_xla

    rng = np.random.default_rng(8)
    g, L, ns_real, pad, p = 3, 8, 500, 140, 256
    ns = ns_real + pad
    pcs = jnp.asarray(rng.uniform(-0.7, 0.7, size=(ns, 3)), jnp.float32)
    w = jnp.ones((ns,), jnp.float32).at[ns_real:].set(0.0)
    proxies = jnp.asarray(rng.uniform(-0.9, 0.9, size=(p, 3)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(-0.4, 0.4, size=(g, 3)), jnp.float32)
    R = geo.quat_cube_to_matrix(xyz)
    rot_spans = jnp.asarray(rng.uniform(0.05, 0.4, size=(g,)), jnp.float32)
    fix = jnp.asarray([True, False, True])
    slack = jnp.float32(0.02)
    backend = bounds_ops.ProxyBackend(
        coreset=bounds_ops.coreset_ops.ProxyCoreset(
            points=proxies, eps=slack))
    base = jnp.einsum("grc,nc->gnr", R, pcs,
                      precision=jax.lax.Precision.HIGHEST)
    norms = jnp.linalg.norm(pcs, axis=-1)
    gam_ub, gam_lb = bounds_ops.gamma_arrays(norms, rot_spans, fix)
    gids = jnp.asarray(rng.integers(0, g, size=(L,)), jnp.int32)
    t_lanes = jnp.asarray(rng.uniform(-0.4, 0.4, size=(L, 3)), jnp.float32)
    gam_t = geo.translation_uncertainty_radius(
        jnp.asarray(rng.uniform(0.05, 0.3, size=(L,)), jnp.float32))
    trim_keep = 350
    lb_k, ub_k = pallas_bounds.fused_bounds_lanes_trimmed(
        base, gids, t_lanes, proxies, gam_ub, gam_t, slack,
        n_drop=ns_real - trim_keep, point_weights=w, gam_lb=gam_lb,
        interpret=(jax.default_backend() != "tpu"))
    lb_x, ub_x = _eval_lanes_xla(backend, base, gids, t_lanes, gam_ub,
                                 gam_lb, gam_t, w, trim_keep,
                                 trim_ns=ns_real)
    np.testing.assert_allclose(np.asarray(ub_k), np.asarray(ub_x),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lb_k), np.asarray(lb_x),
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
