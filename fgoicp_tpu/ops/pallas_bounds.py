"""Fused Pallas TPU kernel for batched SE(3) bound evaluation.

Replaces the XLA composition in ops/bounds.py (rotate -> add translation
-> NN distance -> uncertainty radii -> relu^2 -> sum) for the proxy/exact
backends.  The XLA path materializes the [G, B, ns, 3] query tensor and
streams tiny [8192, 3] @ [3, 2048] matmuls through sequential lax.map /
lax.scan stages — measured latency-bound at ~7k node evaluations/s on
v5e.  This kernel keeps everything in VMEM:

  for each (rotation g, translation b, source tile n):   <- grid
      q   = base[g, :, n-tile] + t[g, b]                 [3, NT]
      for each proxy tile p (static loop):
          d2 = (cx - qx)^2 + (cy - qy)^2 + (cz - qz)^2   [PT, NT] (VPU)
          m  = min(m, min_p d2)                          [1, NT]
      d       = sqrt(m)
      ub[g,b] += sum_n w * relu(d - gamma_r)^2
      lb[g,b] += sum_n w * relu(d - slack - gamma_r - gamma_t)^2

No [G*B*ns, P] intermediate ever touches HBM; per-step traffic is just
the base tiles (re-read per b) and the resident proxy array.  d2 comes
from direct squared differences — exact in f32 (the MXU norm-expansion
form either rounds inputs to bf16, corrupting bound validity, or needs
precision=HIGHEST, measured 4.7x slower end-to-end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e10

# Tile sizes: NT lanes per source tile, PT proxy sublanes per inner step.
NT = 512
PT = 1024


def _proxy_tile(p):
    """Proxy tile size for a P-point coreset: pad to 128 sublanes, cap at
    PT.  Padding to a fixed PT=1024 made every coreset <=1024 cost exactly
    1024's worth of VPU work — the proxy-size lever was dead below 1024
    (round-4 finding: P=256 ran the same wall as P=1024)."""
    return min(PT, -(-p // 128) * 128)


def _kernel(n_p_tiles, pt):
    def kernel(base_ref, tx_ref, ty_ref, tz_ref, prox_ref,
               gam_ub_ref, gam_lb_ref, gam_t_ref, w_ref, slack_ref,
               lb_ref, ub_ref):
        n = pl.program_id(2)

        @pl.when(n == 0)
        def _():
            lb_ref[0, 0, 0, 0] = 0.0
            ub_ref[0, 0, 0, 0] = 0.0

        qx = base_ref[0, 0:1, :] + tx_ref[0, 0, 0, 0]        # [1, NT]
        qy = base_ref[0, 1:2, :] + ty_ref[0, 0, 0, 0]
        qz = base_ref[0, 2:3, :] + tz_ref[0, 0, 0, 0]

        # Exact f32 squared differences on the VPU.  The MXU norm-trick
        # alternative (q_sq + c_sq - 2 cross) either rounds inputs to
        # bf16 (~3e-3 d2 error — corrupts bound validity) or needs
        # precision=HIGHEST (6 MXU passes, measured 4.7x slower overall).
        # fori_loop (not a Python unroll) so Mosaic reuses ONE [pt, NT]
        # d2 buffer regardless of proxy size — an unrolled loop OOMs the
        # 16 MB scoped-VMEM stack at large (P, ns) (round-4 regression).
        def prox_body(p, m):
            c = prox_ref[pl.ds(p * pt, pt), :]               # [pt, 3]
            dx = c[:, 0:1] - qx                              # [PT, NT]
            dy = c[:, 1:2] - qy
            dz = c[:, 2:3] - qz
            d2 = dx * dx + dy * dy + dz * dz
            return jnp.minimum(m, jnp.min(d2, axis=0, keepdims=True))

        m0 = jnp.full((1, NT), BIG, jnp.float32)
        m = jax.lax.fori_loop(0, n_p_tiles, prox_body, m0)

        d = jnp.sqrt(jnp.maximum(m, 0.0))                    # [1, NT]
        w = w_ref[:]                                         # [1, NT]
        gt = gam_t_ref[0, 0, 0, 0]
        slack = slack_ref[0, 0]
        ub_pt = jnp.square(jnp.maximum(d - gam_ub_ref[0], 0.0))
        lb_pt = jnp.square(jnp.maximum(
            d - slack - gam_lb_ref[0] - gt, 0.0))
        ub_ref[0, 0, 0, 0] += jnp.sum(w * ub_pt)
        lb_ref[0, 0, 0, 0] += jnp.sum(w * lb_pt)

    return kernel


def _lane_kernel(n_p_tiles, pt, n_tiles):
    """Per-lane variant: each lane carries its own (group id, translation,
    gamma_t); the group id is scalar-prefetched so the lane's rotated base
    row and gamma_r row are DMA'd via the index map.  The grid is (lanes,)
    with the source-tile loop INSIDE the kernel: a (lanes, n_tiles) grid
    paid the per-grid-step Mosaic overhead n_tiles times per lane and
    accumulated across steps through SMEM (measured ~1.3 ms/step
    P-independent intercept at L=1024, ns=1024 — round 4).  Both loops
    are lax.fori_loop, NOT Python unrolls: the round-4 unrolled form
    allocated a fresh [pt, NT] d2 block per (n, p) pair and OOM'd
    Mosaic's 16 MB scoped-VMEM stack at proxy=4096 x ns=3037 (24 blocks,
    16.09 M — KERNELCHECK r4); fori_loop reuses one buffer."""
    def kernel(ids_ref, base_ref, tx_ref, ty_ref, tz_ref, prox_ref,
               gam_ub_ref, gam_lb_ref, gam_t_ref, w_ref, slack_ref,
               lb_ref, ub_ref):
        gt = gam_t_ref[0, 0, 0, 0]
        slack = slack_ref[0, 0]

        def src_body(n, acc):
            lb_acc, ub_acc = acc
            off = n * NT
            qx = base_ref[0, 0:1, pl.ds(off, NT)] + tx_ref[0, 0, 0, 0]
            qy = base_ref[0, 1:2, pl.ds(off, NT)] + ty_ref[0, 0, 0, 0]
            qz = base_ref[0, 2:3, pl.ds(off, NT)] + tz_ref[0, 0, 0, 0]

            def prox_body(p, m):
                c = prox_ref[pl.ds(p * pt, pt), :]           # [pt, 3]
                dx = c[:, 0:1] - qx                          # [pt, NT]
                dy = c[:, 1:2] - qy
                dz = c[:, 2:3] - qz
                d2 = dx * dx + dy * dy + dz * dz
                return jnp.minimum(m, jnp.min(d2, axis=0, keepdims=True))

            m0 = jnp.full((1, NT), BIG, jnp.float32)
            m = jax.lax.fori_loop(0, n_p_tiles, prox_body, m0)
            d = jnp.sqrt(jnp.maximum(m, 0.0))
            w = w_ref[0:1, pl.ds(off, NT)]
            ub_pt = jnp.square(jnp.maximum(
                d - gam_ub_ref[0, 0:1, pl.ds(off, NT)], 0.0))
            lb_pt = jnp.square(jnp.maximum(
                d - slack - gam_lb_ref[0, 0:1, pl.ds(off, NT)] - gt, 0.0))
            return (lb_acc + jnp.sum(w * lb_pt),
                    ub_acc + jnp.sum(w * ub_pt))

        lb_acc, ub_acc = jax.lax.fori_loop(
            0, n_tiles, src_body, (jnp.float32(0.0), jnp.float32(0.0)))
        lb_ref[0, 0, 0] = lb_acc
        ub_ref[0, 0, 0] = ub_acc

    return kernel


def _lane_kernel_trimmed(n_p_tiles, pt, n_tiles, n_drop, bis_iters=26):
    """Trimmed per-lane variant: per-point weighted bound terms are staged
    in a VMEM scratch row, then the n_drop LARGEST terms' sum is bracketed
    in-kernel by the same threshold bisection as bounds._dropsum_bracket
    ("over" on the lb terms / "under" on the ub terms keep both trimmed
    bounds sound) and subtracted from the total.  The round-4 XLA trimmed
    path materialized [L, ns] term tensors in HBM and re-read them 26x in
    the bisection scan; here the terms never leave VMEM ([1, nsp] per
    lane, <=64 KB at ns=16k) and the bisection costs ~2*26*ns VPU ops —
    ~5% of the NN distance loop.  Padding lanes carry weight 0, so their
    terms are exactly 0 and can never be counted above a positive
    threshold nor contribute to a drop sum (same invariant the XLA
    bracket's -BIG masking enforces)."""
    def kernel(ids_ref, base_ref, tx_ref, ty_ref, tz_ref, prox_ref,
               gam_ub_ref, gam_lb_ref, gam_t_ref, w_ref, slack_ref,
               lb_ref, ub_ref, ubt_ref, lbt_ref):
        gt = gam_t_ref[0, 0, 0, 0]
        slack = slack_ref[0, 0]

        def src_body(n, _):
            off = n * NT
            qx = base_ref[0, 0:1, pl.ds(off, NT)] + tx_ref[0, 0, 0, 0]
            qy = base_ref[0, 1:2, pl.ds(off, NT)] + ty_ref[0, 0, 0, 0]
            qz = base_ref[0, 2:3, pl.ds(off, NT)] + tz_ref[0, 0, 0, 0]

            def prox_body(p, m):
                c = prox_ref[pl.ds(p * pt, pt), :]           # [pt, 3]
                dx = c[:, 0:1] - qx
                dy = c[:, 1:2] - qy
                dz = c[:, 2:3] - qz
                d2 = dx * dx + dy * dy + dz * dz
                return jnp.minimum(m, jnp.min(d2, axis=0, keepdims=True))

            m0 = jnp.full((1, NT), BIG, jnp.float32)
            m = jax.lax.fori_loop(0, n_p_tiles, prox_body, m0)
            d = jnp.sqrt(jnp.maximum(m, 0.0))
            w = w_ref[0:1, pl.ds(off, NT)]
            ubt_ref[0:1, pl.ds(off, NT)] = w * jnp.square(jnp.maximum(
                d - gam_ub_ref[0, 0:1, pl.ds(off, NT)], 0.0))
            lbt_ref[0:1, pl.ds(off, NT)] = w * jnp.square(jnp.maximum(
                d - slack - gam_lb_ref[0, 0:1, pl.ds(off, NT)] - gt, 0.0))
            return 0

        jax.lax.fori_loop(0, n_tiles, src_body, 0)
        ubt = ubt_ref[:]                                     # [1, nsp]
        lbt = lbt_ref[:]

        def dropsum(x, over):
            """Bracket of the sum of the n_drop largest entries of x
            (bounds._dropsum_bracket semantics; entries >= 0)."""
            kf = jnp.float32(n_drop)

            def bis(i, c):
                lo, hi = c
                mid = 0.5 * (lo + hi)
                cnt = jnp.sum((x > mid).astype(jnp.float32))
                ge = cnt >= kf
                return (jnp.where(ge, mid, lo), jnp.where(ge, hi, mid))

            lo, hi = jax.lax.fori_loop(
                0, bis_iters, bis,
                (jnp.float32(0.0), jnp.max(x)))
            t = lo if over else hi
            above = x > t
            s = jnp.sum(jnp.where(above, x, 0.0))
            cnt = jnp.sum(above.astype(jnp.float32))
            return s + (kf - cnt) * lo

        # lb: drop sum OVERestimated (trimmed lb stays sound);
        # ub: drop sum UNDERestimated (trimmed ub stays achievable).
        lb_ref[0, 0, 0] = (jnp.sum(lbt)
                           - jnp.maximum(dropsum(lbt, True), 0.0))
        ub_ref[0, 0, 0] = (jnp.sum(ubt)
                           - jnp.maximum(dropsum(ubt, False), 0.0))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "n_drop"))
def fused_bounds_lanes_trimmed(base, gids, t_lanes, proxies, gam_ub,
                               gam_t_lanes, slack, n_drop: int,
                               point_weights=None, interpret: bool = False,
                               gam_lb=None):
    """Trimmed lb, ub [L]: per-lane bound sums minus a sound bracket of
    the n_drop largest per-point terms (fused rotate -> NN -> radii ->
    trim -> reduce; see _lane_kernel_trimmed).  point_weights must be a
    0/1 padding mask (the only combination the engine produces for
    trimming — clusters and plain trim are mutually exclusive upstream).
    Replaces the reference's untrimmed bound op (registration.cu:46-59)
    plus the trim the reference parses but never implements
    (utilities.hpp:94)."""
    if gam_lb is None:
        gam_lb = gam_ub
    g, ns, _ = base.shape
    lanes = gids.shape[0]
    w = (jnp.ones((ns,), jnp.float32) if point_weights is None
         else jnp.asarray(point_weights, jnp.float32))

    base_t = _pad_axis(jnp.swapaxes(jnp.asarray(base, jnp.float32), 1, 2),
                       2, NT)                                 # [G, 3, NSp]
    nsp = base_t.shape[2]
    w = _pad_axis(w, 0, NT)[None, :]                          # [1, NSp]
    gam_ub = _pad_axis(jnp.asarray(gam_ub, jnp.float32), 1, NT)[:, None, :]
    gam_lb = _pad_axis(jnp.asarray(gam_lb, jnp.float32), 1, NT)[:, None, :]
    pt = _proxy_tile(proxies.shape[0])
    prox_p = _pad_axis(jnp.asarray(proxies, jnp.float32), 0, pt,
                       value=1e6)                             # [Pp, 3]
    n_p_tiles = prox_p.shape[0] // pt
    n_tiles = nsp // NT

    t_lanes = jnp.asarray(t_lanes, jnp.float32)
    l111 = lambda a: a.reshape(lanes, 1, 1, 1)
    smem_l = lambda: pl.BlockSpec(
        (1, 1, 1, 1), lambda l, ids: (l, 0, 0, 0),
        memory_space=pltpu.SMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(lanes,),
        in_specs=[
            pl.BlockSpec((1, 3, nsp), lambda l, ids: (ids[l], 0, 0),
                         memory_space=pltpu.VMEM),            # base
            smem_l(),                                         # tx
            smem_l(),                                         # ty
            smem_l(),                                         # tz
            pl.BlockSpec((prox_p.shape[0], 3), lambda l, ids: (0, 0),
                         memory_space=pltpu.VMEM),            # proxies
            pl.BlockSpec((1, 1, nsp), lambda l, ids: (ids[l], 0, 0),
                         memory_space=pltpu.VMEM),            # gam_ub
            pl.BlockSpec((1, 1, nsp), lambda l, ids: (ids[l], 0, 0),
                         memory_space=pltpu.VMEM),            # gam_lb
            smem_l(),                                         # gam_t
            pl.BlockSpec((1, nsp), lambda l, ids: (0, 0),
                         memory_space=pltpu.VMEM),            # weights
            pl.BlockSpec((1, 1), lambda l, ids: (0, 0),
                         memory_space=pltpu.SMEM),            # slack
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda l, ids: (l, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda l, ids: (l, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, nsp), jnp.float32),                # ub terms
            pltpu.VMEM((1, nsp), jnp.float32),                # lb terms
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((lanes, 1, 1), jnp.float32)] * 2
    lb, ub = pl.pallas_call(
        _lane_kernel_trimmed(n_p_tiles, pt, n_tiles, n_drop),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(gids, jnp.int32),
      base_t, l111(t_lanes[:, 0]), l111(t_lanes[:, 1]), l111(t_lanes[:, 2]),
      prox_p, gam_ub, gam_lb,
      l111(jnp.asarray(gam_t_lanes, jnp.float32)), w,
      jnp.full((1, 1), slack, jnp.float32))
    return lb[:, 0, 0], ub[:, 0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bounds_lanes(base, gids, t_lanes, proxies, gam_ub, gam_t_lanes,
                       slack, point_weights=None, interpret: bool = False,
                       gam_lb=None):
    """lb, ub [L] for L independent lanes (the pooled-frontier hot op).

    base:        [G, ns, 3] rotated source per group (R_g @ p).
    gids:        [L] int32 group id per lane (selects base/gam_r rows).
    t_lanes:     [L, 3] translation per lane.
    proxies:     [P, 3] target proxy points.
    gam_ub/gam_lb: [G, ns] per-point radii for the upper/lower bound terms
                 (pre-zeroed rows for fixed-rotation groups; gam_lb
                 defaults to gam_ub; they differ for weighted source
                 coresets).
    gam_t_lanes: [L] translation uncertainty per lane.
    slack:       scalar distance slack for the lower bound.
    """
    if gam_lb is None:
        gam_lb = gam_ub
    g, ns, _ = base.shape
    lanes = gids.shape[0]
    w = (jnp.ones((ns,), jnp.float32) if point_weights is None
         else jnp.asarray(point_weights, jnp.float32))

    base_t = _pad_axis(jnp.swapaxes(jnp.asarray(base, jnp.float32), 1, 2),
                       2, NT)                                 # [G, 3, NSp]
    nsp = base_t.shape[2]
    w = _pad_axis(w, 0, NT)[None, :]                          # [1, NSp]
    gam_ub = _pad_axis(jnp.asarray(gam_ub, jnp.float32), 1, NT)[:, None, :]
    gam_lb = _pad_axis(jnp.asarray(gam_lb, jnp.float32), 1, NT)[:, None, :]
    pt = _proxy_tile(proxies.shape[0])
    prox_p = _pad_axis(jnp.asarray(proxies, jnp.float32), 0, pt,
                       value=1e6)                             # [Pp, 3]
    n_p_tiles = prox_p.shape[0] // pt
    n_tiles = nsp // NT

    t_lanes = jnp.asarray(t_lanes, jnp.float32)
    l111 = lambda a: a.reshape(lanes, 1, 1, 1)
    smem_l = lambda: pl.BlockSpec(
        (1, 1, 1, 1), lambda l, ids: (l, 0, 0, 0),
        memory_space=pltpu.SMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(lanes,),
        in_specs=[
            pl.BlockSpec((1, 3, nsp), lambda l, ids: (ids[l], 0, 0),
                         memory_space=pltpu.VMEM),            # base
            smem_l(),                                         # tx
            smem_l(),                                         # ty
            smem_l(),                                         # tz
            pl.BlockSpec((prox_p.shape[0], 3), lambda l, ids: (0, 0),
                         memory_space=pltpu.VMEM),            # proxies
            pl.BlockSpec((1, 1, nsp), lambda l, ids: (ids[l], 0, 0),
                         memory_space=pltpu.VMEM),            # gam_ub
            pl.BlockSpec((1, 1, nsp), lambda l, ids: (ids[l], 0, 0),
                         memory_space=pltpu.VMEM),            # gam_lb
            smem_l(),                                         # gam_t
            pl.BlockSpec((1, nsp), lambda l, ids: (0, 0),
                         memory_space=pltpu.VMEM),            # weights
            pl.BlockSpec((1, 1), lambda l, ids: (0, 0),
                         memory_space=pltpu.SMEM),            # slack
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda l, ids: (l, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda l, ids: (l, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((lanes, 1, 1), jnp.float32)] * 2
    lb, ub = pl.pallas_call(
        _lane_kernel(n_p_tiles, pt, n_tiles),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(gids, jnp.int32),
      base_t, l111(t_lanes[:, 0]), l111(t_lanes[:, 1]), l111(t_lanes[:, 2]),
      prox_p, gam_ub, gam_lb,
      l111(jnp.asarray(gam_t_lanes, jnp.float32)), w,
      jnp.full((1, 1), slack, jnp.float32))
    return lb[:, 0, 0], ub[:, 0, 0]


def _pad_axis(a, axis, size, value=0.0):
    pad = (-a.shape[axis]) % size
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bounds(base, t_centers, proxies, gam_ub, gam_t, slack,
                 point_weights=None, interpret: bool = False,
                 gam_lb=None):
    """lb, ub [G, B] for rotated source `base` [G, ns, 3] against proxy
    points [P, 3] over translation nodes t_centers [G, B, 3].

    gam_ub/gam_lb [G, ns]: per-point radii subtracted from d in the upper
    and lower bound terms respectively (identical for plain point
    sources; they differ by the cluster radius for weighted source
    coresets).  gam_lb defaults to gam_ub.  gam_t [G, B]; slack scalar
    (lower-bound distance slack: covering radius + rank slack);
    point_weights [ns] (0 marks padding, cluster multiplicity otherwise).
    """
    if gam_lb is None:
        gam_lb = gam_ub
    g, ns, _ = base.shape
    b = t_centers.shape[1]
    w = (jnp.ones((ns,), jnp.float32) if point_weights is None
         else jnp.asarray(point_weights, jnp.float32))

    # Transpose to lane-friendly layouts and pad.
    base_t = _pad_axis(jnp.swapaxes(jnp.asarray(base, jnp.float32), 1, 2),
                       2, NT)                                 # [G, 3, NSp]
    nsp = base_t.shape[2]
    # Padding source lanes: weight 0 (their bound terms are masked out).
    w = _pad_axis(w, 0, NT)[None, :]                          # [1, NSp]
    gam_ub = _pad_axis(jnp.asarray(gam_ub, jnp.float32), 1, NT)[:, None, :]
    gam_lb = _pad_axis(jnp.asarray(gam_lb, jnp.float32), 1, NT)[:, None, :]
    # Padding proxies sit far away so they never win the min (kept finite
    # to avoid inf arithmetic).
    pt = _proxy_tile(proxies.shape[0])
    prox_p = _pad_axis(jnp.asarray(proxies, jnp.float32), 0, pt,
                       value=1e6)                             # [Pp, 3]
    n_p_tiles = prox_p.shape[0] // pt
    n_tiles = nsp // NT

    # Per-(g, b) scalars carry two trailing singleton dims so their (1, 1)
    # trailing block equals the array's trailing dims (the Mosaic tiling
    # rule applies to SMEM blocks too).
    t_centers = jnp.asarray(t_centers, jnp.float32)[..., None]
    tx = t_centers[:, :, 0]
    ty = t_centers[:, :, 1]
    tz = t_centers[:, :, 2]
    gb11 = lambda a: a.reshape(g, b, 1, 1)

    grid = (g, b, n_tiles)
    out_shape = [jax.ShapeDtypeStruct((g, b, 1, 1), jnp.float32)] * 2
    smem_gb = lambda: pl.BlockSpec((1, 1, 1, 1), lambda i, j, n: (i, j, 0, 0),
                                   memory_space=pltpu.SMEM)
    lb, ub = pl.pallas_call(
        _kernel(n_p_tiles, pt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, NT), lambda i, j, n: (i, 0, n),
                         memory_space=pltpu.VMEM),            # base
            smem_gb(),                                        # tx
            smem_gb(),                                        # ty
            smem_gb(),                                        # tz
            pl.BlockSpec((prox_p.shape[0], 3), lambda i, j, n: (0, 0),
                         memory_space=pltpu.VMEM),            # proxies
            pl.BlockSpec((1, 1, NT), lambda i, j, n: (i, 0, n),
                         memory_space=pltpu.VMEM),            # gam_ub
            pl.BlockSpec((1, 1, NT), lambda i, j, n: (i, 0, n),
                         memory_space=pltpu.VMEM),            # gam_lb
            smem_gb(),                                        # gam_t
            pl.BlockSpec((1, NT), lambda i, j, n: (0, n),
                         memory_space=pltpu.VMEM),            # weights
            pl.BlockSpec((1, 1), lambda i, j, n: (0, 0),
                         memory_space=pltpu.SMEM),            # slack
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda i, j, n: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda i, j, n: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(base_t, gb11(tx), gb11(ty), gb11(tz), prox_p, gam_ub, gam_lb,
      gb11(jnp.asarray(gam_t, jnp.float32)), w,
      jnp.full((1, 1), slack, jnp.float32))
    return lb[:, :, 0, 0], ub[:, :, 0, 0]
