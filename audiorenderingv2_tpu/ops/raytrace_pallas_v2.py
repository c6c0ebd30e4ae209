"""Pallas trace kernel v2: rays-in-lanes layout + MXU intersection.

The v1 kernel (raytrace_pallas.py) keeps per-ray state as [R, 1] columns —
every op occupies full 128-lane tiles, so state updates cost as much as the
intersection itself. v2 restructures the tile:

  * a tile is 128 rays living in the LANE dimension: every per-ray state
    array is [1, 128] — one vector register — so the whole bounce-update
    (sphere test, reflection, masks, event capture) is ~50 single-register
    VPU ops instead of ~40 x 32-register ops,
  * triangles advance in SUBLANE groups of 8: each intersection step
    processes an [8 tris, 128 rays] block,
  * the six Möller–Trumbore dot products (plane + barycentric rows against
    ray origin/direction) become ONE MXU matmul per group: a precomputed
    [48, 8] coefficient matrix (6 quantities x 8 triangles, 8 columns =
    (px,py,pz,vx,vy,vz,1,0)) multiplies the [8, 128] packed ray coordinates,
    yielding all six [8, 128] quantity blocks in a single dot — the VPU only
    runs the compare/select/min tail,
  * the winning triangle's attributes come from sublane-masked reductions
    (first-sublane tie-break == argmin semantics),
  * triangle groups are walked with a fori_loop + dynamic VMEM slices, so
    code size is independent of scene size.

Same ray-state columns, round scheduling, and compaction driver as v1
(the driver in raytrace_pallas.py dispatches on ``version``); physics is
identical to the XLA tracer and the numpy oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants
from ..core.tracer import SceneArrays
from ..core.tracer_ref import TraceParams
from . import raytrace_pallas as v1

_LANES = 128
_GROUP = 8          # triangles per sublane group
_NQ = 6             # dot-product quantities: no, nd, ou, du, ov, dv
_AROWS = _NQ * _GROUP  # rows of the per-group MXU coefficient matrix
_CROWS = _NQ * _GROUP  # coefficient rows per cluster (48) in the v3 layout

# Transposed triangle attribute columns ([T, tn_cols]): unit normal, then
# n_bands absorption columns, then the valid flag (_T_ABS + n_bands).
(_T_NX, _T_NY, _T_NZ, _T_ABS) = range(4)
_MAX_BANDS = 8

# Cluster-path triangle row layout ([C*128 tris, _NR] — triangles in
# SUBLANES, per-triangle quantities in lanes; see pack_tris_v2 cluster
# branch). The per-visit intersection broadcasts [16, 1] triangle columns
# against [1, 128] ray rows on the VPU — measured far cheaper than MXU
# dots at this K=8 grain (each small lhs-transposed dot pays ~500 cycles
# of fixed pipeline cost; six of them per visit at HIGHEST's 6 bf16
# passes dominated the large-scene render).
(_R_PNX, _R_PNY, _R_PNZ, _R_PD,
 _R_AUX, _R_AUY, _R_AUZ, _R_AUO,
 _R_AVX, _R_AVY, _R_AVZ, _R_AVO,
 _R_NX, _R_NY, _R_NZ, _R_VAL, _R_ABS) = range(17)
_NR = 24  # 16 fixed + up to 8 absorption bands
_TRI_CHUNK = 16  # triangles per VPU sub-block ([16, 128] working arrays
                 # keep the live register set small — [128, 128]
                 # intermediates spill)


def tn_cols(n_bands: int) -> int:
    """Attribute columns: 3 normal + n_bands absorption + valid, rounded to
    a sublane multiple (8): standard octave-band tables (6-8 bands) take the
    16-column layout; anything up to 4 bands fits the compact 8."""
    return 8 if n_bands <= 4 else 16


def _layout_bands(n_bands: int) -> int:
    """Band capacity of the chosen state-column layout (1, 4 or 8)."""
    return 1 if n_bands == 1 else (4 if n_bands <= 4 else 8)


def state_ncols(n_bands: int) -> int:
    """Ray-state columns: v1's 16-column layout for one band; banded runs
    add (layout_bands - 1) extra energy and event-weight columns, rounded
    to a multiple of 8 (24 for the 4-band layout, 32 for the 8-band one).
    Extra-band columns: energy b at 16 + (b-1), event weight b at
    16 + (layout_bands-1) + (b-1)."""
    lb = _layout_bands(n_bands)
    return 16 + (-(-(2 * (lb - 1)) // 8)) * 8


def pack_tris_v2(sc: SceneArrays, n_bands: int = 1, layout: str = "auto",
                 tri_block: int = _TRI_CHUNK):
    """Build the packed-triangle operands for the v2 kernel; returns
    (coeffs, attrs, boxes).

    ``layout``: "auto" = rows (clustered or not — the r4 on-chip sweep
    measured the unclustered rows path at 82 ms vs the MXU group path's
    104 ms on the 1M-ray headline bench: exact-f32 VPU outer products beat
    K=8 MXU dots that pay 6 HIGHEST passes each,
    benchmarks/results/tune_r4.log); "rows" explicit same; "group" forces
    the MXU group layout (requires no clusters; kept for A/B measurement).

    Two layouts, chosen by whether the scene carries Morton clusters:

    * **group layout** (small scenes, ``boxes is None``): coeff [T/8*48, 8]
      — rows [g*48 + q*8 + i] hold the 8 PD-coefficients of quantity q for
      triangle g*8+i — and attrs [T, 8]. Lane-padding waste is irrelevant
      at this size.
    * **cluster layout** (``boxes`` set): one [C*128, _NR] row array,
      triangle i of cluster c at row c*128 + i, lanes = plane (pn, pd),
      barycentric (au, u_off, av, v_off), unit normal, valid flag, then
      n_bands absorption columns; ``attrs`` returns None. The kernel's
      per-visit intersection slices [16, _NR] sub-blocks and broadcasts
      their [16, 1] columns against [1, 128] ray rows (exact-f32 VPU
      outer products; see the _TRI_CHUNK note above).

    The group layout's six quantities, with PD = (px,py,pz,vx,vy,vz,1,0):
      no = pn . p + pd     nd = pn . v
      ou = au . p + u_off  du = au . v
      ov = av . p + v_off  dv = av . v
    """
    t = sc.plane_n.shape[0]
    if t % _GROUP:
        raise ValueError(f"triangle count {t} not a multiple of {_GROUP}")
    zeros = jnp.zeros((t,), jnp.float32)

    def coeff(vec3, offset, on_pos):
        # [T, 8] coefficient rows for  vec3 . (p|v) + offset
        x, y, z = vec3[:, 0], vec3[:, 1], vec3[:, 2]
        if on_pos:
            return jnp.stack([x, y, z, zeros, zeros, zeros, offset, zeros], axis=1)
        return jnp.stack([zeros, zeros, zeros, x, y, z, zeros, zeros], axis=1)

    q = jnp.stack([
        coeff(sc.plane_n, sc.plane_d, True),
        coeff(sc.plane_n, zeros, False),
        coeff(sc.bary_u, sc.u_off, True),
        coeff(sc.bary_u, zeros, False),
        coeff(sc.bary_v, sc.v_off, True),
        coeff(sc.bary_v, zeros, False),
    ], axis=1)  # [T, 6 quantities, 8 coefficients]

    if n_bands > _MAX_BANDS:
        raise ValueError(f"v2 kernel supports at most {_MAX_BANDS} bands")
    absorb = sc.absorption
    if absorb.ndim == 1:
        absorb = absorb[:, None]
    if absorb.shape[1] not in (1, n_bands) and n_bands > absorb.shape[1]:
        # Match the XLA tracer: only broadband (1-band) absorption
        # broadcasts; silently clamping missing bands to the last real
        # one would render the extra bands with wrong physics while the
        # same config fails loudly on backend="xla".
        raise ValueError(f"scene has {absorb.shape[1]} absorption bands "
                         f"but params ask for {n_bands}; only 1-band "
                         f"scenes broadcast")
    ab_cols = [absorb[:, min(b, absorb.shape[1] - 1)] for b in range(n_bands)]
    boxes = sc.cluster_boxes

    # Trim trailing padding so the kernel never intersects blocks that are
    # 100% padding (lane alignment pads tiny scenes up to 128 triangles —
    # e.g. 3D_U.obj is 10 real triangles in 16 groups, 87% dead work).
    # Padding lives at the tail (scene_to_arrays / Morton sort preserve
    # that), and trimming is only possible when ``valid`` is concrete
    # (outside jit).
    n_valid = None
    if not isinstance(sc.valid, jax.core.Tracer):
        # numpy, not jnp: under an outer jit, jnp ops on this concrete
        # closure constant would stage out and return tracers.
        import numpy as np
        v = np.asarray(sc.valid) > 0
        # Trim at the LAST valid index, not the valid COUNT: valid=0 also
        # marks interior degenerate (sliver) faces, and a count-based trim
        # would shift the cut and silently drop real tail triangles.
        n_valid = int(np.max(np.nonzero(v)[0])) + 1 if v.any() else 0

    if layout not in ("auto", "rows", "group"):
        raise ValueError(f"layout must be auto|rows|group, got {layout!r}")
    if layout == "group" and boxes is not None:
        raise ValueError("group layout cannot carry cluster boxes")
    tn = tn_cols(n_bands)
    if boxes is None and layout == "group":
        # group layout: [G*48, 8] coefficient rows, [T, tn] attributes
        coeffs = q.reshape(t // _GROUP, _GROUP, _NQ, 8).transpose(0, 2, 1, 3)
        coeffs = coeffs.reshape(t // _GROUP * _AROWS, 8).astype(jnp.float32)
        pad_cols = [zeros] * (tn - 4 - n_bands)
        attrs = jnp.stack([
            sc.normal[:, 0], sc.normal[:, 1], sc.normal[:, 2],
            *ab_cols, sc.valid, *pad_cols,
        ], axis=1).astype(jnp.float32)  # [T, tn]; valid at col 3 + n_bands
        if n_valid is not None:
            keep = max(1, -(-n_valid // _GROUP))
            if keep < t // _GROUP:
                coeffs = coeffs[:keep * _AROWS]
                attrs = attrs[:keep * _GROUP]
        return coeffs, attrs, None

    # Cluster/rows layout: triangles in SUBLANES — [C*cs, _NR] rows, one
    # row per triangle (cs = cluster size, from accel.build_clusters),
    # lanes = (plane, bary-u, bary-v, normal, valid, absorption bands).
    # The kernel's per-visit intersection slices 16-row sub-blocks and
    # broadcasts their [16, 1] columns against the tile's [1, 128] ray
    # rows (pure exact-f32 VPU; no MXU, no transposes).
    if boxes is not None:
        cs = t // boxes.shape[0]
        if cs * boxes.shape[0] != t or cs % _TRI_CHUNK:
            raise ValueError(
                f"clustered scene: {t} tris over {boxes.shape[0]} clusters "
                f"needs a cluster size that is a multiple of {_TRI_CHUNK}")
    pad_rows = [zeros] * (_NR - 16 - n_bands)
    rows = jnp.stack([
        sc.plane_n[:, 0], sc.plane_n[:, 1], sc.plane_n[:, 2], sc.plane_d,
        sc.bary_u[:, 0], sc.bary_u[:, 1], sc.bary_u[:, 2], sc.u_off,
        sc.bary_v[:, 0], sc.bary_v[:, 1], sc.bary_v[:, 2], sc.v_off,
        sc.normal[:, 0], sc.normal[:, 1], sc.normal[:, 2], sc.valid,
        *ab_cols, *pad_rows,
    ], axis=1).astype(jnp.float32)  # [T, _NR]
    if boxes is None:
        # forced rows layout, no culling: trim to whole VPU tri blocks
        if n_valid is not None:
            keep = max(1, -(-n_valid // tri_block)) * tri_block
            if keep < rows.shape[0]:
                rows = rows[:keep]
        if rows.shape[0] % tri_block:
            raise ValueError(f"rows layout: {rows.shape[0]} tris not a "
                             f"multiple of {tri_block}")
        return rows, None, None
    if n_valid is not None:
        keep_c = max(1, -(-n_valid // cs))
        if keep_c < boxes.shape[0]:
            rows = rows[:keep_c * cs]
            boxes = boxes[:keep_c]
    return rows, None, boxes


def _init_state_kernel_v2(scal_ref, out_ref, *, n_real: int, n_bands: int):
    """Initialize the tiled ray state with on-chip generated directions.

    Uses the Pallas TPU PRNG (threefry-free, per-tile seeded) with the same
    uniform-sphere mapping as core/sampling.py — a different (but equally
    deterministic) stream than jax.random; parity tests use the explicit
    directions path instead.
    """
    C = v1
    s = lambda j: scal_ref[0, j]
    tile = pl.program_id(0)
    pltpu.prng_seed(scal_ref[0, C._S_PAD14].astype(jnp.int32) + tile)
    bits = pltpu.bitcast(pltpu.prng_random_bits((2, _LANES)), jnp.uint32)
    # Mosaic can't cast uint32->f32 directly; after >>8 the value fits int32.
    to_unit = lambda b: (pltpu.bitcast(b >> 8, jnp.int32).astype(jnp.float32)
                         * jnp.float32(1.0 / (1 << 24)))
    theta = 2.0 * jnp.pi * to_unit(bits[0:1])
    cos_phi = 2.0 * to_unit(bits[1:2]) - 1.0
    sin_phi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_phi * cos_phi))

    gidx = tile * _LANES + jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    # n_real is a static int, so this boundary test is exact at any scale
    # (an f32 compare would mis-round past 2^24 rays).
    in_range = gidx < n_real
    zero = jnp.zeros((1, _LANES), jnp.float32)

    en_cols, _ = _band_cols(n_bands)
    writes = {C._C_PX: zero + s(C._S_EMX),
              C._C_PY: zero + s(C._S_EMY),
              C._C_PZ: zero + s(C._S_EMZ),
              C._C_VX: sin_phi * jnp.cos(theta),
              C._C_VY: sin_phi * jnp.sin(theta),
              C._C_VZ: cos_phi,
              C._C_DONE: jnp.where(in_range, 0.0, 1.0),
              C._C_RAYID: gidx.astype(jnp.float32),
              C._C_RECVD: zero - 1.0}
    e0 = jnp.where(in_range, s(C._S_E0), 0.0)
    for k in en_cols:
        writes[k] = e0
    for k in range(state_ncols(n_bands)):
        out_ref[0, k] = writes.get(k, zero)


def init_state_tiles(scal: jax.Array, n_pad: int, n_real: int,
                     interpret: bool = False, n_bands: int = 1) -> jax.Array:
    """On-chip state init: [n_tiles, NCOLS, 1, 128] with generated dirs."""
    n_tiles = n_pad // _LANES
    ncols = state_ncols(n_bands)
    return pl.pallas_call(
        functools.partial(_init_state_kernel_v2, n_real=n_real,
                          n_bands=n_bands),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, v1._NSCAL), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, ncols, 1, _LANES),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, ncols, 1, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(scal)


def _band_cols(n_bands: int):
    """State columns for the per-band energy and event-weight values.

    Band 0 uses v1's _C_EN/_C_EVW slots; extra bands use columns 16+ (see
    :func:`state_ncols`)."""
    lb = _layout_bands(n_bands)
    en = [v1._C_EN] + [16 + b - 1 for b in range(1, n_bands)]
    evw = [v1._C_EVW] + [16 + (lb - 1) + b - 1 for b in range(1, n_bands)]
    return en, evw


def _trace_round_kernel_v2(scal_ref, coeff_ref, attr_ref, box_ref,
                           *rest_refs,
                           n_groups: int,
                           max_bounces: int,
                           n_clusters: int,
                           use_cull: bool, n_bands: int,
                           n_blocks: int = 0,
                           cluster_size: int = 128,
                           use_sched: bool = False,
                           single_bounce: bool = False,
                           unroll: int = 1,
                           precision: str = "highest",
                           count_visits: bool = False,
                           diag: str = "full",
                           tri_block: int = _TRI_CHUNK,
                           sched_unroll: int = 1):
    if use_sched:
        sched_ref, state_ref, out_ref, scr_f_ref, scr_i_ref = rest_refs
    else:
        sched_ref = None
        state_ref, out_ref, scr_f_ref, scr_i_ref = rest_refs
    s = lambda j: scal_ref[0, j]
    # Runtime bounce budget for this round (scalar slot, not a compile-time
    # constant): every round of a schedule — and every schedule — shares one
    # compiled kernel, so a 4-round schedule costs ONE Mosaic compile.
    round_budget = scal_ref[0, v1._S_BUDGET].astype(jnp.int32)
    inf = jnp.float32(jnp.inf)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, _LANES), 0)
    col = lambda k: state_ref[0, k]  # [1, 128]
    zero = jnp.zeros((1, _LANES), jnp.float32)
    ones = jnp.ones((1, _LANES), jnp.float32)
    C = v1  # column indices shared with v1

    split3 = precision in ("high", "split3")

    def _hl(x):
        """bf16 hi/lo split: x == hi + lo with hi, lo bf16-representable
        (lo to ~2^-18 relative), so single-pass bf16 MXU dots on (hi, lo)
        reconstruct the f32 product with 3 passes instead of HIGHEST's 6."""
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def mxu_dot(lhs, rhs, dims):
        """f32-accurate MXU dot at the configured precision."""
        if not split3:
            return jax.lax.dot_general(lhs, rhs, (dims, ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=_PRECISIONS[precision])
        lh, ll = _hl(lhs)
        rh, rl = _hl(rhs)
        d = lambda a, b: jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32)
        return d(lh, rh) + d(lh, rl) + d(ll, rh)
    en_cols, evw_cols = _band_cols(n_bands)
    t_val = _T_ABS + n_bands  # valid flag sits after the absorption columns

    init = (
        jnp.int32(0),
        col(C._C_PX), col(C._C_PY), col(C._C_PZ),
        col(C._C_VX), col(C._C_VY), col(C._C_VZ),
        col(C._C_DIST), tuple(col(k) for k in en_cols),
        col(C._C_DEPTH), col(C._C_DONE),
        col(C._C_EVB), tuple(col(k) for k in evw_cols), col(C._C_EVE),
        # topology-recording columns: last-bounce tri id (fresh each round)
        # and sticky receiver depth (see raytrace_pallas column docs)
        zero, col(C._C_RECVD),
    )

    def cond(carry):
        i = carry[0]
        done = carry[10]
        return (i < round_budget) & (jnp.max(1.0 - done) > 0.0)

    def body(carry):
        (i, px, py, pz, vx, vy, vz, dist, energy, depth, done,
         ev_bin, ev_w, ev_ear, ltri, recvd) = carry

        e_max = energy[0]
        for e in energy[1:]:
            e_max = jnp.maximum(e_max, e)
        can_continue = ((dist < s(C._S_DTHR)) & (e_max > s(C._S_ETHR))
                        & (depth < jnp.float32(max_bounces)))
        alive = (done == 0.0) & can_continue

        # Packed ray coordinates for the MXU: [8, 128].
        pd8 = jnp.concatenate([px, py, pz, vx, vy, vz, ones, zero], axis=0)

        def group_step(g, best):
            best_t, bnx, bny, bnz, bab, btri = best
            a = coeff_ref[pl.ds(g * _AROWS, _AROWS), :]          # [48, 8]
            # Multi-pass bf16 == f32 accuracy; default single-pass bf16
            # corrupts geometry (8-bit mantissa positions).
            out = mxu_dot(a, pd8, ((1,), (0,)))                  # [48, 128]
            no, nd = out[0:8], out[8:16]
            ou, du = out[16:24], out[24:32]
            ov, dv = out[32:40], out[40:48]
            at = attr_ref[pl.ds(g * _GROUP, _GROUP), :]           # [8, 8]

            safe = jnp.abs(nd) > 1e-12
            t = -no / jnp.where(safe, nd, 1.0)
            u = ou + t * du
            v = ov + t * dv
            ok = (safe & (t > constants.T_MIN)
                  & (u >= -1e-7) & (v >= -1e-7) & (u + v <= 1.0 + 1e-7)
                  & (at[:, t_val:t_val + 1] > 0))
            tm = jnp.where(ok, t, inf)
            gt = jnp.min(tm, axis=0, keepdims=True)               # [1, 128]
            better = gt < best_t
            win_sub = jnp.min(jnp.where(tm <= gt, sub, _GROUP),
                              axis=0, keepdims=True)
            win = sub == win_sub
            pick = lambda k: jnp.sum(
                jnp.where(win, at[:, k:k + 1], 0.0), axis=0, keepdims=True)
            wid = (g * _GROUP + win_sub).astype(jnp.float32) + 1.0
            return (jnp.where(better, gt, best_t),
                    jnp.where(better, pick(_T_NX), bnx),
                    jnp.where(better, pick(_T_NY), bny),
                    jnp.where(better, pick(_T_NZ), bnz),
                    tuple(jnp.where(better, pick(_T_ABS + b), bab[b])
                          for b in range(n_bands)),
                    jnp.where(better, wid, btri))

        best0 = (jnp.full((1, _LANES), inf), zero, zero, zero,
                 (zero,) * n_bands, zero)

        sub16 = jax.lax.broadcasted_iota(jnp.int32, (tri_block, _LANES), 0)

        def tri16(tr, base, best):
            """Intersect one [tri_block, _NR] row block (cluster layout)
            against the tile's rays: triangle quantity columns
            [tri_block, 1] broadcast against ray rows [1, 128] — exact-f32
            VPU outer products (the oracle's Möller–Trumbore order),
            running winner in [1, 128] rows. ``base``: global triangle
            index of the block's first row (static or traced).

            ``tri_block`` trades per-triangle tail cost for registers: the
            post-dot machinery (min/argmin reductions, attribute picks,
            best-row selects) costs ~constant per call, so 32-row blocks
            halve it per triangle; [128, x] blocks spill (r2 finding)."""
            best_t, bnx, bny, bnz, bab, btri = best
            cr = lambda k: tr[:, k:k + 1]                  # [16, 1]
            nd = vx * cr(_R_PNX) + vy * cr(_R_PNY) + vz * cr(_R_PNZ)
            no = (px * cr(_R_PNX) + py * cr(_R_PNY)
                  + pz * cr(_R_PNZ) + cr(_R_PD))
            safe = jnp.abs(nd) > 1e-12
            t = -no / jnp.where(safe, nd, 1.0)
            ou = (px * cr(_R_AUX) + py * cr(_R_AUY)
                  + pz * cr(_R_AUZ) + cr(_R_AUO))
            du = vx * cr(_R_AUX) + vy * cr(_R_AUY) + vz * cr(_R_AUZ)
            u = ou + t * du
            ov = (px * cr(_R_AVX) + py * cr(_R_AVY)
                  + pz * cr(_R_AVZ) + cr(_R_AVO))
            dv = vx * cr(_R_AVX) + vy * cr(_R_AVY) + vz * cr(_R_AVZ)
            v = ov + t * dv
            ok = (safe & (t > constants.T_MIN)
                  & (u >= -1e-7) & (v >= -1e-7)
                  & (u + v <= 1.0 + 1e-7) & (cr(_R_VAL) > 0))
            tm = jnp.where(ok, t, inf)                     # [tb, 128]
            ct = jnp.min(tm, axis=0, keepdims=True)        # [1, 128]
            better = ct < best_t
            win_sub = jnp.min(jnp.where(tm <= ct, sub16, tri_block),
                              axis=0, keepdims=True)
            win = sub16 == win_sub
            pick = lambda k: jnp.sum(
                jnp.where(win, cr(k), 0.0), axis=0, keepdims=True)
            wid = (base + win_sub).astype(jnp.float32) + 1.0
            return (jnp.where(better, ct, best_t),
                    jnp.where(better, pick(_R_NX), bnx),
                    jnp.where(better, pick(_R_NY), bny),
                    jnp.where(better, pick(_R_NZ), bnz),
                    tuple(jnp.where(better, pick(_R_ABS + b), bab[b])
                          for b in range(n_bands)),
                    jnp.where(better, wid, btri))

        def cluster_intersect(c, best):
            # Whole-cluster intersection, 16 triangles at a time
            # (tri16 above). [16, 128] working arrays keep the live
            # register set ~20 registers; MXU dots at this K=8 grain
            # measured ~1 s per bf16 pass-set on the 20k-tri workload.
            tri0 = pl.multiple_of(c * cluster_size, 8)
            trn = coeff_ref[pl.ds(tri0, cluster_size), :]  # [cs, _NR]
            for j in range(cluster_size // tri_block):
                best = tri16(trn[j * tri_block:(j + 1) * tri_block, :],
                             c * cluster_size + j * tri_block, best)
            return best

        if use_cull and diag == "notrav":
            # Diagnostic: skip slab + traversal + intersection entirely
            # (physically wrong: every ray misses). Times the per-round
            # fixed machinery (state IO, receiver, bounce tail, loop sync).
            best_t, bnx, bny, bnz, bab, btri = best0
        elif use_cull and use_sched:
            # Schedule mode: the per-tile candidate cluster list was
            # computed OUTSIDE the kernel this round (tile_schedule —
            # exact per-ray slab tests in plain XLA) and rides in as an
            # SMEM row: slot 0 = count, slots 1.. = cluster ids in
            # front-to-back entry order. The kernel is a straight
            # fori_loop over scalar ids — no slab pass, no while_loop, no
            # per-visit argmin, and crucially no vector->scalar SMEM
            # round-trips (the r3 decomposition measured the while-loop
            # traversal at 373 of 376 ms/round on the office bench).
            # Correctness does not depend on visit order or early exit:
            # the running min over every candidate IS the nearest hit.
            n_vis = sched_ref[0, 0, 0]

            def sched_visit(k, best):
                if diag == "noint":
                    # Diagnostic: the fori_loop + SMEM id read + VMEM
                    # dynamic slice WITHOUT the intersection math — times
                    # the per-visit loop machinery in isolation.
                    tri0 = pl.multiple_of(
                        sched_ref[0, 0, k + 1] * cluster_size, 8)
                    trn = coeff_ref[pl.ds(tri0, cluster_size), :]
                    best_t = jnp.minimum(best[0], trn[0:1, 0:1] + inf)
                    return (best_t,) + best[1:]
                return cluster_intersect(sched_ref[0, 0, k + 1], best)

            if sched_unroll > 1:
                # Process ``sched_unroll`` candidates per loop iteration to
                # amortize the fori_loop scalar machinery. The running min
                # is idempotent, so short lists re-visit their LAST valid
                # cluster for the pad slots (clamp below) — harmless
                # re-intersection instead of a branch. Empty lists (count
                # 0) never enter the loop.
                def sched_visit_u(k, best):
                    for j in range(sched_unroll):
                        kk = jnp.minimum(k * sched_unroll + j, n_vis - 1)
                        best = sched_visit(kk, best)
                    return best

                n_iter = (n_vis + sched_unroll - 1) // sched_unroll
                best = jax.lax.fori_loop(0, n_iter, sched_visit_u, best0)
            else:
                best = jax.lax.fori_loop(0, n_vis, sched_visit, best0)
            best_t, bnx, bny, bnz, bab, btri = best
            if count_visits:
                ltri = ltri + jnp.float32(1.0) * n_vis.astype(jnp.float32)
        elif use_cull:
            # Front-to-back cluster traversal — the TPU analog of ordered
            # BVH descent (the reference's OptiX GAS, AudioRenderer.cpp:95-
            # 218). Visibility culling alone leaves tens of reachable
            # clusters per tile in an open room (the kernel is intersect-
            # bound, not dispatch-bound), so ordering is what matters:
            #
            #   1. slab-test ALL clusters against the ray tile in one
            #      vectorized [C, 128] pass (cluster boxes broadcast from
            #      the sublane dim, rays from the lane dim),
            #   2. reduce to per-cluster entry distances entry_c [C, 1]
            #      (min over rays that can reach the box),
            #   3. intersect clusters in increasing-entry order (selection
            #      on demand: argmin of the unvisited entries, extracted
            #      through (1,1) SMEM scalars), terminating as soon as the
            #      nearest remaining entry is past EVERY alive ray's
            #      current best hit — per-ray entry >= cluster min entry >=
            #      max best_t >= that ray's best_t, so no deposit can
            #      change.
            #
            # Coherent compaction (position cell + direction octant) keeps
            # a tile's rays agreeing on that order, so typical visits per
            # bounce are a handful of clusters instead of every visible
            # one.
            eps_d = jnp.float32(1e-20)
            inv = lambda v: 1.0 / jnp.where(
                jnp.abs(v) > eps_d, v, jnp.where(v >= 0, eps_d, -eps_d))
            ivx, ivy, ivz = inv(vx), inv(vy), inv(vz)

            # Chunked slab pass: 16 clusters at a time, so every working
            # array is [16, 128] (2 vector registers). A single [C, 128]
            # pass keeps ~6 arrays of ~C/8 registers live and spills.
            entry_parts = []
            for j0 in range(0, n_clusters, _TRI_CHUNK):
                w = min(_TRI_CHUNK, n_clusters - j0)
                bx = lambda j: box_ref[j0:j0 + w, j:j + 1]     # [w, 1]
                t1 = (bx(0) - px) * ivx
                t2 = (bx(3) - px) * ivx                        # [w, 128]
                tn = jnp.minimum(t1, t2)
                tf = jnp.maximum(t1, t2)
                t1 = (bx(1) - py) * ivy
                t2 = (bx(4) - py) * ivy
                tn = jnp.maximum(tn, jnp.minimum(t1, t2))
                tf = jnp.minimum(tf, jnp.maximum(t1, t2))
                t1 = (bx(2) - pz) * ivz
                t2 = (bx(5) - pz) * ivz
                tn = jnp.maximum(tn, jnp.minimum(t1, t2))
                tf = jnp.minimum(tf, jnp.maximum(t1, t2))
                entry = jnp.maximum(tn, 0.0)
                # bx(6) is the box-valid flag: padding/empty boxes cannot
                # be rejected by the slab math alone.
                okc = (tf >= entry) & (bx(6) > 0.0) & alive    # [w, 128]
                entry_parts.append(jnp.min(jnp.where(okc, entry, inf),
                                           axis=1, keepdims=True))
            entry_c = (entry_parts[0] if len(entry_parts) == 1
                       else jnp.concatenate(entry_parts, axis=0))  # [C, 1]
            # Lane layout for the traversal selection state: a [C, 1]
            # column uses one lane of ~C/8 vector registers, so every
            # per-visit argmin/mask op costs ~20 registers; reshaped to
            # [1, C] (rows are contiguous, so this is a relayout, done
            # ONCE per bounce) the same ops cost ceil(C/128) registers.
            entry_t = entry_c.reshape(1, n_clusters)           # [1, C]
            iota_c = jax.lax.broadcasted_iota(
                jnp.int32, (1, n_clusters), 1)

            def next_cluster(visited):
                """Nearest unvisited reachable cluster: (entry, id) scalars
                extracted through the (1,1) SMEM scratch. entry == inf when
                nothing reachable remains."""
                rem = jnp.where(visited > 0.0, inf, entry_t)
                scr_f_ref[0, 0] = jnp.min(rem)
                tn_k = scr_f_ref[0, 0]
                sel = rem <= tn_k
                scr_i_ref[0, 0] = jnp.min(
                    jnp.where(sel, iota_c, n_clusters))
                return tn_k, scr_i_ref[0, 0]

            def worth(tn_k, best_t):
                # Some alive ray could still improve: its best hit is
                # farther than the nearest remaining cluster entry.
                scr_f_ref[0, 0] = jnp.max(jnp.where(alive, best_t, 0.0))
                return tn_k < scr_f_ref[0, 0]

            visited0 = jnp.zeros((1, n_clusters), jnp.float32)
            tn_0, c_0 = next_cluster(visited0)
            trav0 = (jnp.int32(0), tn_0, c_0, visited0, best0,
                     worth(tn_0, best0[0]))

            max_visits = 1 if diag == "sel1" else n_clusters

            def trav_body(carry):
                k, tn_k, c_id, visited, best, _ = carry
                if diag not in ("sel1", "noint"):
                    # sel1: selection cost, empty visit; noint: the FULL
                    # while-loop traversal with the intersection skipped
                    # (isolates selection/SMEM serialization from tri16
                    # compute; with no hits best_t stays inf so the loop
                    # visits every slab-hit cluster — exactly the visit
                    # count the real kernel pays, r3 finding).
                    best = cluster_intersect(c_id, best)
                visited = jnp.maximum(
                    visited, (iota_c == c_id).astype(jnp.float32))
                tn_k, c_id = next_cluster(visited)
                return (k + 1, tn_k, c_id, visited, best,
                        (k + 1 < max_visits) & worth(tn_k, best[0]))

            (k_vis, _, _, _, best, _) = jax.lax.while_loop(
                lambda c: c[5], trav_body, trav0)
            best_t, bnx, bny, bnz, bab, btri = best
            if count_visits and diag != "notrav":
                # Diagnostics: accumulate the number of cluster visits this
                # bounce into the (otherwise unused) LTRI column — every
                # lane of the tile carries the same count; benchmarks read
                # mean visits as sum(col)/(128 * bounces * tiles).
                ltri = ltri + jnp.float32(1.0) * k_vis.astype(jnp.float32)
        elif n_blocks > 0:
            # Rows layout WITHOUT culling (small scenes): intersect every
            # 16-triangle block on the VPU — no slab test, no traversal,
            # no MXU. Blocks are trimmed to ceil(valid/16), so a
            # 10-triangle reference scene costs ONE tri16 call per bounce
            # (the group-layout MXU path would pay two 6-pass HIGHEST
            # dot pipelines for the same work).
            def block_step(b, best):
                tri0 = pl.multiple_of(b * tri_block, 8)
                return tri16(coeff_ref[pl.ds(tri0, tri_block), :],
                             b * tri_block, best)

            if n_blocks <= 8:  # static unroll for tiny scenes
                best = best0
                for b in range(n_blocks):
                    best = block_step(b, best)
            else:
                best = jax.lax.fori_loop(0, n_blocks, block_step, best0)
            best_t, bnx, bny, bnz, bab, btri = best
        elif n_groups <= 32:
            # Static unroll lets Mosaic pipeline the small MXU dots across
            # groups; a fori_loop serializes them behind the carry.
            best = best0
            for g in range(n_groups):
                best = group_step(g, best)
            best_t, bnx, bny, bnz, bab, btri = best
        else:
            best_t, bnx, bny, bnz, bab, btri = jax.lax.fori_loop(
                0, n_groups, group_step, best0)

        # ---- receiver sphere ----
        ocx = px - s(C._S_RCX)
        ocy = py - s(C._S_RCY)
        ocz = pz - s(C._S_RCZ)
        b = ocx * vx + ocy * vy + ocz * vz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - s(C._S_R2)
        disc = b * b - cc
        sph_hit = disc > 0.0
        sq = jnp.sqrt(jnp.where(sph_hit, disc, 0.0))
        t1 = -b - sq
        t2 = -b + sq
        t_sph = jnp.where(sph_hit & (t1 > constants.T_MIN), t1,
                          jnp.where(sph_hit & (t2 > constants.T_MIN), t2, inf))
        chord = t2 - t1

        receiver = alive & (t_sph < best_t)
        surface = alive & jnp.logical_not(receiver) & (best_t < inf)
        miss = alive & jnp.logical_not(receiver) & jnp.logical_not(surface)

        t_sph_safe = jnp.where(t_sph < inf, t_sph, 0.0)
        dist_r = dist + t_sph_safe
        hx = px + t_sph_safe * vx - s(C._S_RCX)
        hz = pz + t_sph_safe * vz - s(C._S_RCZ)
        local_z = -s(C._S_SINY) * hx + s(C._S_COSY) * hz
        ear = (local_z >= 0.0).astype(jnp.float32)
        ev_bin = jnp.where(receiver, dist_r * s(C._S_BINRATE), ev_bin)
        ev_w = tuple(jnp.where(receiver, energy[b] * chord, ev_w[b])
                     for b in range(n_bands))
        ev_ear = jnp.where(receiver, ear, ev_ear)

        t_hit = jnp.where(best_t < inf, best_t, 0.0)
        dn = vx * bnx + vy * bny + vz * bnz
        rx = vx - 2.0 * dn * bnx
        ry = vy - 2.0 * dn * bny
        rz = vz - 2.0 * dn * bnz
        eps = jnp.float32(constants.BOUNCE_EPSILON)
        px = jnp.where(surface, px + t_hit * vx + eps * rx, px)
        py = jnp.where(surface, py + t_hit * vy + eps * ry, py)
        pz = jnp.where(surface, pz + t_hit * vz + eps * rz, pz)
        vx = jnp.where(surface, rx, vx)
        vy = jnp.where(surface, ry, vy)
        vz = jnp.where(surface, rz, vz)
        dist = jnp.where(surface, dist + t_hit, dist)
        energy = tuple(
            jnp.where(surface, energy[b] * (1.0 - bab[b]), energy[b])
            for b in range(n_bands))
        # Topology recording: triangle id (+1) bounced this round and the
        # bounce depth at which the receiver was entered (sticky). depth is
        # read pre-increment — receiver rays are not surface rays, so their
        # depth equals the number of completed bounces = the replay step.
        if not count_visits:  # visit counting borrows the LTRI column
            ltri = jnp.where(surface, btri, ltri)
        recvd = jnp.where(receiver, depth, recvd)
        depth = jnp.where(surface, depth + 1.0, depth)
        newly_done = receiver | miss | jnp.logical_not(can_continue)
        done = jnp.maximum(done, newly_done.astype(jnp.float32))

        return (i + 1, px, py, pz, vx, vy, vz, dist, energy, depth, done,
                ev_bin, ev_w, ev_ear, ltri, recvd)

    if single_bounce:
        # Budget-1 rounds (every clustered round): the bounce body runs
        # straight-line, no while_loop — the body is already a no-op for
        # done rays (every update is alive/surface/receiver-masked), and
        # Mosaic compiles loop-free kernels dramatically faster through
        # the remote tunnel.
        out = body(init)
    else:
        if unroll > 1:
            # Check the all-dead exit (a vector->scalar crossing that
            # stalls the pipeline) every `unroll` bounces instead of every
            # bounce; intermediate bodies are no-ops for finished rays, so
            # overshooting a budget that is not an unroll multiple only
            # costs masked work (depth/can_continue still cap physics).
            def body_u(carry):
                for _ in range(unroll):
                    carry = body(carry)
                return carry
        else:
            body_u = body
        out = jax.lax.while_loop(cond, body_u, init)
    (_, px, py, pz, vx, vy, vz, dist, energy, depth, done,
     ev_bin, ev_w, ev_ear, ltri, recvd) = out

    ncols = state_ncols(n_bands)
    writes = {C._C_PX: px, C._C_PY: py, C._C_PZ: pz,
              C._C_VX: vx, C._C_VY: vy, C._C_VZ: vz,
              C._C_DIST: dist, C._C_DEPTH: depth, C._C_DONE: done,
              C._C_EVB: ev_bin, C._C_EVE: ev_ear,
              C._C_RAYID: col(C._C_RAYID), C._C_LTRI: ltri,
              C._C_RECVD: recvd}
    for b, (ek, wk) in enumerate(zip(en_cols, evw_cols)):
        writes[ek] = energy[b]
        writes[wk] = ev_w[b]
    for k in range(ncols):
        out_ref[0, k] = writes.get(k, zero)


# "high" (alias "split3") is a manual 3-pass bf16 hi/lo decomposition (see
# _hl in the kernel) — Mosaic rejects lax.Precision.HIGH, so the 3-pass
# variant is hand-rolled; ~2x MXU throughput vs "highest" at ~2^-17 relative
# error.
_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,  # 6-pass bf16 == f32
               "default": jax.lax.Precision.DEFAULT}  # single-pass bf16
_PRECISION_NAMES = ("highest", "default", "high", "split3")


def trace_round_v2(state, coeffs, attrs, boxes, scal,
                   params: TraceParams, round_budget,
                   interpret: bool = False,
                   precision: str = "highest",
                   count_visits: bool = False,
                   diag: str = "full",
                   n_active_tiles: jax.Array | None = None,
                   sched: jax.Array | None = None,
                   single_bounce: bool | None = None,
                   unroll: int = 1,
                   tri_block: int = _TRI_CHUNK,
                   sched_unroll: int = 1,
                   tiles_per_pose: int | None = None) -> jax.Array:
    """Advance every ray by up to ``round_budget`` bounces (v2 layout).

    ``round_budget`` may be a Python int or a traced scalar — it rides in
    the scalar row (slot _S_BUDGET), so rounds with different budgets reuse
    one compiled kernel.

    ``state``: [n_tiles, NCOLS, 1, 128] (see ``to_tiles``/``from_tiles``).
    ``boxes``: [n_clusters, 8] cluster AABBs or None (no culling). With
    boxes set, the kernel runs the front-to-back traversal (boxes live in
    VMEM for the vectorized [C, 128] slab pass).
    ``precision``: MXU passes for the intersection dots — "highest"
    (bit-parity with the f32 oracle) or "high" (alias "split3"; 3-pass
    bf16, ~2x MXU throughput; geometry error ~2^-17 relative, below the
    tracer's own 1e-7 barycentric epsilons). Only the group-layout
    (unclustered) path uses the MXU; the cluster path's VPU intersection
    ignores precision entirely.
    ``n_active_tiles``: optional traced scalar — run the kernel grid over
    only the first n tiles (rays must be alive-first-compacted; skipped
    tiles keep their state through the aliased buffer).
    ``sched``: optional int32 [n_tiles, S] per-tile candidate cluster rows
    from :func:`tile_schedule` (slot 0 count, slots 1.. ids). Replaces the
    in-kernel slab + front-to-back while-loop with a plain fori_loop over
    prefetched scalar ids; ONLY valid with round_budget == 1 (positions
    move after a bounce, staling the schedule).
    ``tiles_per_pose``: pose-batched launches — ``scal`` then carries one
    scalar row PER POSE ([P, _NSCAL]) and tile i reads row
    i // tiles_per_pose, so one kernel traces P different
    (emitter, receiver, yaw) poses over a pose-major ray state. The
    kernel body is unchanged; only the SMEM block index map differs.
    """
    if precision not in _PRECISION_NAMES:
        raise ValueError(f"pallas_precision must be one of "
                         f"{_PRECISION_NAMES}, got {precision!r}")
    n_tiles = state.shape[0]
    ncols = state.shape[1]
    n_bands = params.n_bands
    assert ncols == state_ncols(n_bands), (ncols, n_bands)
    scal = scal.at[:, v1._S_BUDGET].set(
        jnp.asarray(round_budget, jnp.float32))
    use_cull = boxes is not None
    rows_layout = attrs is None
    if rows_layout and coeffs.shape[0] % tri_block:
        raise ValueError(f"{coeffs.shape[0]} triangle rows not a multiple "
                         f"of tri_block={tri_block}")
    n_blocks = (coeffs.shape[0] // tri_block
                if rows_layout and not use_cull else 0)
    cluster_size = (coeffs.shape[0] // boxes.shape[0]) if use_cull else 128
    if use_cull and cluster_size % tri_block:
        raise ValueError(f"cluster size {cluster_size} not a multiple of "
                         f"tri_block={tri_block}")
    use_sched = sched is not None
    if use_sched and not use_cull:
        raise ValueError("sched requires a clustered (boxes) scene")
    if use_sched and isinstance(round_budget, int) and round_budget != 1:
        # Candidate lists are computed from pre-round positions; a second
        # bounce in the same round would silently miss clusters its rays
        # moved into (the docstring's precondition, now enforced).
        raise ValueError(f"sched requires round_budget == 1, got "
                         f"{round_budget}")
    if boxes is None:
        boxes = jnp.zeros((1, 8), jnp.float32)
    if attrs is None:  # rows layout: everything lives in coeffs' rows
        attrs = jnp.zeros((8, 8), jnp.float32)
    t_total = attrs.shape[0]
    kernel = functools.partial(
        _trace_round_kernel_v2, n_groups=t_total // _GROUP,
        max_bounces=params.max_bounces,
        n_clusters=boxes.shape[0], use_cull=use_cull,
        n_bands=n_bands, n_blocks=n_blocks, cluster_size=cluster_size,
        use_sched=use_sched,
        single_bounce=use_sched if single_bounce is None else single_bounce,
        unroll=unroll, precision=precision,
        count_visits=count_visits, diag=diag, tri_block=tri_block,
        sched_unroll=sched_unroll)
    grid = (n_tiles if n_active_tiles is None else n_active_tiles,)
    if tiles_per_pose is None:
        scal_block = (1, v1._NSCAL)
        scal_map = lambda i: (0, 0)
    else:
        if n_tiles % tiles_per_pose:
            raise ValueError(f"{n_tiles} tiles not a multiple of "
                             f"tiles_per_pose={tiles_per_pose}")
        if scal.shape[0] != n_tiles // tiles_per_pose:
            raise ValueError(f"scal has {scal.shape[0]} pose rows for "
                             f"{n_tiles // tiles_per_pose} pose groups")
        # Mosaic's block rule wants the trailing dims divisible by (8, 128)
        # or equal to the array's — a (1, 16) block over a [P, 16] array is
        # rejected on real hardware (interpret mode does not enforce this).
        # Replicate each pose row x8 so blocks are (8, 16): the kernel
        # still reads row 0 of its block.
        scal = jnp.repeat(scal, 8, axis=0)
        scal_block = (8, v1._NSCAL)
        scal_map = lambda i: (i // tiles_per_pose, 0)
    in_specs = [
        pl.BlockSpec(scal_block, scal_map,
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(coeffs.shape, lambda i: (0, 0)),
        pl.BlockSpec(attrs.shape, lambda i: (0, 0)),
        pl.BlockSpec(boxes.shape, lambda i: (0, 0)),
    ]
    operands = [scal, coeffs, attrs, boxes]
    state_in_idx = 4
    if use_sched:
        # Per-tile candidate row streamed into SMEM each grid step: slot 0
        # is the candidate count, slots 1.. the cluster ids front-to-back.
        # The row rides as [n_tiles, 1, S] so the block's trailing two dims
        # (1, S) equal the array dims (Mosaic's block-shape rule).
        in_specs.append(pl.BlockSpec((1, 1, sched.shape[-1]),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(sched.reshape(sched.shape[0], 1, sched.shape[-1]))
        state_in_idx = 5
    in_specs.append(pl.BlockSpec((1, ncols, 1, _LANES),
                                 lambda i: (i, 0, 0, 0)))
    operands.append(state)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ncols, 1, _LANES),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.float32),
        input_output_aliases={state_in_idx: 0},
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32),
                        pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(*operands)


def tile_schedule_interval(tiles: jax.Array, boxes: jax.Array,
                           chunk: int = 512) -> jax.Array:
    """:func:`tile_schedule` via per-TILE interval arithmetic — ~128x less
    schedule-stage compute, conservatively superset candidates.

    Instead of exact slab tests for every (ray, cluster) pair reduced over
    the tile (cost n_rays x C), each tile is summarized by the interval
    hull of its alive rays' positions and direction components, and ONE
    interval slab test per (tile, cluster) bounds every ray's entry/exit
    (cost n_tiles x C). Interval arithmetic guarantees the reachable set
    is a SUPERSET of the exact tile union (tests pin this property), so
    the kernel's running min still sees every true candidate — extra
    candidates only cost visit time. After the dir72 coherent sort, tiles
    are position- and direction-coherent, so the hull is tight and the
    measured inflation is small on early rounds (it decays as compaction
    coherence does). Direction axes whose interval spans zero fall back to
    "unconstrained" (near 0, far inf) — rare inside one dir72 bin.

    Returns the same int32 [n_tiles, S] rows as :func:`tile_schedule`.
    """
    n_tiles = tiles.shape[0]
    C = boxes.shape[0]
    S = -(-(C + 1) // 8) * 8
    blo = boxes[:, 0:3]                                   # [C, 3]
    bhi = boxes[:, 3:6]
    bval = boxes[:, 6] > 0.0
    eps = jnp.float32(1e-20)
    big = jnp.float32(3e38)

    def chunk_rows(tc):
        k = tc.shape[0]
        p = tc[:, v1._C_PX:v1._C_PZ + 1, 0, :]            # [k, 3, 128]
        v = tc[:, v1._C_VX:v1._C_VZ + 1, 0, :]
        alive = (tc[:, v1._C_DONE, 0, :] == 0.0)[:, None, :]
        any_alive = jnp.any(alive[:, 0, :], axis=1)       # [k]
        pmin = jnp.min(jnp.where(alive, p, big), axis=2)  # [k, 3]
        pmax = jnp.max(jnp.where(alive, p, -big), axis=2)
        vmin = jnp.min(jnp.where(alive, v, big), axis=2)
        vmax = jnp.max(jnp.where(alive, v, -big), axis=2)
        # Reciprocal interval is only sign-stable when the direction
        # interval avoids 0; other axes are unconstrained below.
        ok_axis = (vmin > eps) | (vmax < -eps)            # [k, 3]
        imin = 1.0 / jnp.where(ok_axis, vmax, 1.0)
        imax = 1.0 / jnp.where(ok_axis, vmin, 1.0)
        # Slab offsets: d1 = lo - p in [lo - pmax, lo - pmin]; d2 likewise.
        d1min = blo.T[None] - pmax[:, :, None]            # [k, 3, C]
        d1max = blo.T[None] - pmin[:, :, None]
        d2min = bhi.T[None] - pmax[:, :, None]
        d2max = bhi.T[None] - pmin[:, :, None]
        ilo = imin[:, :, None]
        ihi = imax[:, :, None]

        def imul_bounds(amin, amax):
            ps = (amin * ilo, amin * ihi, amax * ilo, amax * ihi)
            lo = jnp.minimum(jnp.minimum(ps[0], ps[1]),
                             jnp.minimum(ps[2], ps[3]))
            hi = jnp.maximum(jnp.maximum(ps[0], ps[1]),
                             jnp.maximum(ps[2], ps[3]))
            return lo, hi

        t1lo, t1hi = imul_bounds(d1min, d1max)
        t2lo, t2hi = imul_bounds(d2min, d2max)
        near_lo = jnp.minimum(t1lo, t2lo)                 # [k, 3, C]
        far_hi = jnp.maximum(t1hi, t2hi)
        okx = ok_axis[:, :, None]
        near_lo = jnp.where(okx, near_lo, -big)
        far_hi = jnp.where(okx, far_hi, big)
        tn_lo = jnp.max(near_lo, axis=1)                  # [k, C]
        tf_hi = jnp.min(far_hi, axis=1)
        entry_lo = jnp.maximum(tn_lo, 0.0)
        reach = ((tf_hi >= entry_lo) & bval[None, :]
                 & any_alive[:, None])
        count = jnp.sum(reach, axis=1, dtype=jnp.int32)
        order = jnp.argsort(jnp.where(reach, 0, 1), axis=1,
                            stable=True).astype(jnp.int32)
        pad = jnp.zeros((k, S - C - 1), jnp.int32)
        return jnp.concatenate([count[:, None], order, pad], axis=1)

    n_pad_tiles = -(-n_tiles // chunk) * chunk
    if n_pad_tiles != n_tiles:
        filler = jnp.ones((n_pad_tiles - n_tiles,) + tiles.shape[1:],
                          tiles.dtype)  # done=1 everywhere -> count 0
        tiles = jnp.concatenate([tiles, filler], axis=0)
    rows = jax.lax.map(chunk_rows,
                       tiles.reshape(n_pad_tiles // chunk, chunk,
                                     *tiles.shape[1:]))
    return rows.reshape(n_pad_tiles, S)[:n_tiles]


def tile_schedule_twostage(tiles: jax.Array, boxes: jax.Array,
                           cap: int = 256, chunk: int = 64) -> jax.Array:
    """Two-stage schedule: interval prefilter, then EXACT per-ray slab
    tests over only the prefiltered candidate subset (VERDICT r5 #2).

    Stage 1 (:func:`tile_schedule_interval`, ~1/128 the exact cost)
    produces a conservative superset per tile; stage 2 gathers those
    ``cap`` cluster boxes and runs the exact per-ray tests against them
    alone — cost rays x cap instead of rays x C. Tiles whose stage-1
    count exceeds ``cap`` keep their (correct, superset) interval rows,
    so the result is always a superset of the exact schedule and the
    kernel's running min is unaffected. Non-overflow tiles get exactly
    the exact schedule's candidate set.
    """
    n_tiles = tiles.shape[0]
    C = boxes.shape[0]
    S = -(-(C + 1) // 8) * 8
    # The interval rows carry at most C real candidate ids (slots past C
    # are pad zeros — gathering them would duplicate cluster 0 in the
    # exact-test set and inflate the count slot).
    cap = min(cap, C)
    rows_iv = tile_schedule_interval(tiles, boxes)
    blo = boxes[:, 0:3]
    bhi = boxes[:, 3:6]
    bval = boxes[:, 6] > 0.0
    eps = jnp.float32(1e-20)

    def chunk_rows(args):
        tc, riv = args
        k = tc.shape[0]
        cand = riv[:, 1:cap + 1]                      # [k, cap] ids
        lo = blo[cand]                                # [k, cap, 3]
        hi = bhi[cand]
        val = bval[cand]                              # [k, cap]
        p = tc[:, v1._C_PX:v1._C_PZ + 1, 0, :]        # [k, 3, 128]
        v = tc[:, v1._C_VX:v1._C_VZ + 1, 0, :]
        done = tc[:, v1._C_DONE, 0, :]
        inv = 1.0 / jnp.where(jnp.abs(v) > eps, v,
                              jnp.where(v >= 0, eps, -eps))
        t1 = (lo.transpose(0, 2, 1)[:, :, :, None]
              - p[:, :, None, :]) * inv[:, :, None, :]  # [k, 3, cap, 128]
        t2 = (hi.transpose(0, 2, 1)[:, :, :, None]
              - p[:, :, None, :]) * inv[:, :, None, :]
        tn = jnp.max(jnp.minimum(t1, t2), axis=1)     # [k, cap, 128]
        tf = jnp.min(jnp.maximum(t1, t2), axis=1)
        entry = jnp.maximum(tn, 0.0)
        ok = ((tf >= entry) & val[:, :, None]
              & (done[:, None, :] == 0.0))
        reach = jnp.any(ok, axis=2)                   # [k, cap]
        count = jnp.sum(reach, axis=1, dtype=jnp.int32)
        order = jnp.argsort(jnp.where(reach, 0, 1), axis=1,
                            stable=True).astype(jnp.int32)
        ids_sorted = jnp.take_along_axis(cand, order, axis=1)
        pad = jnp.zeros((k, S - cap - 1), jnp.int32)
        row = jnp.concatenate([count[:, None], ids_sorted, pad], axis=1)
        overflow = riv[:, 0] > cap
        return jnp.where(overflow[:, None], riv, row)

    n_pad_tiles = -(-n_tiles // chunk) * chunk
    if n_pad_tiles != n_tiles:
        filler = jnp.ones((n_pad_tiles - n_tiles,) + tiles.shape[1:],
                          tiles.dtype)
        tiles = jnp.concatenate([tiles, filler], axis=0)
        rows_iv = jnp.concatenate(
            [rows_iv, jnp.zeros((n_pad_tiles - n_tiles, S), jnp.int32)],
            axis=0)
    rows = jax.lax.map(
        chunk_rows,
        (tiles.reshape(n_pad_tiles // chunk, chunk, *tiles.shape[1:]),
         rows_iv.reshape(n_pad_tiles // chunk, chunk, S)))
    return rows.reshape(n_pad_tiles, S)[:n_tiles]


def tile_schedule(tiles: jax.Array, boxes: jax.Array,
                  chunk: int = 64, mode: str = "exact") -> jax.Array:
    """Per-round, per-tile candidate cluster lists, computed in plain XLA.

    For every 128-ray tile: exact per-ray slab tests against every cluster
    AABB (the same math the legacy in-kernel pass runs,
    raytrace_pallas_v2.py slab section), reduced to a per-cluster minimum
    entry distance over the tile's alive rays. Returns int32 [n_tiles, S]
    rows: slot 0 = number of candidate clusters, slots 1..count = the
    candidate cluster ids (ascending id order — NOT distance-sorted: the
    kernel's running min visits every candidate, so visit order cannot
    change the result, and the r3 front-to-back ``argsort`` over
    [tiles, C] f32 entries was pure waste; a cumsum compaction of the
    reachable set replaced it in r4). The kernel consumes rows via an SMEM
    block and just loops them — moving candidate SELECTION out of the
    kernel removes the per-visit vector->scalar SMEM round-trips that
    dominated the r3 profile (373 of 376 ms/round).

    Cost: n_rays x C slab tests per round — vectorized VPU work with no
    data-dependent control flow (~12.5 Gflop at 1M rays x 624 clusters),
    fused by XLA inside a lax.map over ``chunk``-tile blocks so the
    [tiles, C, 128] intermediates never hit HBM at full size.
    ``mode="interval"`` dispatches to :func:`tile_schedule_interval` (the
    r5 per-tile prefilter — ~128x cheaper, conservative superset);
    ``mode="twostage"`` to :func:`tile_schedule_twostage` (interval
    prefilter + exact tests over the subset).
    """
    if mode == "interval":
        return tile_schedule_interval(tiles, boxes)
    if mode == "twostage":
        return tile_schedule_twostage(tiles, boxes)
    if mode != "exact":
        raise ValueError(f"unknown tile_schedule mode {mode!r}; expected "
                         f"'exact', 'interval' or 'twostage'")
    n_tiles = tiles.shape[0]
    C = boxes.shape[0]
    S = -(-(C + 1) // 8) * 8
    blo = boxes[:, 0:3]
    bhi = boxes[:, 3:6]
    bval = boxes[:, 6] > 0.0
    eps = jnp.float32(1e-20)
    inf = jnp.float32(jnp.inf)

    def chunk_rows(tc):
        k = tc.shape[0]
        p = tc[:, v1._C_PX:v1._C_PZ + 1, 0, :]        # [k, 3, 128]
        v = tc[:, v1._C_VX:v1._C_VZ + 1, 0, :]
        done = tc[:, v1._C_DONE, 0, :]                # [k, 128]
        inv = 1.0 / jnp.where(jnp.abs(v) > eps, v,
                              jnp.where(v >= 0, eps, -eps))
        t1 = (blo.T[None, :, :, None] - p[:, :, None, :]) \
            * inv[:, :, None, :]                      # [k, 3, C, 128]
        t2 = (bhi.T[None, :, :, None] - p[:, :, None, :]) \
            * inv[:, :, None, :]
        tn = jnp.max(jnp.minimum(t1, t2), axis=1)     # [k, C, 128]
        tf = jnp.min(jnp.maximum(t1, t2), axis=1)
        entry = jnp.maximum(tn, 0.0)
        ok = ((tf >= entry) & bval[None, :, None]
              & (done[:, None, :] == 0.0))
        reach = jnp.any(ok, axis=2)                            # [k, C]
        count = jnp.sum(reach, axis=1, dtype=jnp.int32)
        # Stable partition via a boolean-key argsort: reachable ids first,
        # ascending id order within each class. (A cumsum + row-scatter
        # compaction was tried in r4 and measured ~1 s SLOWER end-to-end —
        # TPU row scatters lower poorly, the same lesson as the r3
        # partition study; the 1-bit sort is the cheap implementation.)
        order = jnp.argsort(jnp.where(reach, 0, 1), axis=1,
                            stable=True).astype(jnp.int32)
        pad = jnp.zeros((k, S - C - 1), jnp.int32)
        return jnp.concatenate([count[:, None], order, pad], axis=1)

    n_pad_tiles = -(-n_tiles // chunk) * chunk
    if n_pad_tiles != n_tiles:
        filler = jnp.ones((n_pad_tiles - n_tiles,) + tiles.shape[1:],
                          tiles.dtype)  # done=1 everywhere -> count 0
        tiles = jnp.concatenate([tiles, filler], axis=0)
    rows = jax.lax.map(chunk_rows,
                       tiles.reshape(n_pad_tiles // chunk, chunk,
                                     *tiles.shape[1:]))
    return rows.reshape(n_pad_tiles, S)[:n_tiles]


def to_tiles(state: jax.Array) -> jax.Array:
    """[N, ncols] -> [n_tiles, ncols, 1, 128] (N a multiple of 128)."""
    n, ncols = state.shape
    return state.reshape(n // _LANES, _LANES, ncols).transpose(0, 2, 1) \
        .reshape(n // _LANES, ncols, 1, _LANES)


def from_tiles(tiles: jax.Array) -> jax.Array:
    """Inverse of :func:`to_tiles`."""
    n_tiles, ncols = tiles.shape[0], tiles.shape[1]
    return tiles.reshape(n_tiles, ncols, _LANES).transpose(0, 2, 1) \
        .reshape(n_tiles * _LANES, ncols)
