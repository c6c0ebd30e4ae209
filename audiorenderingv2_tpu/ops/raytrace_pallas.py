"""Pallas TPU kernel: the fully-fused acoustic trace loop.

This is the speed-of-light path replacing the reference's OptiX launch
(devicePrograms.cu:192-254). The XLA tracer in core/tracer.py materializes
[rays, tris] intermediates to HBM on every bounce (measured ~20G pair-tests/s);
this kernel keeps the bounce loop on-chip and adds the scheduling the SIMT
model can't express:

  * grid over ray tiles; each tile of R rays advances in lockstep with all
    state resident in VMEM — triangle data (17 packed rows) is loaded once
    and reused across all bounces,
  * the per-bounce intersection processes R rays x 128-triangle lane chunks
    as pure VPU ops ([R, 1] ray state broadcast against [1, 128] triangle
    rows) — candidate t, barycentric inside-tests, running min — with the
    winning triangle's shading attributes (unit normal, absorption) extracted
    by masked lane reductions instead of gathers,
  * per-tile early exit: the while_loop ends as soon as every ray in the
    tile is done (receiver hit, miss, or past the distance/energy/bounce
    limits); an all-done tile costs zero bounce iterations,
  * **ray compaction between bounce rounds**: tracing runs in rounds with
    geometrically growing bounce budgets; between rounds the (still
    on-device) ray state is sorted alive-first, so surviving long-tail rays
    pack into a few dense tiles instead of keeping every tile alive. This is
    the TPU answer to SIMT divergence: the reference's 1M-thread launch pays
    for its longest ray per warp; here the tail of deep rays collapses into
    a fraction of the grid.

Ray state lives in one [N, 16] float32 array (columns below) that is kernel
input AND aliased output, so rounds chain without copies; compaction is one
argsort + gather between rounds. Events (fractional arrival bin, deposited
energy, ear) ride along as state columns and feed the sort-based histogram
in core/binning.py. Physics matches core/tracer.py and the numpy oracle
exactly (tests/test_pallas.py). Forward-only: gradients use the XLA scan.
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

_LANES = 128
# Packed triangle-data row indices (see pack_tris).
_ROWS = 17
(_PNX, _PNY, _PNZ, _PD,
 _AUX, _AUY, _AUZ, _AUO,
 _AVX, _AVY, _AVZ, _AVO,
 _NX, _NY, _NZ, _ABS, _VAL) = range(_ROWS)

# Scalar-parameter slots (see _scalars). _S_BUDGET carries the per-round
# bounce budget as a runtime value so every round of a schedule shares ONE
# compiled kernel (budgets stay far below 2^24, f32-exact); _S_PAD14 carries
# the native-RNG seed on the init kernel.
_NSCAL = 16
(_S_EMX, _S_EMY, _S_EMZ, _S_RCX, _S_RCY, _S_RCZ,
 _S_SINY, _S_COSY, _S_E0, _S_ETHR, _S_DTHR, _S_BINRATE,
 _S_R2, _S_BUDGET, _S_PAD14, _S_PAD15) = range(_NSCAL)

# Ray-state columns ([N, 16] float32; banded v2 runs extend to 24 — see
# raytrace_pallas_v2.state_ncols / _band_cols). Columns 13-15 are only
# written in topology-recording mode (diff/replay.record_paths_pallas):
# RAYID = original launch index (f32-exact below 2^24, riding through the
# compaction permutations), LTRI = 1 + id of the triangle bounced off in
# the current 1-bounce round (0 = no bounce), RECVD = bounce depth at which
# the receiver was entered (-1 = never), all as f32.
_NCOLS = 16
(_C_PX, _C_PY, _C_PZ, _C_VX, _C_VY, _C_VZ,
 _C_DIST, _C_EN, _C_DEPTH, _C_DONE,
 _C_EVB, _C_EVW, _C_EVE, _C_RAYID, _C_LTRI, _C_RECVD) = range(_NCOLS)

# Cluster-AABB rows ([8, n_clusters] float32; see accel.ClusterData).
_CLUS_ROWS = 8
(_B_LOX, _B_LOY, _B_LOZ, _B_HIX, _B_HIY, _B_HIZ,
 _B_PAD6, _B_PAD7) = range(_CLUS_ROWS)


def pack_tris(sc: SceneArrays) -> jax.Array:
    """Pack scene arrays into the [17, T] row layout the kernel consumes."""
    rows = jnp.stack([
        sc.plane_n[:, 0], sc.plane_n[:, 1], sc.plane_n[:, 2], sc.plane_d,
        sc.bary_u[:, 0], sc.bary_u[:, 1], sc.bary_u[:, 2], sc.u_off,
        sc.bary_v[:, 0], sc.bary_v[:, 1], sc.bary_v[:, 2], sc.v_off,
        sc.normal[:, 0], sc.normal[:, 1], sc.normal[:, 2],
        sc.absorption, sc.valid,
    ])
    return rows.astype(jnp.float32)


def _scalars(emitter, rec, yaw_rad, e0, params: TraceParams) -> jax.Array:
    vals = jnp.zeros((1, _NSCAL), jnp.float32)
    vals = vals.at[0, _S_EMX].set(emitter[0]).at[0, _S_EMY].set(emitter[1]).at[0, _S_EMZ].set(emitter[2])
    vals = vals.at[0, _S_RCX].set(rec[0]).at[0, _S_RCY].set(rec[1]).at[0, _S_RCZ].set(rec[2])
    vals = vals.at[0, _S_SINY].set(jnp.sin(yaw_rad)).at[0, _S_COSY].set(jnp.cos(yaw_rad))
    vals = vals.at[0, _S_E0].set(e0)
    vals = vals.at[0, _S_ETHR].set(params.energy_threshold)
    vals = vals.at[0, _S_DTHR].set(params.distance_threshold)
    vals = vals.at[0, _S_BINRATE].set(params.sample_rate / constants.SPEED_OF_SOUND)
    vals = vals.at[0, _S_R2].set(constants.RECEIVER_RADIUS ** 2)
    return vals


def init_state(directions: jax.Array, emitter: jax.Array, e0,
               n_pad: int, ncols: int = _NCOLS,
               en_cols: tuple = (_C_EN,)) -> jax.Array:
    """Build the [n_pad, ncols] initial ray state; pad rays start done.
    ``en_cols``: per-band energy columns, all initialized to e0."""
    n = directions.shape[0]
    state = jnp.zeros((n_pad, ncols), jnp.float32)
    state = state.at[:, _C_PX].set(emitter[0])
    state = state.at[:, _C_PY].set(emitter[1])
    state = state.at[:, _C_PZ].set(emitter[2])
    state = state.at[:n, _C_VX].set(directions[:, 0])
    state = state.at[:n, _C_VY].set(directions[:, 1])
    state = state.at[:n, _C_VZ].set(directions[:, 2])
    for c in en_cols:
        state = state.at[:n, c].set(e0)
    if n_pad > n:
        state = state.at[n:, _C_DONE].set(1.0)
    return state


def _trace_round_kernel(scal_ref, tris_ref, state_ref, out_ref,
                        *, rays_per_tile: int, n_chunks: int,
                        max_bounces: int, round_budget: int):
    r = rays_per_tile
    s = lambda j: scal_ref[0, j]
    inf = jnp.float32(jnp.inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, _LANES), 1)
    col = lambda k: state_ref[:, k:k + 1]
    zero = jnp.zeros((r, 1), jnp.float32)

    init = (
        jnp.int32(0),
        col(_C_PX), col(_C_PY), col(_C_PZ),
        col(_C_VX), col(_C_VY), col(_C_VZ),
        col(_C_DIST), col(_C_EN), col(_C_DEPTH), col(_C_DONE),
        col(_C_EVB), col(_C_EVW), col(_C_EVE),
    )

    def cond(carry):
        i = carry[0]
        done = carry[10]
        return (i < round_budget) & (jnp.max(1.0 - done) > 0.0)

    def body(carry):
        (i, px, py, pz, vx, vy, vz, dist, energy, depth, done,
         ev_bin, ev_w, ev_ear) = carry

        can_continue = ((dist < s(_S_DTHR)) & (energy > s(_S_ETHR))
                        & (depth < jnp.float32(max_bounces)))
        alive = (done == 0.0) & can_continue

        # ---- nearest triangle: loop lane-chunks of 128 triangles ----
        best_t = jnp.full((r, 1), inf)
        best_nx = zero
        best_ny = zero
        best_nz = zero
        best_ab = zero

        for c in range(n_chunks):  # static unroll; tri rows stay in VMEM
            tr = tris_ref[:, c * _LANES:(c + 1) * _LANES]
            row = lambda k: tr[k:k + 1, :]  # [1, 128]
            nd = vx * row(_PNX) + vy * row(_PNY) + vz * row(_PNZ)
            no = px * row(_PNX) + py * row(_PNY) + pz * row(_PNZ) + row(_PD)
            safe = jnp.abs(nd) > 1e-12
            t = -no / jnp.where(safe, nd, 1.0)
            ou = px * row(_AUX) + py * row(_AUY) + pz * row(_AUZ) + row(_AUO)
            du = vx * row(_AUX) + vy * row(_AUY) + vz * row(_AUZ)
            u = ou + t * du
            ov = px * row(_AVX) + py * row(_AVY) + pz * row(_AVZ) + row(_AVO)
            dv = vx * row(_AVX) + vy * row(_AVY) + vz * row(_AVZ)
            v = ov + t * dv
            ok = (safe & (t > constants.T_MIN)
                  & (u >= -1e-7) & (v >= -1e-7) & (u + v <= 1.0 + 1e-7)
                  & (row(_VAL) > 0))
            tm = jnp.where(ok, t, inf)
            ct = jnp.min(tm, axis=1, keepdims=True)            # [r, 1]
            better = ct < best_t
            # winner lane (first lane on ties == argmin semantics)
            win_lane = jnp.min(jnp.where(tm <= ct, lane, _LANES),
                               axis=1, keepdims=True)
            win = (lane == win_lane)
            pick = lambda k: jnp.sum(jnp.where(win, row(k), 0.0),
                                     axis=1, keepdims=True)
            best_nx = jnp.where(better, pick(_NX), best_nx)
            best_ny = jnp.where(better, pick(_NY), best_ny)
            best_nz = jnp.where(better, pick(_NZ), best_nz)
            best_ab = jnp.where(better, pick(_ABS), best_ab)
            best_t = jnp.where(better, ct, best_t)

        # ---- receiver sphere (devicePrograms.cu:91-122) ----
        ocx = px - s(_S_RCX)
        ocy = py - s(_S_RCY)
        ocz = pz - s(_S_RCZ)
        b = ocx * vx + ocy * vy + ocz * vz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - s(_S_R2)
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

        # receiver event: bin, energy*chord, ear from head-local z sign
        t_sph_safe = jnp.where(t_sph < inf, t_sph, 0.0)
        dist_r = dist + t_sph_safe
        hx = px + t_sph_safe * vx - s(_S_RCX)
        hz = pz + t_sph_safe * vz - s(_S_RCZ)
        local_z = -s(_S_SINY) * hx + s(_S_COSY) * hz
        ear = (local_z >= 0.0).astype(jnp.float32)
        ev_bin = jnp.where(receiver, dist_r * s(_S_BINRATE), ev_bin)
        ev_w = jnp.where(receiver, energy * chord, ev_w)
        ev_ear = jnp.where(receiver, ear, ev_ear)

        # surface bounce: reflect, absorb, offset (devicePrograms.cu:171-179)
        t_hit = jnp.where(best_t < inf, best_t, 0.0)
        dn = vx * best_nx + vy * best_ny + vz * best_nz
        rx = vx - 2.0 * dn * best_nx
        ry = vy - 2.0 * dn * best_ny
        rz = vz - 2.0 * dn * best_nz
        eps = jnp.float32(constants.BOUNCE_EPSILON)
        px = jnp.where(surface, px + t_hit * vx + eps * rx, px)
        py = jnp.where(surface, py + t_hit * vy + eps * ry, py)
        pz = jnp.where(surface, pz + t_hit * vz + eps * rz, pz)
        vx = jnp.where(surface, rx, vx)
        vy = jnp.where(surface, ry, vy)
        vz = jnp.where(surface, rz, vz)
        dist = jnp.where(surface, dist + t_hit, dist)
        energy = jnp.where(surface, energy * (1.0 - best_ab), energy)
        depth = jnp.where(surface, depth + 1.0, depth)
        newly_done = receiver | miss | jnp.logical_not(can_continue)
        done = jnp.maximum(done, newly_done.astype(jnp.float32))

        return (i + 1, px, py, pz, vx, vy, vz, dist, energy, depth, done,
                ev_bin, ev_w, ev_ear)

    (_, px, py, pz, vx, vy, vz, dist, energy, depth, done,
     ev_bin, ev_w, ev_ear) = jax.lax.while_loop(cond, body, init)

    out_ref[:, _C_PX:_C_PX + 1] = px
    out_ref[:, _C_PY:_C_PY + 1] = py
    out_ref[:, _C_PZ:_C_PZ + 1] = pz
    out_ref[:, _C_VX:_C_VX + 1] = vx
    out_ref[:, _C_VY:_C_VY + 1] = vy
    out_ref[:, _C_VZ:_C_VZ + 1] = vz
    out_ref[:, _C_DIST:_C_DIST + 1] = dist
    out_ref[:, _C_EN:_C_EN + 1] = energy
    out_ref[:, _C_DEPTH:_C_DEPTH + 1] = depth
    out_ref[:, _C_DONE:_C_DONE + 1] = done
    out_ref[:, _C_EVB:_C_EVB + 1] = ev_bin
    out_ref[:, _C_EVW:_C_EVW + 1] = ev_w
    out_ref[:, _C_EVE:_C_EVE + 1] = ev_ear
    # v1 does not implement topology recording; the spare columns stay zero.
    out_ref[:, _C_RAYID:] = jnp.zeros((rays_per_tile, _NCOLS - _C_RAYID),
                                      jnp.float32)


def _morton_interleave(cell: jax.Array, bits: int) -> jax.Array:
    """Interleave [N, 3] int32 per-axis cell coordinates into Morton codes
    (3*bits bits), so key-adjacent cells are spatially adjacent."""
    code = jnp.zeros(cell.shape[:1], jnp.int32)
    for b in range(bits):
        for ax in range(3):
            code = code | (((cell[:, ax] >> b) & 1) << (3 * b + ax))
    return code


def _compaction_keys(state: jax.Array, coherent: bool,
                     cell_bits: int = 3, dir_split: bool = False,
                     key_layout: str = "cell") -> jax.Array:
    """int32 sort keys for between-round compaction.

    Plain mode: done flag (alive rays first). Coherent mode (cluster-culled
    scenes): alive rays additionally grouped by position cell and direction
    bin, so rays landing in a tile tend to reach the same clusters and the
    per-tile culling actually skips work.

    ``key_layout``:
      * ``"cell"`` (legacy): row-major cell code major, direction bin minor.
        ``cell_bits`` per-axis grid (3 -> 8^3), ``dir_split`` splits octants
        by dominant axis (24 bins).
      * ``"dir72"``: direction-major — 72 direction bins (octant x dominant
        axis x second axis) in the HIGH bits, Morton-interleaved cell code
        in the low bits. Measured on the 20k-tri office mid-render
        population: mean slab-hit clusters per 128-ray tile drops 2934 ->
        2098 -> 1551 tests/ray-bounce at cluster sizes 128/64/32 vs 3419
        for the legacy 3:1 keys (docs/ROUND3.md culling study). Direction
        coherence bounds the frustum better than position at ~1M rays.

    Keys are int32 (exact to 2^31); the layout's full range (done flag x
    cells x direction bins) is validated eagerly."""
    done = state[:, _C_DONE].astype(jnp.int32)
    if not coherent:
        return done
    res = 1 << cell_bits
    p = state[:, _C_PX:_C_PZ + 1]
    v = state[:, _C_VX:_C_VZ + 1]
    pmin = jnp.min(p, axis=0)
    pmax = jnp.max(p, axis=0)
    cell = jnp.clip(((p - pmin) / jnp.maximum(pmax - pmin, 1e-6)
                     * (res - 0.001)).astype(jnp.int32), 0, res - 1)
    octant = ((v[:, 0] > 0).astype(jnp.int32) * 4
              + (v[:, 1] > 0).astype(jnp.int32) * 2
              + (v[:, 2] > 0).astype(jnp.int32))
    av = jnp.abs(v)
    if key_layout == "dir72":
        if 2 * 72 * (1 << (3 * cell_bits)) > 1 << 31:
            raise ValueError(
                f"cell_bits={cell_bits} with dir72 keys overflows int32; "
                f"use cell_bits <= 7")
        code = _morton_interleave(cell, cell_bits)
        a0 = jnp.where((av[:, 0] >= av[:, 1]) & (av[:, 0] >= av[:, 2]), 0,
                       jnp.where(av[:, 1] >= av[:, 2], 1, 2))
        iota3 = jnp.arange(3, dtype=jnp.int32)
        av2 = jnp.where(iota3[None, :] == a0[:, None], -jnp.inf, av)
        a1 = jnp.where((av2[:, 0] >= av2[:, 1]) & (av2[:, 0] >= av2[:, 2]),
                       0, jnp.where(av2[:, 1] >= av2[:, 2], 1, 2))
        dirbin = (octant * 9 + a0 * 3 + a1).astype(jnp.int32)
        return done * (72 * res ** 3) + dirbin * res ** 3 + code
    if key_layout != "cell":
        raise ValueError(f"key_layout must be 'cell' or 'dir72', "
                         f"got {key_layout!r}")
    n_dir_max = 24 if dir_split else 8
    if 2 * (1 << (3 * cell_bits)) * n_dir_max > 1 << 31:
        raise ValueError(
            f"cell_bits={cell_bits} with dir_split={dir_split} pushes the "
            f"compaction key range past int32. Use cell_bits <= 8.")
    code = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
    if dir_split:
        axis = jnp.where(
            (av[:, 0] >= av[:, 1]) & (av[:, 0] >= av[:, 2]), 0,
            jnp.where(av[:, 1] >= av[:, 2], 1, 2))
        dirbin = octant * 3 + axis
        n_dir = 24
    else:
        dirbin = octant
        n_dir = 8
    key_range = res ** 3 * n_dir
    return done * key_range + code * n_dir + dirbin


def _partition_alive_first(state: jax.Array,
                           mode: str = "scatter") -> jax.Array:
    """Stable alive-first reorder of the ray state.

    The key is a single bit, so a full sort is overkill: two cumsums give
    each ray its destination slot. Three ways to apply the permutation
    (benchmarks/partition_bench.py measures all on chip):

      ``"scatter"``  — scatter iota at dest (inverts the permutation), one
        row gather applies it. Fastest measured: 0.08 ms at 1M x 16 on
        v5e (benchmarks/partition_bench.py; an earlier 35 ms reading from
        profile_small.py's standalone stage did not reproduce — the
        end-to-end schedule sweep confirms partitions are not a
        significant share of render time).
      ``"rowscatter"`` — scatter the state rows directly at dest; one pass,
        no inversion, no gather (134 ms — row scatters lower poorly).
      ``"sort"``     — stable 2-operand lax.sort on the done bit + iota,
        then a row gather (55 ms).
    """
    n = state.shape[0]
    done_col = state[:, _C_DONE]
    if mode == "sort":
        iota = jnp.arange(n, dtype=jnp.int32)
        _, perm = jax.lax.sort([(done_col != 0.0).astype(jnp.int32), iota],
                               num_keys=1, is_stable=True)
        return jnp.take(state, perm, axis=0)
    alive = (done_col == 0.0).astype(jnp.int32)
    ca = jnp.cumsum(alive)
    cd = jnp.cumsum(1 - alive)
    dest = jnp.where(alive > 0, ca - 1, ca[-1] + cd - 1)
    if mode == "rowscatter":
        return jnp.zeros_like(state).at[dest].set(
            state, unique_indices=True, mode="drop")
    if mode != "scatter":
        raise ValueError(f"partition mode must be 'scatter', 'rowscatter' "
                         f"or 'sort', got {mode!r}")
    perm = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True, mode="drop")
    return jnp.take(state, perm, axis=0)


def _sort_state_by_keys(state: jax.Array, keys: jax.Array,
                        mode: str = "gather") -> jax.Array:
    """Stable key sort of the ray state.

    ``mode="gather"`` (default): 2-operand (key, iota) sort producing the
    permutation, then ONE contiguous row gather of the state — the sort
    network carries 8 payload bytes per element instead of 100, and the
    gather of 64/96-byte rows runs at HBM bandwidth.
    ``mode="multi"``: one multi-operand lax.sort with every state column as
    payload (each compare-exchange moves the full row through the sort
    network; benchmarks/sort_bench.py measures both)."""
    if mode == "gather":
        iota = jnp.arange(state.shape[0], dtype=jnp.int32)
        _, perm = jax.lax.sort([keys, iota], num_keys=1, is_stable=True)
        return jnp.take(state, perm, axis=0)
    cols = [state[:, j] for j in range(state.shape[1])]
    out = jax.lax.sort([keys, *cols], num_keys=1, is_stable=True)
    return jnp.stack(out[1:], axis=1)


def _round_schedule(max_bounces: int, first: int = 6,
                    growth: int = 2) -> list[int]:
    """Geometric per-round bounce budgets summing to >= max_bounces.

    Early rounds are short (most rays die fast — escape or reach the
    receiver); later rounds are long but run on the compacted survivors.
    The r3 on-chip schedule sweep (benchmarks/partition_bench.py) confirms
    this default is near-optimal on the reference workload: [6,12,24,58]
    130.8 ms vs [6,94] 182 ms vs [100] 321 ms — compaction itself is
    cheap (<1 ms); what matters is not dragging dead tiles through deep
    rounds. The final round absorbs a sub-geometric remainder so a tiny
    tail round never pays a full grid sweep: 100 bounces -> [6, 12, 24, 58].
    """
    budgets = []
    total = 0
    b = first
    while total < max_bounces:
        remaining = max_bounces - total
        # take the whole remainder once it stops being worth another round
        b = remaining if remaining <= b + b // 2 else min(b, remaining)
        budgets.append(b)
        total += b
        b *= growth
    return budgets


def trace_round(state, tris_packed, scal, params: TraceParams,
                rays_per_tile: int, round_budget: int,
                interpret: bool = False) -> jax.Array:
    """Advance every ray by up to ``round_budget`` bounces."""
    n_pad = state.shape[0]
    r = rays_per_tile
    t_total = tris_packed.shape[1]
    n_chunks = t_total // _LANES
    kernel = functools.partial(
        _trace_round_kernel, rays_per_tile=r, n_chunks=n_chunks,
        max_bounces=params.max_bounces, round_budget=round_budget)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // r,),
        in_specs=[
            pl.BlockSpec((1, _NSCAL), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, t_total), lambda i: (0, 0)),
            pl.BlockSpec((r, _NCOLS), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((r, _NCOLS), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, _NCOLS), jnp.float32),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(scal, tris_packed, state)


@functools.partial(
    jax.jit,
    static_argnames=("params", "rays_per_tile", "n_total_rays", "interpret",
                     "compact", "version", "n_rays", "precision",
                     "cell_bits", "dir_split", "return_depth", "sort_mode",
                     "sort_interval", "round_budgets", "dynamic_grid",
                     "schedule_mode", "key_layout", "unroll",
                     "partition_mode", "tri_block", "sched_unroll",
                     "sched_prefilter"))
def trace_events_pallas(
    tris_packed,
    directions: jax.Array | None,
    emitter: jax.Array,
    receiver_pos: jax.Array,
    receiver_yaw_deg: jax.Array | float,
    params: TraceParams,
    rays_per_tile: int = 256,
    n_total_rays: int | None = None,
    interpret: bool = False,
    compact: bool = True,
    version: int = 1,
    native_rng_seed: jax.Array | None = None,
    n_rays: int | None = None,
    precision: str = "highest",
    cell_bits: int = 3,
    dir_split: bool = False,
    return_depth: bool = False,
    sort_mode: str = "gather",
    sort_interval: int = 1,
    round_budgets: tuple | None = None,
    dynamic_grid: bool = False,
    schedule_mode: bool = False,
    key_layout: str = "cell",
    unroll: int = 1,
    partition_mode: str = "scatter",
    tri_block: int = 16,
    sched_unroll: int = 1,
    sched_prefilter: str = "exact",
):
    """Trace rays with the fused kernel in compacting rounds.

    Args:
      tris_packed: [17, T] from :func:`pack_tris` (v1), or the
        (coeffs, attrs, boxes) from
        ``raytrace_pallas_v2.pack_tris_v2`` (v2);
        T a multiple of 128.
      directions: [N, 3] unit directions (padded internally to whole tiles),
        or None with ``native_rng_seed`` + ``n_rays`` set (v2 only): the
        init kernel then generates directions on-chip.
      compact: sort ray state alive-first between rounds (argsort + gather;
        disable only for debugging).
      version: 1 = rays-in-sublanes kernel, 2 = rays-in-lanes + MXU kernel.
      return_depth: additionally return the final per-ray bounce depth
        column (for flop/MFU accounting in bench.py — the completed-bounce
        count is the useful-work measure).
      sort_mode: coherent-compaction sort implementation — "gather"
        (2-operand key sort + one row gather) or "multi" (multi-operand
        lax.sort); see :func:`_sort_state_by_keys`.
      sort_interval: run the full coherent re-sort every k-th round only;
        other rounds use the cheap alive-first partition (coherence decays
        gradually after a bounce — benchmarks/tune_large.py sweeps this).
      round_budgets: explicit per-round bounce budgets overriding the
        default schedule (must sum to >= params.max_bounces).
      dynamic_grid: size each round's kernel grid to the live-ray prefix
        (rays are alive-first after compaction, so tiles past
        ceil(alive/128) are all-done and can be skipped entirely — their
        state rides through the aliased buffer untouched).
      schedule_mode: clustered scenes only — compute each round's per-tile
        candidate cluster lists in XLA (``tile_schedule``) and run the
        kernel as a plain loop over them instead of the in-kernel
        slab + front-to-back while-loop traversal. Requires 1-bounce
        rounds (enforced).
      key_layout: compaction sort key layout ("cell" legacy /
        "dir72" direction-major; see :func:`_compaction_keys`).
    Returns (ev_bin_f [N], ev_w [N], ev_ear [N]) event slots (length n_pad;
    padding rays carry zero weight), plus depth [N] when ``return_depth``.
    """
    if directions is None:
        if version != 2 or native_rng_seed is None or n_rays is None:
            raise ValueError("directions=None needs version=2 + "
                             "native_rng_seed + n_rays")
        n = n_rays
    else:
        n = directions.shape[0]
    n_real = n_total_rays if n_total_rays is not None else n
    r = rays_per_tile if version == 1 else _LANES
    n_pad = ((n + r - 1) // r) * r

    e0 = params.base_power / (n_real * constants.SPHERE_VOLUME)
    yaw_rad = jnp.deg2rad(jnp.asarray(receiver_yaw_deg, jnp.float32))
    scal = _scalars(jnp.asarray(emitter, jnp.float32),
                    jnp.asarray(receiver_pos, jnp.float32),
                    yaw_rad, e0, params)

    clustered = (version == 2 and isinstance(tris_packed, tuple)
                 and tris_packed[2] is not None)
    if round_budgets is not None:
        if sum(round_budgets) < params.max_bounces:
            raise ValueError(
                f"round_budgets {round_budgets} sum to "
                f"{sum(round_budgets)} < max_bounces {params.max_bounces}; "
                f"deep paths would be truncated")
        budgets = list(round_budgets)
    elif not compact:
        budgets = [params.max_bounces]
    elif clustered:
        # Cluster-culled scenes: ONE bounce per round, coherent re-sort
        # (position cell + direction octant) every bounce. Culling quality
        # decays after a single bounce — rays scatter across cells — and a
        # tile's slab tests only save work while its rays agree on which
        # clusters they can reach. Measured on a 5k-tri scene (v5e, 1M
        # rays, 32 bounces): 1-bounce rounds 3.1 s vs 2-bounce 3.6 s vs
        # [6,12,14] 6.5 s. Compaction itself is ~1 ms at 1M rays.
        budgets = [1] * params.max_bounces
    else:
        budgets = _round_schedule(params.max_bounces)

    if version == 2:
        from . import raytrace_pallas_v2 as v2

        coeffs, attrs, boxes = tris_packed
        n_bands = params.n_bands
        ncols = v2.state_ncols(n_bands)
        en_cols, evw_cols = v2._band_cols(n_bands)
        if directions is None:
            scal_seed = scal.at[0, _S_PAD14].set(
                jnp.asarray(native_rng_seed, jnp.float32))
            tiles = v2.init_state_tiles(scal_seed, n_pad, n, interpret,
                                        n_bands=n_bands)
        else:
            tiles = v2.to_tiles(init_state(
                jnp.asarray(directions, jnp.float32),
                jnp.asarray(emitter, jnp.float32), e0, n_pad,
                ncols=ncols, en_cols=tuple(en_cols)))
        def coherent_tiles(tiles):
            st = v2.from_tiles(tiles)
            st = _sort_state_by_keys(st, _compaction_keys(
                st, True, cell_bits=cell_bits, dir_split=dir_split,
                key_layout=key_layout),
                mode=sort_mode)
            return v2.to_tiles(st)

        def partition_tiles(tiles):
            st = v2.from_tiles(tiles)
            return v2.to_tiles(_partition_alive_first(st, partition_mode))

        compact_tiles = coherent_tiles if boxes is not None \
            else partition_tiles

        n_tiles_total = n_pad // _LANES

        def active_tiles(tiles):
            # Rays are alive-first after compaction, so the kernel only
            # needs to visit the first ceil(alive / 128) tiles; the rest
            # ride through the aliased state buffer untouched.
            alive = jnp.sum((tiles[:, _C_DONE, 0, :] == 0.0)
                            .astype(jnp.int32))
            return jnp.clip((alive + _LANES - 1) // _LANES, 1, n_tiles_total)

        if schedule_mode:
            if boxes is None:
                raise ValueError("schedule_mode needs a clustered scene")
            if any(b != 1 for b in budgets):
                raise ValueError(
                    f"schedule_mode requires 1-bounce rounds (budgets "
                    f"{budgets}); positions move after a bounce, staling "
                    f"the schedule")

        if len(budgets) == 1:
            sched1 = (v2.tile_schedule(tiles, boxes,
                                       mode=sched_prefilter)
                      if schedule_mode else None)
            tiles = v2.trace_round_v2(tiles, coeffs, attrs, boxes, scal,
                                      params, budgets[0], interpret,
                                      precision, sched=sched1,
                                      unroll=unroll, tri_block=tri_block,
                                      sched_unroll=sched_unroll)
        else:
            # ONE scan body for ANY schedule: the round budget rides in the
            # scalar row (v2._S_BUDGET), so the kernel — and the compaction
            # move — is traced and Mosaic-compiled exactly once per
            # configuration (through the remote-compile tunnel, unrolled
            # rounds cost minutes of compile each). The final round skips
            # compaction (nothing reads the order afterwards); lax.cond
            # keeps that inside the scan without a second kernel payload.
            n_rounds = len(budgets)

            def body(carry, xb):
                tiles, n_act = carry
                i, b = xb
                sched = (v2.tile_schedule(tiles, boxes,
                                          mode=sched_prefilter)
                         if schedule_mode else None)
                tiles = v2.trace_round_v2(
                    tiles, coeffs, attrs, boxes, scal, params, b, interpret,
                    precision,
                    n_active_tiles=n_act if dynamic_grid else None,
                    sched=sched, unroll=unroll, tri_block=tri_block,
                    sched_unroll=sched_unroll)
                if compact:
                    not_last = i < n_rounds - 1
                    if boxes is not None and sort_interval > 1:
                        # Full coherent re-sort every k-th round; the cheap
                        # alive-first partition keeps the live prefix dense
                        # in between (stable, so cell grouping only decays
                        # by the rays that moved).
                        do_sort = (i % sort_interval) == (sort_interval - 1)
                        tiles = jax.lax.cond(
                            not_last,
                            lambda t: jax.lax.cond(do_sort, coherent_tiles,
                                                   partition_tiles, t),
                            lambda t: t, tiles)
                    else:
                        tiles = jax.lax.cond(not_last, compact_tiles,
                                             lambda t: t, tiles)
                if dynamic_grid:
                    n_act = active_tiles(tiles)
                return (tiles, n_act), None

            xs = (jnp.arange(n_rounds), jnp.asarray(budgets, jnp.float32))
            (tiles, _), _ = jax.lax.scan(
                body, (tiles, jnp.int32(n_tiles_total)), xs)
        state = v2.from_tiles(tiles)
        out = (state[:, _C_EVB], state[:, jnp.asarray(evw_cols)],
               state[:, _C_EVE].astype(jnp.int32))
        return out + (state[:, _C_DEPTH],) if return_depth else out
    else:
        if tris_packed.shape[1] % _LANES:
            raise ValueError(f"triangle count {tris_packed.shape[1]} not a "
                             f"multiple of {_LANES}")
        state = init_state(jnp.asarray(directions, jnp.float32),
                           jnp.asarray(emitter, jnp.float32), e0, n_pad)
        for k, budget in enumerate(budgets):
            state = trace_round(state, tris_packed, scal, params, r, budget,
                                interpret)
            if compact and k + 1 < len(budgets):
                state = _partition_alive_first(state, partition_mode)

    # Compaction reorders rays, so all n_pad slots are returned; padding rays
    # carry zero weight and are dropped by the histogram's overflow bucket.
    # Event weights always carry a trailing band axis ([n_pad, n_bands]).
    out = (state[:, _C_EVB], state[:, _C_EVW:_C_EVW + 1],
           state[:, _C_EVE].astype(jnp.int32))
    return out + (state[:, _C_DEPTH],) if return_depth else out


@functools.partial(
    jax.jit,
    static_argnames=("params", "n_total_rays_per_pose", "interpret",
                     "compact", "round_budgets", "unroll", "partition_mode",
                     "layout", "tri_block", "schedule_mode", "key_layout",
                     "cell_bits", "dir_split", "sort_mode", "sched_unroll",
                     "precision", "sched_prefilter"))
def trace_events_pose_batch(
    sc,
    directions: jax.Array,
    emitters: jax.Array,
    receivers: jax.Array,
    receiver_yaws_deg: jax.Array,
    params: TraceParams,
    n_total_rays_per_pose: int | None = None,
    interpret: bool = False,
    compact: bool = True,
    round_budgets: tuple | None = None,
    unroll: int = 1,
    partition_mode: str = "scatter",
    layout: str = "auto",
    tri_block: int = 16,
    schedule_mode: bool = False,
    key_layout: str = "dir72",
    cell_bits: int = 5,
    dir_split: bool = False,
    sort_mode: str = "gather",
    sched_unroll: int = 1,
    precision: str = "highest",
    sched_prefilter: str = "exact",
):
    """Trace P poses in ONE fused kernel launch (v2).

    The reference renders one (emitter, receiver) pair per launch
    (LaunchParams.h:20-43); the TPU multi-pose matrix wants S x L pairs.
    vmapping the single-pose program measured ~5x slower per ray on chip
    (batched pallas_call + batched compaction sorts, product_bench r4), so
    this driver batches poses the TPU-native way instead: the ray state is
    pose-major ([P * n_pad] rows), each 128-ray tile belongs to exactly one
    pose, and the kernel reads its pose's (emitter, receiver, yaw, e0)
    scalar row through the SMEM BlockSpec index map (tile i -> row
    i // tiles_per_pose). The kernel body is byte-identical to the
    single-pose one; between rounds compaction runs per-pose (vmapped —
    stable within each pose's segment, so tiles never mix poses).

    Clustered scenes run in SCHEDULE MODE (``schedule_mode=True``,
    enforced): ``tile_schedule`` is already per-tile, so it works on the
    pose-major tile array unchanged — the per-tile candidate lists and
    the per-pose coherent (dir72) sort compose with the pose scalar rows
    with no kernel change. This is the multi-listener path for LARGE
    scenes.

    Args:
      sc: SceneArrays; with cluster_boxes set, schedule_mode is required.
      directions: [P, N, 3] unit directions (pose-major).
      emitters / receivers: [P, 3]; receiver_yaws_deg: [P].
      n_total_rays_per_pose: energy normalization count (defaults to N).

    Returns (ev_bin_f [P, n_pad], ev_w [P, n_pad, n_bands],
    ev_ear [P, n_pad]).
    """
    from . import raytrace_pallas_v2 as v2

    clustered = sc.cluster_boxes is not None
    if clustered and not schedule_mode:
        raise ValueError("pose-batched tracing on clustered scenes "
                         "requires schedule_mode=True")
    if schedule_mode and not clustered:
        raise ValueError("schedule_mode needs a clustered scene")
    p, n = directions.shape[0], directions.shape[1]
    n_real = n_total_rays_per_pose if n_total_rays_per_pose is not None else n
    n_pad = ((n + _LANES - 1) // _LANES) * _LANES
    tiles_per_pose = n_pad // _LANES
    n_bands = params.n_bands
    ncols = v2.state_ncols(n_bands)
    en_cols, evw_cols = v2._band_cols(n_bands)

    coeffs, attrs, boxes = v2.pack_tris_v2(sc, n_bands, layout=layout,
                                           tri_block=tri_block)
    assert (boxes is not None) == clustered

    e0 = params.base_power / (n_real * constants.SPHERE_VOLUME)
    yaws = jnp.deg2rad(jnp.asarray(receiver_yaws_deg, jnp.float32))
    scal = jax.vmap(
        lambda em, rc, yw: _scalars(em, rc, yw, e0, params)[0]
    )(jnp.asarray(emitters, jnp.float32),
      jnp.asarray(receivers, jnp.float32), yaws)          # [P, _NSCAL]

    state = jax.vmap(
        lambda d, em: init_state(d, em, e0, n_pad, ncols=ncols,
                                 en_cols=tuple(en_cols))
    )(jnp.asarray(directions, jnp.float32),
      jnp.asarray(emitters, jnp.float32))                  # [P, n_pad, nc]
    tiles = v2.to_tiles(state.reshape(p * n_pad, ncols))

    if schedule_mode:
        if round_budgets is not None:
            if any(b != 1 for b in round_budgets):
                raise ValueError("schedule_mode requires 1-bounce rounds")
            if sum(round_budgets) < params.max_bounces:
                raise ValueError(
                    f"round_budgets {round_budgets} sum to "
                    f"{sum(round_budgets)} < max_bounces "
                    f"{params.max_bounces}; deep paths would be truncated")
        budgets = [1] * params.max_bounces
    elif round_budgets is not None:
        if sum(round_budgets) < params.max_bounces:
            raise ValueError(f"round_budgets {round_budgets} sum below "
                             f"max_bounces {params.max_bounces}")
        budgets = list(round_budgets)
    elif not compact:
        budgets = [params.max_bounces]
    else:
        budgets = _round_schedule(params.max_bounces)

    def compact_tiles(tiles):
        # Per-pose compaction (vmapped): alive-first partition, or — on
        # clustered scenes — the coherent dir72 sort, each stable within
        # its pose's segment so tiles never mix poses.
        st = v2.from_tiles(tiles).reshape(p, n_pad, ncols)
        if clustered:
            def one(s):
                keys = _compaction_keys(s, True, cell_bits=cell_bits,
                                        dir_split=dir_split,
                                        key_layout=key_layout)
                return _sort_state_by_keys(s, keys, mode=sort_mode)

            st = jax.vmap(one)(st)
        else:
            st = jax.vmap(
                lambda s: _partition_alive_first(s, partition_mode))(st)
        return v2.to_tiles(st.reshape(p * n_pad, ncols))

    if len(budgets) == 1:
        sched1 = (v2.tile_schedule(tiles, boxes, mode=sched_prefilter)
                  if schedule_mode else None)
        tiles = v2.trace_round_v2(tiles, coeffs, attrs, boxes, scal, params,
                                  budgets[0], interpret, precision,
                                  unroll=unroll,
                                  tri_block=tri_block, sched=sched1,
                                  sched_unroll=sched_unroll,
                                  tiles_per_pose=tiles_per_pose)
    else:
        n_rounds = len(budgets)

        def body(carry, xb):
            tiles = carry
            i, b = xb
            sched = (v2.tile_schedule(tiles, boxes, mode=sched_prefilter)
                     if schedule_mode else None)
            tiles = v2.trace_round_v2(tiles, coeffs, attrs, boxes, scal,
                                      params, b, interpret, precision,
                                      unroll=unroll,
                                      tri_block=tri_block, sched=sched,
                                      sched_unroll=sched_unroll,
                                      tiles_per_pose=tiles_per_pose)
            if compact:
                tiles = jax.lax.cond(i < n_rounds - 1, compact_tiles,
                                     lambda t: t, tiles)
            return tiles, None

        xs = (jnp.arange(n_rounds), jnp.asarray(budgets, jnp.float32))
        tiles, _ = jax.lax.scan(body, tiles, xs)

    state = v2.from_tiles(tiles).reshape(p, n_pad, ncols)
    return (state[:, :, _C_EVB], state[:, :, jnp.asarray(evw_cols)],
            state[:, :, _C_EVE].astype(jnp.int32))
