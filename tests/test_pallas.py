"""Pallas fused-trace kernel parity vs the XLA tracer and the numpy oracle
(interpret mode, so the exact kernel logic runs on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audiorenderingv2_tpu as ar
from audiorenderingv2_tpu import testing
from audiorenderingv2_tpu.core import sampling, tracer_ref

SR = 16000


def pallas_opts(version=1, **kw):
    d = dict(block_size=256, tri_chunk=128, backend="pallas",
             rays_per_tile=128, pallas_interpret=True,
             pallas_version=version)
    d.update(kw)
    return ar.TracerOptions(**d)


def xla_opts(**kw):
    d = dict(block_size=256, tri_chunk=128, backend="xla")
    d.update(kw)
    return ar.TracerOptions(**d)


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize("scene_fn,rec", [
    (lambda: testing.box_room((12.0, 8.0, 10.0)), [2.0, 0.0, 1.0]),
    (lambda: testing.icosphere(radius=6.0, subdivisions=2), [1.5, 0.5, -1.0]),
])
def test_pallas_matches_xla(scene_fn, rec, version):
    v, t = scene_fn()
    scene = testing.scene_from_arrays(v, t, 0.3)
    sc = ar.scene_to_arrays(scene, 128)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    dirs = sampling.sample_directions(jax.random.PRNGKey(4), 256)
    rec = jnp.asarray(rec, jnp.float32)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 25.0, params,
                               pallas_opts(version)))
    b = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 25.0, params, xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


@pytest.mark.parametrize("version", [1, 2])
def test_pallas_matches_oracle(version):
    v, t = testing.box_room((10.0, 9.0, 8.0))
    scene = testing.scene_from_arrays(v, t, 0.25)
    sc = ar.scene_to_arrays(scene, 128)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=8)
    dirs = np.asarray(sampling.sample_directions(jax.random.PRNGKey(6), 256))
    ir_ref = tracer_ref.trace_ir_reference(
        scene, dirs, np.zeros(3), np.array([1.0, 1.0, -2.0]), -30.0, params)
    ir_pl = np.asarray(ar.trace_ir(
        sc, jnp.asarray(dirs), jnp.zeros(3), jnp.array([1.0, 1.0, -2.0]),
        -30.0, params, pallas_opts(version)))
    np.testing.assert_allclose(ir_pl, ir_ref, rtol=2e-3, atol=1e-8)


def test_pallas_multichunk_triangles():
    """Scene with >128 triangles exercises the chunked lane loop."""
    v, t = testing.icosphere(radius=5.0, subdivisions=2)  # 320 tris
    scene = testing.scene_from_arrays(v, t, 0.15)
    sc = ar.scene_to_arrays(scene, 512)  # pad to 512 = 4 lane chunks
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=5)
    dirs = sampling.sample_directions(jax.random.PRNGKey(8), 128)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), jnp.array([2.0, 0.0, 0.0]),
                               0.0, params, pallas_opts()))
    sc2 = ar.scene_to_arrays(scene, 128)
    b = np.asarray(ar.trace_ir(sc2, dirs, jnp.zeros(3), jnp.array([2.0, 0.0, 0.0]),
                               0.0, params, xla_opts()))
    assert a.sum() > 0
    # Different tri chunkings reduce in different f32 orders; exact on the
    # CPU mesh, statistical on chip (r3 on-chip failure class, ROUND4.md).
    testing.assert_ir_close(a, b)


def test_pallas_ray_padding():
    """Ray counts that don't fill whole tiles: pads deposit nothing."""
    v, t = testing.box_room((10.0, 9.0, 8.0))
    scene = testing.scene_from_arrays(v, t, 0.25)
    sc = ar.scene_to_arrays(scene, 128)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=4)
    dirs = sampling.sample_directions(jax.random.PRNGKey(10), 100)  # 100 < 128
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), jnp.array([1.0, 0.0, 0.0]),
                               0.0, params, pallas_opts()))
    b = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), jnp.array([1.0, 0.0, 0.0]),
                               0.0, params, xla_opts()))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


def test_rows_layout_matches_xla():
    """Forced rows layout (VPU tri16 blocks, no clusters, no MXU) matches
    the XLA tracer on a small scene — the headline-bench fast path."""
    v, t = testing.box_room((12.0, 8.0, 10.0))
    scene = testing.scene_from_arrays(v, t, 0.3)
    sc = ar.scene_to_arrays(scene, 128)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    dirs = sampling.sample_directions(jax.random.PRNGKey(12), 256)
    rec = jnp.array([2.0, 0.0, 1.0], jnp.float32)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 25.0, params,
                               pallas_opts(2, pallas_layout="rows")))
    b = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 25.0, params,
                               xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


@pytest.mark.parametrize("layout_kw", [
    dict(pallas_layout="rows"),          # rows layout, 32-tri VPU blocks
    dict(),                              # clustered path via schedule mode
])
def test_tri_block_32_matches_xla(layout_kw):
    """pallas_tri_block=32 (one 32-row VPU block per cluster / two per
    rows-layout sweep) preserves physics on both consuming paths."""
    from audiorenderingv2_tpu import accel

    if layout_kw:
        v, t = testing.box_room((12.0, 8.0, 10.0))
        scene = testing.scene_from_arrays(v, t, 0.3)
        sc = ar.scene_to_arrays(scene, 128)
        opts = pallas_opts(2, pallas_tri_block=32, **layout_kw)
        sc_plain = sc
    else:
        v, t = testing.icosphere(radius=6.0, subdivisions=3)
        scene = testing.scene_from_arrays(v, t, 0.2)
        sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=32)
        sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
        opts = pallas_opts(2, pallas_tri_block=32, pallas_schedule=True,
                           pallas_key_layout="dir72")
        sc_plain = ar.scene_to_arrays(scene, 128)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    dirs = sampling.sample_directions(jax.random.PRNGKey(33), 256)
    rec = jnp.array([1.5, 0.5, -1.0], jnp.float32)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 10.0, params,
                               opts))
    b = np.asarray(ar.trace_ir(sc_plain, dirs, jnp.zeros(3), rec, 10.0,
                               params, xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


@pytest.mark.parametrize("dynamic", [False, True])
def test_round_budgets_and_dynamic_grid(dynamic):
    """Explicit round budgets + live-prefix dynamic grid preserve physics
    (multi-round scan path with compaction between rounds)."""
    v, t = testing.box_room((10.0, 9.0, 8.0))
    scene = testing.scene_from_arrays(v, t, 0.25)
    sc = ar.scene_to_arrays(scene, 128)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    dirs = sampling.sample_directions(jax.random.PRNGKey(14), 256)
    rec = jnp.array([1.0, 1.0, -2.0], jnp.float32)
    opts = pallas_opts(2, pallas_round_budgets=(2, 2, 2),
                       pallas_dynamic_grid=dynamic)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 0.0, params, opts))
    b = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 0.0, params,
                               xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


def test_round_budgets_validation():
    v, t = testing.box_room((10.0, 9.0, 8.0))
    scene = testing.scene_from_arrays(v, t, 0.25)
    sc = ar.scene_to_arrays(scene, 128)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    dirs = sampling.sample_directions(jax.random.PRNGKey(14), 128)
    with pytest.raises(ValueError, match="round_budgets"):
        ar.trace_ir(sc, dirs, jnp.zeros(3), jnp.ones(3), 0.0, params,
                    pallas_opts(2, pallas_round_budgets=(2, 2)))


@pytest.mark.parametrize("sort_mode,interval", [("gather", 1), ("multi", 1),
                                                ("gather", 4)])
def test_clustered_sort_modes(sort_mode, interval):
    """Clustered path parity across compaction-sort implementations and
    re-sort intervals (partition on the in-between rounds)."""
    from audiorenderingv2_tpu import accel

    v, t = testing.icosphere(radius=6.0, subdivisions=3)  # 1280 tris
    scene = testing.scene_from_arrays(v, t, 0.2)
    sorted_scene, clusters = accel.prepare_scene(scene)
    assert clusters is not None
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    dirs = sampling.sample_directions(jax.random.PRNGKey(16), 256)
    rec = jnp.array([1.5, 0.5, -1.0], jnp.float32)
    opts = pallas_opts(2, pallas_sort_mode=sort_mode,
                       pallas_sort_interval=interval)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 10.0, params,
                               opts))
    sc_plain = ar.scene_to_arrays(scene, 128)
    b = np.asarray(ar.trace_ir(sc_plain, dirs, jnp.zeros(3), rec, 10.0,
                               params, xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


@pytest.mark.parametrize("cs,keys", [(128, "cell"), (32, "dir72"),
                                     (64, "dir72")])
def test_schedule_mode_matches_xla(cs, keys):
    """Schedule-mode clustered path (XLA-side per-round candidate lists,
    kernel loops prefetched ids — no in-kernel traversal) == XLA tracer,
    across cluster sizes and compaction key layouts."""
    from audiorenderingv2_tpu import accel

    v, t = testing.icosphere(radius=6.0, subdivisions=3)  # 1280 tris
    scene = testing.scene_from_arrays(v, t, 0.2)
    sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=cs)
    assert clusters is not None
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    dirs = sampling.sample_directions(jax.random.PRNGKey(21), 256)
    rec = jnp.array([1.5, 0.5, -1.0], jnp.float32)
    opts = pallas_opts(2, pallas_schedule=True, pallas_key_layout=keys)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 10.0, params,
                               opts))
    sc_plain = ar.scene_to_arrays(scene, 128)
    b = np.asarray(ar.trace_ir(sc_plain, dirs, jnp.zeros(3), rec, 10.0,
                               params, xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


@pytest.mark.parametrize("su", [2, 3])
def test_sched_unroll_matches_xla(su):
    """Candidate-visit unrolling (multiple clusters per fori_loop step,
    pad visits clamped to the last id — idempotent under the running min)
    preserves physics."""
    from audiorenderingv2_tpu import accel

    v, t = testing.icosphere(radius=6.0, subdivisions=3)
    scene = testing.scene_from_arrays(v, t, 0.2)
    sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=32)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    dirs = sampling.sample_directions(jax.random.PRNGKey(40), 256)
    rec = jnp.array([1.5, 0.5, -1.0], jnp.float32)
    opts = pallas_opts(2, pallas_schedule=True, pallas_key_layout="dir72",
                       pallas_sched_unroll=su)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 10.0, params,
                               opts))
    b = np.asarray(ar.trace_ir(ar.scene_to_arrays(scene, 128), dirs,
                               jnp.zeros(3), rec, 10.0, params, xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


def test_tile_schedule_matches_kernel_slab():
    """tile_schedule's candidate sets equal a direct numpy slab test on the
    same state (the kernel's in-kernel pass is the same math)."""
    from audiorenderingv2_tpu import accel
    from audiorenderingv2_tpu.ops import raytrace_pallas as rp
    from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2

    v, t = testing.icosphere(radius=5.0, subdivisions=3)
    scene = testing.scene_from_arrays(v, t, 0.25)
    sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=32)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    boxes = sc.cluster_boxes
    n = 512
    dirs = sampling.sample_directions(jax.random.PRNGKey(5), n)
    st = rp.init_state(jnp.asarray(dirs), jnp.array([0.5, -0.2, 0.1]),
                       1e-6, n, ncols=rp2.state_ncols(1))
    # mark a few rays done: they must not contribute candidates
    st = st.at[: n // 4, rp._C_DONE].set(1.0)
    sched = np.asarray(rp2.tile_schedule(rp2.to_tiles(st), boxes))
    bx = np.asarray(boxes)
    P = np.asarray(st[:, rp._C_PX:rp._C_PZ + 1]).reshape(-1, 128, 3)
    V = np.asarray(st[:, rp._C_VX:rp._C_VZ + 1]).reshape(-1, 128, 3)
    D = np.asarray(st[:, rp._C_DONE]).reshape(-1, 128)
    for i in range(P.shape[0]):
        inv = 1.0 / np.where(np.abs(V[i]) > 1e-20, V[i],
                             np.where(V[i] >= 0, 1e-20, -1e-20))
        t1 = (bx[None, :, 0:3] - P[i][:, None]) * inv[:, None]
        t2 = (bx[None, :, 3:6] - P[i][:, None]) * inv[:, None]
        tn = np.minimum(t1, t2).max(-1)
        tf = np.maximum(t1, t2).min(-1)
        entry = np.maximum(tn, 0.0)
        ok = (tf >= entry) & (bx[None, :, 6] > 0) & (D[i][:, None] == 0)
        expect = set(np.where(ok.any(0))[0])
        count = sched[i, 0]
        got = set(sched[i, 1:1 + count].tolist())
        assert got == expect, (i, got, expect)


def test_schedule_mode_requires_single_bounce_rounds():
    from audiorenderingv2_tpu import accel

    v, t = testing.icosphere(radius=5.0, subdivisions=3)
    scene = testing.scene_from_arrays(v, t, 0.25)
    sorted_scene, clusters = accel.prepare_scene(scene)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=4)
    dirs = sampling.sample_directions(jax.random.PRNGKey(7), 128)
    with pytest.raises(ValueError, match="1-bounce"):
        ar.trace_ir(sc, dirs, jnp.zeros(3), jnp.ones(3), 0.0, params,
                    pallas_opts(2, pallas_schedule=True,
                                pallas_round_budgets=(2, 2)))


@pytest.mark.parametrize("unroll", [2, 4])
def test_unroll_matches_xla(unroll):
    """Bounce-body unrolling (all-dead check every k bounces) preserves
    physics exactly: intermediate bodies are no-ops for finished rays."""
    v, t = testing.box_room((11.0, 7.0, 9.0))
    scene = testing.scene_from_arrays(v, t, 0.3)
    sc = ar.scene_to_arrays(scene, 128)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=7)  # not a multiple of unroll
    dirs = sampling.sample_directions(jax.random.PRNGKey(30), 256)
    rec = jnp.array([2.0, -0.5, 1.0], jnp.float32)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 5.0, params,
                               pallas_opts(2, pallas_layout="rows",
                                           pallas_unroll=unroll)))
    b = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 5.0, params,
                               xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


@pytest.mark.parametrize("mode", ["scatter", "rowscatter", "sort"])
def test_partition_modes_agree(mode):
    """All three alive-first partition implementations produce the same
    stable reorder (raytrace_pallas._partition_alive_first)."""
    from audiorenderingv2_tpu.ops import raytrace_pallas as rp

    key = jax.random.PRNGKey(7)
    n = 1024
    state = jax.random.normal(key, (n, 16), jnp.float32)
    done = (jax.random.uniform(jax.random.fold_in(key, 1), (n,))
            < 0.5).astype(jnp.float32)
    state = state.at[:, rp._C_DONE].set(done)
    ref = np.asarray(rp._partition_alive_first(state, "scatter"))
    got = np.asarray(rp._partition_alive_first(state, mode))
    np.testing.assert_array_equal(got, ref)
    # alive-first and stable
    alive = ref[:, rp._C_DONE] == 0.0
    n_alive = int(alive.sum())
    assert alive[:n_alive].all() and not alive[n_alive:].any()


def test_interval_prefilter_superset_and_parity():
    """The r5 interval-hull schedule (tile_schedule_interval) must (a)
    produce a SUPERSET of the exact per-ray candidate sets — the kernel's
    running min then sees every true candidate — and (b) leave the
    rendered IR equal to the XLA tracer's."""
    from audiorenderingv2_tpu import accel
    from audiorenderingv2_tpu.ops import raytrace_pallas as rp
    from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2

    v, t = testing.icosphere(radius=6.0, subdivisions=3)  # 1280 tris
    scene = testing.scene_from_arrays(v, t, 0.2)
    sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=32)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    dirs = sampling.sample_directions(jax.random.PRNGKey(5), 512)
    rec = jnp.array([1.5, 0.5, -1.0], jnp.float32)

    # (a) superset on a mid-trace state (advance 2 bounces first)
    _, _, boxes = rp2.pack_tris_v2(sc, 1)
    e0 = params.base_power / (512 * 4.18879)
    state = rp.init_state(jnp.asarray(dirs), jnp.zeros(3, jnp.float32),
                          e0, 512)
    tiles = rp2.to_tiles(state)
    scal = rp._scalars(jnp.zeros(3, jnp.float32), rec, jnp.float32(0.2),
                       e0, params)
    coeffs, attrs, boxes2 = rp2.pack_tris_v2(sc, 1, tri_block=32)
    tiles2 = tiles
    for _ in range(2):  # advance a mid-trace state (1-bounce sched rounds)
        sched0 = rp2.tile_schedule(tiles2, boxes2)
        tiles2 = rp2.trace_round_v2(tiles2, coeffs, attrs, boxes2, scal,
                                    params, 1, True, sched=sched0,
                                    tri_block=32)
    for tl in (tiles, tiles2):
        ex = np.asarray(rp2.tile_schedule(tl, boxes2))
        iv = np.asarray(rp2.tile_schedule_interval(tl, boxes2))
        for row_e, row_i in zip(ex, iv):
            se = set(row_e[1:1 + row_e[0]].tolist())
            si = set(row_i[1:1 + row_i[0]].tolist())
            assert se <= si, (sorted(se - si), len(se), len(si))

    # (b) end-to-end parity vs the XLA tracer
    opts = pallas_opts(2, pallas_schedule=True, pallas_key_layout="dir72",
                       pallas_sched_prefilter="interval",
                       pallas_tri_block=32)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 10.0, params,
                               opts))
    sc_plain = ar.scene_to_arrays(scene, 128)
    b = np.asarray(ar.trace_ir(sc_plain, dirs, jnp.zeros(3), rec, 10.0,
                               params, xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


def test_twostage_schedule_superset_and_parity():
    """Two-stage schedule (interval prefilter -> exact subset tests):
    candidate sets are a superset of the exact schedule's (equal on
    non-overflow tiles), and the rendered IR matches the XLA tracer."""
    from audiorenderingv2_tpu import accel
    from audiorenderingv2_tpu.ops import raytrace_pallas as rp
    from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2

    v, t = testing.icosphere(radius=6.0, subdivisions=3)
    scene = testing.scene_from_arrays(v, t, 0.2)
    sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=32)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    dirs = sampling.sample_directions(jax.random.PRNGKey(6), 512)
    rec = jnp.array([1.5, 0.5, -1.0], jnp.float32)

    _, _, _ = rp2.pack_tris_v2(sc, 1)
    e0 = params.base_power / (512 * 4.18879)
    state = rp.init_state(jnp.asarray(dirs), jnp.zeros(3, jnp.float32),
                          e0, 512)
    tiles = rp2.to_tiles(state)
    scal = rp._scalars(jnp.zeros(3, jnp.float32), rec, jnp.float32(0.2),
                       e0, params)
    coeffs, attrs, boxes2 = rp2.pack_tris_v2(sc, 1, tri_block=32)
    tiles2 = tiles
    for _ in range(2):  # advance a mid-trace state (1-bounce sched rounds)
        sched0 = rp2.tile_schedule(tiles2, boxes2)
        tiles2 = rp2.trace_round_v2(tiles2, coeffs, attrs, boxes2, scal,
                                    params, 1, True, sched=sched0,
                                    tri_block=32)
    for cap in (8, 40):  # small caps force the overflow fallback too
        for tl in (tiles, tiles2):
            ex = np.asarray(rp2.tile_schedule(tl, boxes2))
            ts = np.asarray(rp2.tile_schedule_twostage(tl, boxes2,
                                                       cap=cap))
            for row_e, row_t in zip(ex, ts):
                se = set(row_e[1:1 + row_e[0]].tolist())
                st = set(row_t[1:1 + row_t[0]].tolist())
                assert se <= st, (sorted(se - st), len(se), len(st))

    opts = pallas_opts(2, pallas_schedule=True, pallas_key_layout="dir72",
                       pallas_sched_prefilter="twostage",
                       pallas_tri_block=32)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 10.0, params,
                               opts))
    sc_plain = ar.scene_to_arrays(scene, 128)
    b = np.asarray(ar.trace_ir(sc_plain, dirs, jnp.zeros(3), rec, 10.0,
                               params, xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-7)


def test_interior_degenerate_triangle_keeps_tail_geometry():
    """valid=0 also marks interior degenerate faces; the packed-triangle
    trim must cut at the LAST valid index, not the valid count (r5 review
    fix: a count trim silently dropped real tail triangles)."""
    from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2

    v, t = testing.box_room((4.0, 3.0, 5.0))  # 12 tris
    # inject a degenerate sliver mid-array (all three vertices equal)
    v = np.concatenate([v, np.zeros((3, 3), np.float32)])
    n = v.shape[0]
    t = np.concatenate([t[:6], [[n - 3, n - 2, n - 1]], t[6:]]).astype(
        np.int32)
    scene = testing.scene_from_arrays(v, t, 0.3)
    sc = ar.scene_to_arrays(scene, 128)
    valid = np.asarray(sc.valid)
    assert valid[6] == 0.0 and valid[12] == 1.0  # interior hole, real tail
    rows, _, _ = rp2.pack_tris_v2(sc, 1)
    # every REAL triangle must survive the trim
    assert rows.shape[0] >= 13
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    popts = ar.TracerOptions(backend="pallas", pallas_version=2,
                             pallas_interpret=True)
    dirs = sampling.sample_directions(jax.random.PRNGKey(2), 256)
    rec = jnp.array([1.0, 0.5, -0.5], jnp.float32)
    a = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 0.0, params,
                               popts))
    b = np.asarray(ar.trace_ir(sc, dirs, jnp.zeros(3), rec, 0.0, params,
                               xla_opts()))
    assert a.sum() > 0
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)
