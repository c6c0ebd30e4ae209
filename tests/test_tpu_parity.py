"""TPU-hardware parity regression (runs only with AR2_TEST_TPU=1).

Guards against the class of bug found in round 1: XLA lowering K=3 matmuls
to the MXU's default single-pass bf16, corrupting intersection geometry so
multi-bounce rays phantom-missed (~40% of deposits lost). CPU tests cannot
catch TPU-only precision behavior, so this compares the XLA and Pallas
backends on-chip at high bounce counts, where precision errors compound.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("AR2_TEST_TPU"),
    reason="TPU hardware parity test (set AR2_TEST_TPU=1)")


def test_backends_agree_on_chip():
    import jax
    import jax.numpy as jnp

    import audiorenderingv2_tpu as ar
    from audiorenderingv2_tpu import testing
    from audiorenderingv2_tpu.core import sampling

    assert jax.devices()[0].platform == "tpu"
    v, t = testing.box_room((12.0, 8.0, 10.0))
    scene = testing.scene_from_arrays(v, t, 0.3)
    sc = ar.scene_to_arrays(scene, 128)
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=60)
    dirs = sampling.sample_directions(jax.random.PRNGKey(0), 4096)
    args = (jnp.zeros(3), jnp.array([2.0, 0.0, 1.0]), jnp.float32(15.0))

    irs = {}
    for tag, opts in [
        ("xla", ar.TracerOptions(backend="xla", block_size=4096, tri_chunk=128)),
        ("v1", ar.TracerOptions(backend="pallas", pallas_version=1)),
        ("v2", ar.TracerOptions(backend="pallas", pallas_version=2)),
    ]:
        irs[tag] = np.asarray(jax.jit(
            lambda d, o=opts: ar.trace_ir(sc, d, *args, params, o))(dirs))

    # Closed room at 60 bounces: deposit COUNTS and totals must agree to MC
    # chaos level (a few %), not the 40%+ of the bf16 bug.
    for a, b in [("xla", "v1"), ("xla", "v2")]:
        na, nb = (irs[a] != 0).sum(), (irs[b] != 0).sum()
        assert abs(na - nb) / max(na, 1) < 0.05, f"{a} vs {b}: {na} vs {nb} bins"
        sa, sb = irs[a].sum(), irs[b].sum()
        assert abs(sa - sb) / max(sa, 1e-12) < 0.05, f"{a} vs {b}: {sa} vs {sb}"


def test_native_rng_multiband_on_chip():
    """On-chip direction generation (pallas_native_rng) with banded
    absorption: a different deterministic RNG stream than jax.random, so the
    comparison against the explicit-directions render is statistical — total
    energy per band within MC noise, and more-absorbing bands weaker."""
    import jax
    import jax.numpy as jnp

    import audiorenderingv2_tpu as ar
    from audiorenderingv2_tpu import testing
    from audiorenderingv2_tpu.core.tracer import render_ir
    from audiorenderingv2_tpu.scene import build_scene

    assert jax.devices()[0].platform == "tpu"
    v, t = testing.box_room((12.0, 8.0, 10.0))
    tri_abs = np.tile(np.float32([0.1, 0.35, 0.6]), (len(t), 1))  # 3 bands
    scene = build_scene(testing.mesh_from_arrays(v, t), tri_abs)
    sc = ar.scene_to_arrays(scene, 128)
    params = ar.TraceParams(sample_rate=16000, ir_length=16000,
                            base_power=3.62, max_bounces=30, n_bands=3)
    args = (jnp.zeros(3), jnp.array([2.0, 0.0, 1.0]), jnp.float32(0.0))
    n = 65536

    sums = {}
    for tag, native in [("native", True), ("sampled", False)]:
        opts = ar.TracerOptions(backend="pallas", pallas_version=2,
                                pallas_native_rng=native)
        ir = np.asarray(jax.jit(
            lambda k, o=opts: render_ir(sc, k, n, *args, params, o)
        )(jax.random.PRNGKey(7)))
        assert ir.shape == (2, 3, 16000)
        sums[tag] = ir.sum(axis=(0, 2))
    # band energies decrease with absorption, both streams
    for tag in sums:
        assert sums[tag][0] > sums[tag][1] > sums[tag][2] > 0, sums[tag]
    np.testing.assert_allclose(sums["native"], sums["sampled"], rtol=0.05)


def test_shipped_bench_paths_on_chip():
    """The r4 shipped configurations on real hardware: the rows-layout
    small-scene path (bench.py default) and the schedule-mode clustered
    path with tri_block=32 + sched_unroll=6 (large-scene default). Both
    compared statistically against the XLA backend at depth — the
    regression guard for the paths the headline numbers ride."""
    import jax
    import jax.numpy as jnp

    import audiorenderingv2_tpu as ar
    from audiorenderingv2_tpu import accel, testing
    from audiorenderingv2_tpu.core import sampling

    assert jax.devices()[0].platform == "tpu"
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=40)
    dirs = sampling.sample_directions(jax.random.PRNGKey(11), 4096)

    def stat_close(a, b, tag):
        a, b = np.asarray(a), np.asarray(b)
        assert (a != 0).sum() > 100, tag
        assert abs(a.sum() - b.sum()) / max(b.sum(), 1e-12) < 0.05, tag
        na, nb = (a != 0).sum(), (b != 0).sum()
        assert abs(int(na) - int(nb)) / max(na, 1) < 0.05, tag

    # rows layout (small-scene default): unroll 8, 3-round schedule
    v, t = testing.box_room((12.0, 8.0, 10.0))
    scene = testing.scene_from_arrays(v, t, 0.3)
    sc = ar.scene_to_arrays(scene, 128)
    args = (jnp.zeros(3), jnp.array([2.0, 0.0, 1.0]), jnp.float32(15.0))
    rows = np.asarray(jax.jit(lambda d: ar.trace_ir(
        sc, d, *args, params,
        ar.TracerOptions(backend="pallas", pallas_layout="rows",
                         pallas_unroll=8,
                         pallas_round_budgets=(8, 12, 20))))(dirs))
    xla = np.asarray(jax.jit(lambda d: ar.trace_ir(
        sc, d, *args, params,
        ar.TracerOptions(backend="xla", block_size=4096,
                         tri_chunk=128)))(dirs))
    stat_close(rows, xla, "rows-vs-xla")

    # schedule mode + tb32 + su6 (large-scene default) on a clustered scene
    v, t = testing.icosphere(radius=6.0, subdivisions=3)
    lscene = testing.scene_from_arrays(v, t, 0.2)
    sorted_scene, clusters = accel.prepare_scene(lscene, cluster_size=32)
    lsc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    lsc_plain = ar.scene_to_arrays(lscene, 128)
    largs = (jnp.zeros(3), jnp.array([1.5, 0.5, -1.0]), jnp.float32(10.0))
    lparams = ar.TraceParams(sample_rate=16000, ir_length=32000,
                             base_power=3.62, max_bounces=12)
    sched = np.asarray(jax.jit(lambda d: ar.trace_ir(
        lsc, d, *largs, lparams,
        ar.TracerOptions(backend="pallas", pallas_version=2,
                         pallas_schedule=True, pallas_key_layout="dir72",
                         pallas_tri_block=32,
                         pallas_sched_unroll=6)))(dirs))
    lxla = np.asarray(jax.jit(lambda d: ar.trace_ir(
        lsc_plain, d, *largs, lparams,
        ar.TracerOptions(backend="xla", block_size=4096,
                         tri_chunk=128)))(dirs))
    stat_close(sched, lxla, "sched-tb32-su6-vs-xla")


def test_sharded_pallas_on_chip():
    """pallas_call composed with shard_map executed on REAL TPU hardware
    (mesh of however many chips are attached — 1 in this environment).
    Interpret-mode CPU tests prove the logic; this proves the Mosaic
    kernel + psum lowering actually runs on the device (VERDICT r2 #4b)."""
    import jax
    import jax.numpy as jnp

    import audiorenderingv2_tpu as ar
    from audiorenderingv2_tpu import testing
    from audiorenderingv2_tpu.core import sampling
    from audiorenderingv2_tpu.parallel.sharding import (
        make_ray_mesh, trace_directions_sharded)

    assert jax.devices()[0].platform == "tpu"
    mesh = make_ray_mesh()
    scene = testing.scene_from_arrays(*testing.box_room((12.0, 8.0, 10.0)),
                                      0.3)
    sc = ar.scene_to_arrays(scene, 128)
    p = ar.TraceParams(sample_rate=16000, ir_length=32000, base_power=3.62,
                       max_bounces=20)
    n = 2048 * mesh.devices.size
    dirs = sampling.sample_directions(jax.random.PRNGKey(3), n)
    rec = jnp.array([2.0, 0.0, 1.0])
    pal = trace_directions_sharded(
        sc, dirs, jnp.zeros(3), rec, 20.0, p,
        ar.TracerOptions(backend="pallas", pallas_version=2), mesh=mesh)
    xla = trace_directions_sharded(
        sc, dirs, jnp.zeros(3), rec, 20.0, p,
        ar.TracerOptions(block_size=2048, tri_chunk=128), mesh=mesh)
    pal, xla = np.asarray(pal), np.asarray(xla)
    assert (pal != 0).sum() > 100
    # On-chip arithmetic differs between backends at 20 bounces: compare
    # statistically (totals + bin counts), like test_backends_agree_on_chip.
    assert abs(pal.sum() - xla.sum()) / max(xla.sum(), 1e-12) < 0.05
    na, nb = (pal != 0).sum(), (xla != 0).sum()
    assert abs(int(na) - int(nb)) / max(na, 1) < 0.05
