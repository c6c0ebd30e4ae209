"""r5 tuning batch B: cost decomposition + large-scene config sweep.

Small scene (decomposition, not tuning):
  * ray-count scaling (125k..1M) under the shipped config — the intercept
    of the time-vs-rays line is the per-render fixed cost (dispatch, grid
    launch, histogram floor) that per-bounce kernel work cannot touch.
  * trace-with-precomputed-directions vs full render — splits the
    sampling+state-init share inside the program.
  * pipelined groups (3 renders enqueued back-to-back, one fence) — the
    device-throughput number with the per-dispatch tunnel round trip
    amortized; integrity: every IR's checksum is asserted finite+positive
    after timing, and a physical floor guards against the r4 fence
    failures.

Large scene (VERDICT r5 #2 A/Bs, config-only levers):
  * cluster_size 16 (tb16) vs 32 (tb32) under schedule mode
  * pallas_sort_interval 2/4 (cheap partition between full coherent sorts)
  * cell_bits 4/6 around the shipped 5
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import audiorenderingv2_tpu as ar
from audiorenderingv2_tpu import accel
from audiorenderingv2_tpu.core.tracer import render_ir, trace_ir
from audiorenderingv2_tpu.core import sampling

out = {}


def run(name, fn, n_iter=5, n_rays=None):
    """fn(i) -> device IR; timed with a hard host materialization."""
    def call(i):
        s = float(np.asarray(fn(i)).sum())
        assert np.isfinite(s) and s > 0, s
        return s

    try:
        t0 = time.time()
        s0 = call(0)
        tc = time.time() - t0
        ts = []
        for i in range(1, n_iter + 1):
            t0 = time.time()
            call(i)
            ts.append(time.time() - t0)
        ms = float(np.median(ts)) * 1000
    except Exception as e:
        print(f"{name}: FAILED {e!r}", flush=True)
        out[name] = f"FAILED {e!r}"
        return None
    out[name] = round(ms, 2)
    rate = f", {n_rays/ms*1000:.3e} rays/s" if n_rays else ""
    print(f"{name}: {ms:.2f} ms (compile {tc:.1f}s, ir_sum {s0:.3e}{rate})",
          flush=True)
    return ms


def small():
    scene = ar.load_scene("/root/reference/assets/models/3D_U.obj", [])
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=100,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    sc = ar.scene_to_arrays(scene, 1024)
    rec = jnp.array([2.5, 9.9, 0.0], jnp.float32)
    em = jnp.zeros(3, jnp.float32)
    opts = ar.TracerOptions(backend="pallas", tri_chunk=1024, rng_impl="rbg",
                            pallas_layout="rows", pallas_unroll=8,
                            pallas_round_budgets=(8, 24, 68))

    # --- ray-count scaling
    for n in (125_000, 250_000, 500_000, 1_000_000):
        f = jax.jit(lambda k, n=n: render_ir(sc, k, n, em, rec, 0.0,
                                             params, opts))
        run(f"scale_{n//1000}k", lambda i, f=f: f(
            jax.random.fold_in(jax.random.PRNGKey(0), i)), n_iter=7,
            n_rays=n)

    # --- sampling/init share: directions precomputed OUTSIDE the timed jit
    n = 1_000_000
    f_tr = jax.jit(lambda d, n=n: trace_ir(sc, d, em, rec, 0.0, params,
                                           opts))
    dirs_pool = [jax.block_until_ready(sampling.sample_directions(
        jax.random.fold_in(jax.random.PRNGKey(1), i), n, rng_impl="rbg"))
        for i in range(8)]
    run("trace_only_1m", lambda i: f_tr(dirs_pool[i % 8]), n_iter=7,
        n_rays=n)

    # --- pipelined throughput (groups of 3, one fence per group)
    f = jax.jit(lambda k: render_ir(sc, k, n, em, rec, 0.0, params, opts))
    f(jax.random.PRNGKey(9)).block_until_ready()  # warm
    G = 3
    gtimes, sums = [], []
    for g in range(5):
        t0 = time.time()
        irs = [f(jax.random.fold_in(jax.random.PRNGKey(2), g * G + j))
               for j in range(G)]
        last = float(np.asarray(irs[-1]).sum())  # fence: FIFO queue done
        dt = time.time() - t0
        gtimes.append(dt / G)
        sums.extend(float(np.asarray(x).sum()) for x in irs[:-1])
        sums.append(last)
    assert all(np.isfinite(s) and s > 0 for s in sums), sums
    ms = float(np.median(gtimes)) * 1000
    assert ms > 10.0, f"physically impossible {ms} ms/render"
    out["pipelined_g3"] = round(ms, 2)
    print(f"pipelined_g3: {ms:.2f} ms/render ({n/ms*1000:.3e} rays/s)",
          flush=True)


def large():
    from benchmarks.large_scene import office_scene

    scene = office_scene(20000)
    n_rays = 1_000_000
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=32,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    rec = jnp.array([6.0, 1.0, -8.0], jnp.float32)
    base = dict(backend="pallas", pallas_version=2, pallas_schedule=True,
                pallas_key_layout="dir72", pallas_cell_bits=5,
                pallas_tri_block=32, pallas_sched_unroll=6)
    cfgs = [
        ("cs32_base", 32, {}),
        ("cs16_tb16", 16, dict(pallas_tri_block=16)),
        ("cs16_tb16_su12", 16, dict(pallas_tri_block=16,
                                    pallas_sched_unroll=12)),
        ("cs32_sort2", 32, dict(pallas_sort_interval=2)),
        ("cs32_sort4", 32, dict(pallas_sort_interval=4)),
        ("cs32_cb4", 32, dict(pallas_cell_bits=4)),
        ("cs32_cb6", 32, dict(pallas_cell_bits=6)),
    ]
    prepared = {}
    for name, cs, kw in cfgs:
        if cs not in prepared:
            ss, cl = accel.prepare_scene(scene, cluster_size=cs)
            prepared[cs] = ar.scene_to_arrays(ss, 128, clusters=cl)
        sc = prepared[cs]
        opts = ar.TracerOptions(**{**base, **kw})
        f = jax.jit(lambda k, sc=sc, opts=opts: render_ir(
            sc, k, n_rays, jnp.zeros(3, jnp.float32), rec, 0.0, params,
            opts))
        run(name, lambda i, f=f: f(
            jax.random.fold_in(jax.random.PRNGKey(0), i)), n_iter=3,
            n_rays=n_rays)


def crossover2():
    """Bracket the rows/schedule crossover below 1280 tris (batch A saw
    schedule 4.7x ahead at 1280 already; prepare_scene clusters only at
    >= 512 tris, so the threshold lives in [512, 1280])."""
    from benchmarks.large_scene import office_scene

    n_rays = 1_000_000
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=32,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    rec = jnp.array([3.0, 1.0, -3.0], jnp.float32)
    for n_tris in (320, 640):
        scene = office_scene(n_tris)
        sc_rows = ar.scene_to_arrays(scene, 1024)
        ropts = ar.TracerOptions(backend="pallas", tri_chunk=1024,
                                 rng_impl="rbg", pallas_layout="rows",
                                 pallas_unroll=8,
                                 pallas_round_budgets=(4, 12, 16))
        f = jax.jit(lambda k, sc=sc_rows, o=ropts: render_ir(
            sc, k, n_rays, jnp.zeros(3, jnp.float32), rec, 0.0, params, o))
        run(f"rows_{n_tris}", lambda i, f=f: f(
            jax.random.fold_in(jax.random.PRNGKey(0), i)), n_iter=3,
            n_rays=n_rays)
        ss, cl = accel.prepare_scene(scene, min_triangles=64,
                                     cluster_size=32)
        sc_cl = ar.scene_to_arrays(ss, 128, clusters=cl)
        sopts = ar.TracerOptions(backend="pallas", pallas_version=2,
                                 rng_impl="rbg", pallas_schedule=True,
                                 pallas_key_layout="dir72",
                                 pallas_cell_bits=5, pallas_tri_block=32,
                                 pallas_sched_unroll=6)
        f = jax.jit(lambda k, sc=sc_cl, o=sopts: render_ir(
            sc, k, n_rays, jnp.zeros(3, jnp.float32), rec, 0.0, params, o))
        run(f"sched_{n_tris}", lambda i, f=f: f(
            jax.random.fold_in(jax.random.PRNGKey(0), i)), n_iter=3,
            n_rays=n_rays)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"device: {jax.devices()[0]}", flush=True)
    if which in ("small", "all"):
        small()
    if which in ("crossover2", "all"):
        crossover2()
    if which in ("large", "all"):
        large()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
