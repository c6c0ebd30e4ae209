"""r4 on-chip tuning sweep.

Small scene (3D_U, 10 tris, 1M rays, 100 bounces — the headline bench):
the r3 shipped config (group/MXU layout, rbg, unroll 4, budgets [8,24,68])
measured 106 ms. The 10-triangle scene trims to TWO 8-tri MXU groups, each
paying a 6-pass-HIGHEST dot pipeline per bounce; the rows layout runs the
same 16 triangles as ONE exact-f32 VPU tri-block. This sweeps:

  base        r3 shipped config (group layout)
  rows        pallas_layout="rows" (VPU tri16, no MXU)
  rows_u6/u8  rows + deeper bounce-body unroll (cheaper bounces raise the
              relative cost of the all-dead scalar exit check)
  rows_nrng   rows + on-chip direction generation (no [N,3] HBM array,
              no state transpose)
  rows_b2/b1  rows + flatter schedules [8,92] / [100]
  trace_only  best-config trace WITHOUT the histogram (fused) — the
              in-program histogram share, as opposed to the standalone
              27 ms stage reading (r3 profile) which includes dispatch
  hist_sort   full render with the sort-based histogram forced — in-program
              cost of sort vs the Pallas matmul-scatter histogram

Large scene (20k tris, 1M rays, 32 bounces, schedule mode cs32 dir72):

  base        r3 shipped config (tri_block 16: two tri16 calls per visit)
  tb32        tri_block=32 — ONE 32-row VPU block per cluster visit; the
              per-visit fixed tail (reductions, picks, selects) halves
  cs64_tb32   64-tri clusters at tri_block 32: 2098 vs 1551 tests/ray
              (culling_study) but half the visits -> half the per-visit
              fixed costs and half the schedule rows

Usage: python benchmarks/tune_r4.py [small|large|all]
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import audiorenderingv2_tpu as ar
from audiorenderingv2_tpu import accel
from audiorenderingv2_tpu.core.tracer import render_ir


def timeit(fn, n=5):
    t0 = time.time()
    jax.block_until_ready(fn())
    tc = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1000, tc


out = {}


def run(name, sc, n_rays, params, opts, rec, n_iter=5):
    f = jax.jit(lambda k: render_ir(sc, k, n_rays, jnp.zeros(3, jnp.float32),
                                    rec, 0.0, params, opts))
    # Vary the key per call (fold_in counter): repeated identical dispatches
    # measured bogus sub-ms times through the axon tunnel (tune_r4b r4 run).
    ctr = [0]

    def call():
        ctr[0] += 1
        return f(jax.random.fold_in(jax.random.PRNGKey(0), ctr[0]))

    try:
        ms, tc = timeit(call, n=n_iter)
    except Exception as e:
        print(f"{name}: FAILED {e!r}", flush=True)
        return
    out[name] = round(ms, 2)
    print(f"{name}: {ms:.2f} ms ({n_rays/ms*1000:.3e} rays/s, "
          f"compile {tc:.1f}s)", flush=True)


def small():
    scene = ar.load_scene("/root/reference/assets/models/3D_U.obj", [])
    n_rays = 1_000_000
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=100,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    sc = ar.scene_to_arrays(scene, 1024)
    rec = jnp.array([2.5, 9.9, 0.0], jnp.float32)
    base = dict(backend="pallas", tri_chunk=1024, rng_impl="rbg",
                pallas_unroll=4, pallas_round_budgets=(8, 24, 68))

    run("base", sc, n_rays, params, ar.TracerOptions(**base), rec)
    rows = dict(base, pallas_layout="rows")
    run("rows", sc, n_rays, params, ar.TracerOptions(**rows), rec)
    run("rows_u6", sc, n_rays, params,
        ar.TracerOptions(**dict(rows, pallas_unroll=6)), rec)
    run("rows_u8", sc, n_rays, params,
        ar.TracerOptions(**dict(rows, pallas_unroll=8)), rec)
    run("rows_nrng", sc, n_rays, params,
        ar.TracerOptions(**dict(rows, pallas_native_rng=True)), rec)
    run("rows_b2", sc, n_rays, params,
        ar.TracerOptions(**dict(rows, pallas_round_budgets=(8, 92))), rec)
    run("rows_b1", sc, n_rays, params,
        ar.TracerOptions(**dict(rows, pallas_round_budgets=(100,))), rec)

    # In-program histogram share: same trace, events returned raw.
    from audiorenderingv2_tpu.core import sampling
    from audiorenderingv2_tpu.ops import raytrace_pallas as rp
    from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2

    packed = rp2.pack_tris_v2(sc, 1, layout="rows")

    @jax.jit
    def trace_only(k):
        dirs = sampling.sample_directions(k, n_rays, rng_impl="rbg")
        return rp.trace_events_pallas(
            packed, dirs, jnp.zeros(3, jnp.float32), rec,
            jnp.float32(0.0), params, version=2,
            round_budgets=(8, 24, 68), unroll=4)

    try:
        ms, tc = timeit(lambda: trace_only(jax.random.PRNGKey(0)))
        out["trace_only"] = round(ms, 2)
        print(f"trace_only: {ms:.2f} ms (compile {tc:.1f}s)", flush=True)
    except Exception as e:
        print(f"trace_only: FAILED {e!r}", flush=True)

    run("hist_sort", sc, n_rays, params,
        ar.TracerOptions(**dict(rows, pallas_histogram=False)), rec)


def large():
    from benchmarks.large_scene import office_scene

    scene = office_scene(20000)
    n_rays = 1_000_000
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=32,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    rec = jnp.array([6.0, 1.0, -8.0], jnp.float32)
    base = dict(backend="pallas", pallas_version=2, pallas_schedule=True,
                pallas_key_layout="dir72", pallas_cell_bits=5)

    for name, cs, tb in [("base", 32, 16), ("tb32", 32, 32),
                         ("cs64_tb32", 64, 32)]:
        sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=cs)
        sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
        run(name, sc, n_rays, params,
            ar.TracerOptions(**dict(base, pallas_tri_block=tb)), rec,
            n_iter=3)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"device: {jax.devices()[0]}", flush=True)
    if which in ("small", "all"):
        small()
    if which in ("large", "all"):
        large()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
