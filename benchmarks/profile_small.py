"""Decompose the headline 1M-ray 3D_U render: trace vs histogram vs init.

VERDICT r1 asked where the ~130 ms goes on the 10-triangle reference scene
(the workload is overhead-bound, not intersection-bound). Times, each jitted
and measured warm:

  full      render_ir end to end (the bench.py configuration)
  trace     trace_events_pallas only (kernel rounds + compaction)
  hist      histogram from precomputed events only
  init      direction sampling + state init + tiling only
  round1    first kernel round alone (the shipped schedule's first-round
            budget, all tiles alive)

Also writes a jax.profiler trace to /tmp/ar2_profile_small (TensorBoard
format) when AR2_PROFILE_TRACE=1.

Usage: python benchmarks/profile_small.py [n_rays]
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
from audiorenderingv2_tpu.core import sampling
from audiorenderingv2_tpu.core.tracer import render_ir
from audiorenderingv2_tpu.ops import raytrace_pallas as rp
from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2


def timeit(fn, n=5):
    """Returns (median warm ms, compile+first s)."""
    t0 = time.time()
    jax.block_until_ready(fn())
    compile_s = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1000, compile_s


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ref_scene = "/root/reference/assets/models/3D_U.obj"
    materials = [ar.MaterialSpec(n, a) for n, a in
                 [("low", 0.1), ("med", 0.3), ("high", 0.6)]]
    if os.path.exists(ref_scene):
        scene = ar.load_scene(ref_scene, materials)
    else:
        from audiorenderingv2_tpu import testing
        v, t = testing.box_room((14.0, 9.0, 11.0))
        scene = testing.scene_from_arrays(v, t, 0.3)
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=100,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    # Match bench.py's tuned r4 defaults (rows layout, rbg RNG, unroll 8,
    # [8,24,68] schedule) so the decomposition describes the shipped
    # configuration.
    opts = ar.TracerOptions(backend="pallas", pallas_version=2,
                            tri_chunk=1024,
                            rng_impl=os.environ.get("AR2_BENCH_RNG", "rbg"),
                            pallas_layout=os.environ.get("AR2_BENCH_LAYOUT",
                                                         "rows"),
                            pallas_unroll=int(os.environ.get(
                                "AR2_BENCH_UNROLL", 8)),
                            pallas_round_budgets=(8, 24, 68))
    sc = ar.scene_to_arrays(scene, opts.tri_chunk)
    print(f"device: {jax.devices()[0]}; tris={scene.n_triangles} "
          f"rays={n_rays}", flush=True)

    emitter = jnp.zeros(3, jnp.float32)
    rec = jnp.array([2.5, 9.9, 0.0], jnp.float32)
    key = jax.random.PRNGKey(0)
    out = {}

    def stage(name, fn):
        ms, compile_s = timeit(fn)
        out[f"{name}_ms"] = round(ms, 2)
        out[f"{name}_compile_s"] = round(compile_s, 1)
        print(f"{name}: {ms:.2f} ms (compile+first {compile_s:.1f}s)",
              flush=True)

    full = jax.jit(lambda k: render_ir(sc, k, n_rays, emitter, rec, 0.0,
                                       params, opts))
    stage("full", lambda: full(key))

    tris_packed = rp2.pack_tris_v2(sc, 1)
    dirs = sampling.sample_directions(key, n_rays, rng_impl=opts.rng_impl)

    def trace(d):
        return rp.trace_events_pallas(tris_packed, d, emitter, rec, 0.0,
                                      params, version=2,
                                      round_budgets=opts.pallas_round_budgets,
                                      unroll=opts.pallas_unroll)
    stage("trace", lambda: trace(dirs))

    ev_bin, ev_w, ev_ear = jax.block_until_ready(trace(dirs))

    from audiorenderingv2_tpu.core.tracer import _histogram_from_events
    hist = jax.jit(lambda b, w, e: _histogram_from_events(
        b, w, e, params, False, use_pallas_hist=None))
    stage("hist", lambda: hist(ev_bin, ev_w, ev_ear))

    stage("dirs", lambda: sampling.sample_directions(
        key, n_rays, rng_impl=opts.rng_impl))

    e0 = params.base_power / (n_rays * 4.18879)
    n_pad = ((n_rays + 127) // 128) * 128
    init = jax.jit(lambda d: rp2.to_tiles(rp.init_state(d, emitter, e0,
                                                        n_pad)))
    stage("init", lambda: init(dirs))

    scal = rp._scalars(emitter, rec, jnp.float32(0.0), e0, params)
    coeffs, attrs, boxes = tris_packed
    tiles0 = jax.block_until_ready(init(dirs))
    r1 = jax.jit(lambda t: rp2.trace_round_v2(t, coeffs, attrs, boxes, scal,
                                              params,
                                              opts.pallas_round_budgets[0],
                                              unroll=opts.pallas_unroll))
    stage("round1", lambda: r1(tiles0))

    part = jax.jit(rp._partition_alive_first)
    st = rp.init_state(dirs, emitter, e0, n_pad)
    stage("partition", lambda: part(st))

    print(json.dumps(out), flush=True)

    if os.environ.get("AR2_PROFILE_TRACE"):
        with jax.profiler.trace("/tmp/ar2_profile_small"):
            jax.block_until_ready(full(key))
        print("profiler trace: /tmp/ar2_profile_small", flush=True)


if __name__ == "__main__":
    main()
