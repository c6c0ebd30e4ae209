"""Decompose the schedule-mode large-scene render (the r3 bench config).

Stages at cs32 + dir72 + schedule mode (bench.py large-scene config):
  full    render_ir end to end
  sched   tile_schedule alone x bounces (on the round-0 state)
  sort    coherent dir72 gather-sort alone x bounces
  kernel  trace_round_v2 with a precomputed schedule x bounces

Usage: python benchmarks/profile_sched.py [n_tris] [n_rays] [bounces] [cs]
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
from audiorenderingv2_tpu.core.tracer import render_ir
from audiorenderingv2_tpu.core import sampling
from audiorenderingv2_tpu.ops import raytrace_pallas as rp
from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2
from benchmarks.large_scene import office_scene


def timeit(fn, n=3):
    t0 = time.time()
    jax.block_until_ready(fn())
    tc = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1000, tc


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    bounces = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cs = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    scene = office_scene(target)
    sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=cs)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    print(f"tris={scene.n_triangles} clusters={sc.cluster_boxes.shape[0]} "
          f"rays={n_rays} bounces={bounces} cs={cs}", flush=True)

    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=bounces,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    emitter = np.zeros(3, np.float32)
    rec = np.array([6.0, 1.0, -8.0], np.float32)
    key = jax.random.PRNGKey(0)
    out = {}

    def stage(name, fn):
        ms, tc = timeit(fn)
        out[f"{name}_ms"] = round(ms, 1)
        print(f"{name}: {ms:.1f} ms (compile+first {tc:.1f}s)", flush=True)

    opts = ar.TracerOptions(backend="pallas", pallas_version=2,
                            pallas_schedule=True, pallas_key_layout="dir72",
                            pallas_cell_bits=5, pallas_dir_split=False)
    full = jax.jit(lambda k: render_ir(sc, k, n_rays, emitter, rec, 0.0,
                                       params, opts))
    stage("full", lambda: full(key))

    dirs = sampling.sample_directions(key, n_rays)
    e0 = params.base_power / (n_rays * 4.18879)
    n_pad = ((n_rays + 127) // 128) * 128
    state = rp.init_state(dirs, jnp.asarray(emitter), e0, n_pad)
    coeffs, attrs, boxes = rp2.pack_tris_v2(sc, 1)
    tiles0 = jax.block_until_ready(rp2.to_tiles(state))

    @jax.jit
    def sched_n(tiles):
        def body(c, _):
            s = rp2.tile_schedule(tiles, boxes)
            return c + s[0, 0], None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=bounces)
        return c
    stage("sched", lambda: sched_n(tiles0))

    @jax.jit
    def sort_n(st):
        def body(st, _):
            return rp._sort_state_by_keys(
                st, rp._compaction_keys(st, True, cell_bits=5,
                                        key_layout="dir72")), None
        st, _ = jax.lax.scan(body, st, None, length=bounces)
        return st
    stage("sort", lambda: sort_n(state))

    scal = rp._scalars(jnp.asarray(emitter), jnp.asarray(rec),
                       jnp.float32(0.0), e0, params)
    sched0 = jax.block_until_ready(
        jax.jit(lambda t: rp2.tile_schedule(t, boxes))(tiles0))
    print(f"round-0 candidates/tile: mean "
          f"{float(np.asarray(sched0)[:, 0].mean()):.1f} "
          f"p90 {float(np.percentile(np.asarray(sched0)[:, 0], 90)):.0f}",
          flush=True)

    @jax.jit
    def kernel_n(tiles):
        def body(t, _):
            return rp2.trace_round_v2(t, coeffs, attrs, boxes, scal,
                                      params, 1, sched=sched0), None
        t, _ = jax.lax.scan(body, tiles, None, length=bounces)
        return t
    stage("kernel", lambda: kernel_n(tiles0))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
