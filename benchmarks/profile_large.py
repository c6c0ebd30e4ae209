"""Decompose large-scene render time: kernel rounds vs compaction vs culling.

Variants (each timed after compile):
  A. production: clustered, 1-bounce rounds, coherent sort   (the bench path)
  B. clustered, 1-bounce rounds, plain alive-first partition (no coherence)
  C. clustered, single 32-bounce round, no compaction
  D. sort cost alone: 32 coherent sorts of the 1M x ncols state
  E. one 1-bounce round kernel alone (round 0 state), 32x

Usage: python benchmarks/profile_large.py [n_tris] [n_rays] [bounces]
"""
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
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    bounces = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    scene = office_scene(target)
    sorted_scene, clusters = accel.prepare_scene(scene)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    print(f"tris={scene.n_triangles} clusters={sc.cluster_boxes.shape[0]} "
          f"rays={n_rays} bounces={bounces}", flush=True)

    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=bounces,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    emitter = np.zeros(3, np.float32)
    rec = np.array([6.0, 1.0, -8.0], np.float32)
    key = jax.random.PRNGKey(0)

    def variant(name, **kw):
        opts = ar.TracerOptions(backend="pallas", pallas_version=2, **kw)

        @jax.jit
        def render(key):
            return render_ir(sc, key, n_rays, emitter, rec, 0.0, params, opts)

        t0 = time.time()
        jax.block_until_ready(render(key))
        tc = time.time() - t0
        dt = timeit(lambda: jax.block_until_ready(render(key)))
        print(f"{name}: {dt*1000:.0f} ms/render (compile {tc:.0f}s)",
              flush=True)
        return dt

    variant("A legacy traversal (coherent 1-bounce rounds)")
    variant("S schedule mode cs128", pallas_schedule=True,
            pallas_key_layout="dir72")
    variant("C single-round no-compact", pallas_compact=False)

    # D: sort cost alone
    dirs = sampling.sample_directions(key, n_rays)
    e0 = params.base_power / (n_rays * 4.18879)
    state = rp.init_state(dirs, jnp.asarray(emitter), e0,
                          ((n_rays + 127) // 128) * 128)

    @jax.jit
    def sort32(st):
        def body(st, _):
            return rp._sort_state_by_keys(
                st, rp._compaction_keys(st, True)), None
        st, _ = jax.lax.scan(body, st, None, length=bounces)
        return st

    jax.block_until_ready(sort32(state))
    dt = timeit(lambda: jax.block_until_ready(sort32(state)))
    print(f"D {bounces}x coherent sort alone: {dt*1000:.0f} ms", flush=True)

    # E: one kernel round alone, repeated `bounces` times on the SAME round-0
    # state (alive mix of bounce 0; optimistic coherence).
    coeffs, attrs, boxes = rp2.pack_tris_v2(sc, 1)
    scal = rp._scalars(jnp.asarray(emitter), jnp.asarray(rec),
                       jnp.float32(0.0), e0, params)
    tiles0 = rp2.to_tiles(state)

    @jax.jit
    def round32(tiles):
        def body(t, _):
            return rp2.trace_round_v2(t, coeffs, attrs, boxes, scal,
                                      params, 1), None
        t, _ = jax.lax.scan(body, tiles, None, length=bounces)
        return t

    jax.block_until_ready(round32(tiles0))
    dt = timeit(lambda: jax.block_until_ready(round32(tiles0)))
    print(f"E {bounces}x 1-bounce kernel on round-0 state: {dt*1000:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
