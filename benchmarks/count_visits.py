"""Measure cluster visits per tile-bounce for the front-to-back traversal.

The traversal's cost is ~ visits x (7 MXU dots + a [128,128] VPU tail); the
slab/selection overhead is small. This reports the mean number of cluster
visits per (tile, bounce) under different coherent-sort keys, which is the
quantity the sort is supposed to minimize.

Usage: python benchmarks/count_visits.py [n_tris] [n_rays] [bounces] [cfgs]
  cfgs: comma-separated cell_bits:dir_split, default "3:0,4:1,5:1"
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
from audiorenderingv2_tpu.core import sampling
from audiorenderingv2_tpu.ops import raytrace_pallas as rp
from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2
from benchmarks.large_scene import office_scene


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    bounces = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cfg_s = sys.argv[4] if len(sys.argv) > 4 else "3:0,4:1,5:1"

    scene = office_scene(target)
    sorted_scene, clusters = accel.prepare_scene(scene)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    n_clusters = sc.cluster_boxes.shape[0]
    print(f"device: {jax.devices()[0]}; tris={scene.n_triangles} "
          f"clusters={n_clusters} rays={n_rays} bounces={bounces}",
          flush=True)

    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=bounces,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    coeffs, attrs, boxes = rp2.pack_tris_v2(sc, 1)
    emitter = jnp.zeros(3, jnp.float32)
    rec = jnp.array([6.0, 1.0, -8.0], jnp.float32)
    e0 = params.base_power / (n_rays * 4.18879)
    scal = rp._scalars(emitter, rec, jnp.float32(0.0), e0, params)
    key = jax.random.PRNGKey(0)
    dirs = sampling.sample_directions(key, n_rays)
    n_pad = ((n_rays + 127) // 128) * 128
    state0 = rp.init_state(dirs, emitter, e0, n_pad)
    n_tiles = n_pad // 128

    for cfg in cfg_s.split(","):
        bits, split = (int(x) for x in cfg.split(":"))

        @jax.jit
        def run(state):
            tiles = rp2.to_tiles(state)

            def body(tiles, _):
                tiles = rp2.trace_round_v2(tiles, coeffs, attrs, boxes,
                                           scal, params, 1,
                                           count_visits=True)
                st = rp2.from_tiles(tiles)
                st = rp._sort_state_by_keys(
                    st, rp._compaction_keys(st, True, cell_bits=bits,
                                            dir_split=bool(split)))
                return rp2.to_tiles(st), None

            tiles, _ = jax.lax.scan(body, tiles, None, length=bounces)
            st = rp2.from_tiles(tiles)
            return jnp.sum(st[:, rp._C_LTRI]), jnp.sum(st[:, rp._C_DONE])

        t0 = time.time()
        total, done = jax.block_until_ready(run(state0))
        tc = time.time() - t0
        t0 = time.time()
        total, done = jax.block_until_ready(run(state0))
        dt = time.time() - t0
        mean_visits = float(total) / (128 * bounces * n_tiles)
        print(json.dumps({
            "cfg": cfg, "mean_visits_per_tile_bounce": round(mean_visits, 2),
            "n_clusters": int(n_clusters),
            "done_frac": round(float(done) / n_pad, 4),
            "seconds": round(dt, 2), "compile_s": round(tc, 1)}), flush=True)


if __name__ == "__main__":
    main()
