"""Tune the clustered-kernel configuration on a real chip.

Measures render time for a matrix of (precision, cell_bits, dir_split)
TracerOptions on the office scene; each configuration pays one jit compile
(the Mosaic kernel recompiles only when `precision` changes — the sort keys
are XLA-side).

Usage: python benchmarks/tune_large.py [n_tris] [n_rays] [bounces] [cfgs...]
  cfgs: comma-separated precision:cell_bits:dir_split, e.g.
        highest:3:0,high:3:0,high:4:1   (default: a small sweep).
  NOTE: the clustered path's VPU intersection ignores `precision`
  (it only affects the unclustered group-layout MXU path), so sweep
  entries differing only in precision measure the identical kernel.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

import audiorenderingv2_tpu as ar
from audiorenderingv2_tpu import accel
from audiorenderingv2_tpu.core.tracer import render_ir
from benchmarks.large_scene import office_scene


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    bounces = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cfg_s = sys.argv[4] if len(sys.argv) > 4 else \
        "highest:3:0,high:3:0,high:4:0,high:4:1"

    scene = office_scene(target)
    sorted_scene, clusters = accel.prepare_scene(scene)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    print(f"device: {jax.devices()[0]}; tris={scene.n_triangles} "
          f"clusters={sc.cluster_boxes.shape[0]} rays={n_rays} "
          f"bounces={bounces}", flush=True)

    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=bounces,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    emitter = np.zeros(3, np.float32)
    rec = np.array([6.0, 1.0, -8.0], np.float32)
    key = jax.random.PRNGKey(0)
    results = []
    for cfg in cfg_s.split(","):
        prec, bits, split = cfg.split(":")
        opts = ar.TracerOptions(backend="pallas", pallas_version=2,
                                pallas_precision=prec,
                                pallas_cell_bits=int(bits),
                                pallas_dir_split=bool(int(split)))

        @jax.jit
        def render(k):
            return render_ir(sc, k, n_rays, emitter, rec, 0.0, params, opts)

        t0 = time.time()
        ir = jax.block_until_ready(render(key))
        tc = time.time() - t0
        ts = []
        for i in range(3):
            t0 = time.time()
            jax.block_until_ready(render(jax.random.fold_in(key, i + 1)))
            ts.append(time.time() - t0)
        dt = float(np.median(ts))
        r = {"cfg": cfg, "seconds": dt, "renders_per_s": 1.0 / dt,
             "compile_s": round(tc, 1),
             "ir_sum": float(np.asarray(ir).sum())}
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
