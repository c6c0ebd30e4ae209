"""r3 follow-up small-scene sweep: unroll depth, tile width, round budgets.

tune_r3.py measured rbg+unroll3 at 116 ms (8.6M rays/s). This sweeps the
remaining cheap levers toward the 1e7 rays/s bar: deeper unroll (fewer
all-dead exit stalls), wider tiles (fewer per-tile fixed costs), and
flatter round schedules (fewer partition/dispatch boundaries).

Usage: python benchmarks/tune_r3b.py
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
from audiorenderingv2_tpu.core.tracer import render_ir

out = {}


def run(name, sc, n_rays, params, opts, rec):
    f = jax.jit(lambda k: render_ir(sc, k, n_rays, jnp.zeros(3, jnp.float32),
                                    rec, 0.0, params, opts))
    try:
        t0 = time.time()
        jax.block_until_ready(f(jax.random.PRNGKey(0)))
        tc = time.time() - t0
        ts = []
        for i in range(5):
            t0 = time.time()
            jax.block_until_ready(f(jax.random.PRNGKey(i + 1)))
            ts.append(time.time() - t0)
        ms = float(np.median(ts)) * 1000
    except Exception as e:
        print(f"{name}: FAILED {e!r}", flush=True)
        return
    out[name] = round(ms, 2)
    print(f"{name}: {ms:.2f} ms ({n_rays/ms*1000:.3e} rays/s, "
          f"compile {tc:.1f}s)", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ar.load_scene("/root/reference/assets/models/3D_U.obj", [])
    sc = ar.scene_to_arrays(scene, 1024)
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=100,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    rec = jnp.array([2.5, 9.9, 0.0], jnp.float32)
    base = dict(backend="pallas", pallas_version=2, tri_chunk=1024,
                rng_impl="rbg")
    cfgs = [
        ("u3", dict(pallas_unroll=3)),
        ("u4", dict(pallas_unroll=4)),
        ("u6", dict(pallas_unroll=6)),
        ("u3_tile512", dict(pallas_unroll=3, rays_per_tile=512)),
        ("u3_b3", dict(pallas_unroll=3,
                       pallas_round_budgets=(8, 24, 68))),
        ("u3_b2", dict(pallas_unroll=3,
                       pallas_round_budgets=(10, 90))),
        ("u4_b3", dict(pallas_unroll=4,
                       pallas_round_budgets=(8, 24, 68))),
    ]
    for name, kw in cfgs:
        run(name, sc, 1_000_000, params, ar.TracerOptions(**base, **kw), rec)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
