"""r3 on-chip tuning sweep: small-scene RNG/unroll, large-scene cs/sort_interval.

Small scene (3D_U, 1M rays, 100 bounces): the r3 profile spread the 134 ms
across sampling (~27 ms threefry), round1, histogram and init — this sweeps
the cheap levers (fast RNG impl, bounce-body unroll).

Large scene (20k tris, 1M rays, 32 bounces, schedule mode): cluster size 32
vs 16 (fewer tests per candidate vs longer candidate lists) and coherent
re-sort every round vs every 2nd (sort measured 292 ms of 3801 ms).

Usage: python benchmarks/tune_r3.py [small|large|all]
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


def run(name, sc, n_rays, params, opts, rec):
    f = jax.jit(lambda k: render_ir(sc, k, n_rays, jnp.zeros(3, jnp.float32),
                                    rec, 0.0, params, opts))
    try:
        ms, tc = timeit(lambda: f(jax.random.PRNGKey(0)))
    except Exception as e:
        print(f"{name}: FAILED {e!r}", flush=True)
        return
    out[name] = round(ms, 2)
    print(f"{name}: {ms:.2f} ms ({n_rays/ms*1000:.3e} rays/s, "
          f"compile {tc:.1f}s)", flush=True)


def small():
    scene = ar.load_scene("/root/reference/assets/models/3D_U.obj", [])
    sc = ar.scene_to_arrays(scene, 1024)
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=100,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    rec = jnp.array([2.5, 9.9, 0.0], jnp.float32)
    base = dict(backend="pallas", pallas_version=2, tri_chunk=1024)
    cfgs = [
        ("s_default", {}),
        ("s_rbg", dict(rng_impl="rbg")),
        ("s_unsafe_rbg", dict(rng_impl="unsafe_rbg")),
        ("s_unroll2", dict(pallas_unroll=2)),
        ("s_rbg_unroll2", dict(rng_impl="rbg", pallas_unroll=2)),
        ("s_rbg_unroll3", dict(rng_impl="rbg", pallas_unroll=3)),
    ]
    for name, kw in cfgs:
        run(name, sc, 1_000_000, params, ar.TracerOptions(**base, **kw), rec)


def large():
    from benchmarks.large_scene import office_scene
    scene = office_scene(20000)
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=32,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    rec = jnp.array([6.0, 1.0, -8.0], jnp.float32)
    base = dict(backend="pallas", pallas_version=2, pallas_schedule=True,
                pallas_key_layout="dir72", pallas_cell_bits=5)
    for cs in (32, 16):
        sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=cs)
        sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
        for si in (1, 2):
            run(f"l_cs{cs}_si{si}", sc, 1_000_000, params,
                ar.TracerOptions(**base, pallas_sort_interval=si), rec)


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
