"""On-chip micro-bench: alive-first partition implementations + schedules.

The r3 profile (benchmarks/profile_small.py) showed the 1M x 16 alive-first
partition costs 35 ms per call on the v5e — dominating the 10-triangle
headline render (the reference workload, config.json:26-34). This measures
the three `_partition_alive_first` modes at the bench shape, then sweeps
small-scene round schedules end to end with the best mode.

Usage: python benchmarks/partition_bench.py [n_rays]
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
from audiorenderingv2_tpu.core.tracer import render_ir
from audiorenderingv2_tpu.ops import raytrace_pallas as rp


def timeit(fn, n=5):
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_pad = ((n + 127) // 128) * 128
    print(f"device: {jax.devices()[0]}; n={n}", flush=True)
    out = {}

    # A realistic mid-render done mix (~40% alive, random positions).
    key = jax.random.PRNGKey(0)
    state = jax.random.normal(key, (n_pad, 16), jnp.float32)
    done = (jax.random.uniform(jax.random.fold_in(key, 1), (n_pad,))
            < 0.6).astype(jnp.float32)
    state = state.at[:, rp._C_DONE].set(done)
    state = jax.block_until_ready(state)

    ref = None
    for mode in ("scatter", "rowscatter", "sort"):
        f = jax.jit(lambda s, m=mode: rp._partition_alive_first(s, m))
        ms, cs = timeit(lambda: f(state))
        out[f"partition_{mode}_ms"] = round(ms, 2)
        got = np.asarray(f(state))
        if ref is None:
            ref = got
        ok = bool(np.array_equal(got[:, rp._C_DONE] != 0,
                                 ref[:, rp._C_DONE] != 0)
                  and np.allclose(np.sort(got[:, 2]), np.sort(ref[:, 2])))
        print(f"partition[{mode}]: {ms:.2f} ms (compile {cs:.1f}s) "
              f"match={ok}", flush=True)

    # End-to-end small-scene schedule sweep with the fastest mode.
    best = min(("scatter", "rowscatter", "sort"),
               key=lambda m: out[f"partition_{m}_ms"])
    out["best_mode"] = best
    ref_scene = "/root/reference/assets/models/3D_U.obj"
    if os.path.exists(ref_scene):
        scene = ar.load_scene(ref_scene, [])
    else:
        from audiorenderingv2_tpu import testing
        v, t = testing.box_room((14.0, 9.0, 11.0))
        scene = testing.scene_from_arrays(v, t, 0.3)
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=100,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    sc = ar.scene_to_arrays(scene, 1024)
    emitter = jnp.zeros(3, jnp.float32)
    rec = jnp.array([2.5, 9.9, 0.0], jnp.float32)

    schedules = [None, (6, 12, 24, 58), (4, 96), (3, 13, 84), (2, 8, 90),
                 (6, 94), (100,)]
    for sched in schedules:
        opts = ar.TracerOptions(backend="pallas", pallas_version=2,
                                tri_chunk=1024, pallas_round_budgets=sched,
                                pallas_partition_mode=best)
        f = jax.jit(lambda k, o=opts: render_ir(sc, k, n, emitter, rec,
                                                0.0, params, o))
        try:
            ms, cs = timeit(lambda: f(key))
        except Exception as e:
            print(f"schedule {sched}: FAILED {e!r}", flush=True)
            continue
        tag = "default" if sched is None else str(list(sched))
        out[f"render_{tag}_ms"] = round(ms, 2)
        print(f"render schedule {tag}: {ms:.2f} ms "
              f"({n / ms * 1000:.3e} rays/s, compile {cs:.1f}s)", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
