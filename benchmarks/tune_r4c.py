"""r4 batch C: re-measure the small-scene schedule sweep with a hard
device->host sync, and push sched_unroll further on the large scene.

tune_r4b's small-scene sweep returned physically impossible sub-ms medians
for every config after the first two (0.2-0.4 ms for a 1M-ray render,
benchmarks/results/tune_r4b.log) — block_until_ready through the axon
tunnel stopped blocking partway into the process. This harness forces a
real device->host materialization (np.asarray of the IR sum) inside every
timed call and varies the PRNG key per call, so a timed number can only be
produced by a completed render.
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

out = {}


def run(name, sc, n_rays, params, opts, rec, n_iter=5):
    f = jax.jit(lambda k: render_ir(sc, k, n_rays, jnp.zeros(3, jnp.float32),
                                    rec, 0.0, params, opts))

    def call(i):
        ir = f(jax.random.fold_in(jax.random.PRNGKey(0), i))
        return float(np.asarray(ir).sum())  # hard sync: device->host copy

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
        return
    out[name] = round(ms, 2)
    print(f"{name}: {ms:.2f} ms ({n_rays/ms*1000:.3e} rays/s, "
          f"compile {tc:.1f}s, ir_sum {s0:.3e})", flush=True)


def small():
    scene = ar.load_scene("/root/reference/assets/models/3D_U.obj", [])
    n_rays = 1_000_000
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=100,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    sc = ar.scene_to_arrays(scene, 1024)
    rec = jnp.array([2.5, 9.9, 0.0], jnp.float32)
    rows = dict(backend="pallas", tri_chunk=1024, rng_impl="rbg",
                pallas_layout="rows", pallas_unroll=8)
    for name, kw in [
            ("u8_b3", {}),
            ("u8_b3a", dict(pallas_round_budgets=(6, 18, 76))),
            ("u8_b3b", dict(pallas_round_budgets=(12, 32, 56))),
            ("u8_b4a", dict(pallas_round_budgets=(4, 8, 24, 64))),
            ("u10_b3", dict(pallas_unroll=10)),
            ("u12_b3", dict(pallas_unroll=12))]:
        cfg = dict(rows, pallas_round_budgets=(8, 24, 68))
        cfg.update(kw)
        run(name, sc, n_rays, params, ar.TracerOptions(**cfg), rec)


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
                pallas_tri_block=32)
    sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=32)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    for name, su in [("tb32_su4", 4), ("tb32_su6", 6), ("tb32_su8", 8)]:
        run(name, sc, n_rays, params,
            ar.TracerOptions(**dict(base, pallas_sched_unroll=su)), rec,
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
