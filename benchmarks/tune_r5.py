"""r5 tuning batch A: small-scene dynamic grid + rows/schedule crossover.

Small scene: the r5 alive-curve measurement (3D_U, 1M rays, mb=100) shows
31% of rays alive after round 1 (8 bounces) and 7.5% after round 2 (32) —
the opposite regime from the office scene's 93%-alive-at-32 that killed
`pallas_dynamic_grid` in r3. Rounds 2/3 currently run every tile; sizing
each round's grid to the compacted live prefix should cut the dominant
trace cost several-fold. Sweeps dynamic grid x budget splits.

Crossover: the r5 facade auto-config (tuned.py) needs the scene size where
schedule-mode clusters start beating the flat rows kernel; brackets it on
office_scene(1280 / 2560 / 5120) at 1M rays x 32 bounces.

Timing per the r4 integrity rules: fresh PRNG key per call AND an
np.asarray materialization inside the timed section (tune_r4c pattern).
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
        s = float(np.asarray(ir).sum())  # hard sync: device->host copy
        assert np.isfinite(s) and s > 0, s
        return s

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
        out[name] = f"FAILED {e!r}"
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
            ("base_b3", {}),                      # r4 shipped (8,24,68)
            ("dg_b3", dict(pallas_dynamic_grid=True)),
            ("dg_b4", dict(pallas_dynamic_grid=True,
                           pallas_round_budgets=(4, 8, 20, 68))),
            ("dg_b5", dict(pallas_dynamic_grid=True,
                           pallas_round_budgets=(2, 4, 8, 18, 68))),
            ("dg_b6", dict(pallas_dynamic_grid=True,
                           pallas_round_budgets=(2, 2, 4, 8, 16, 68))),
            ("b4_nodg", dict(pallas_round_budgets=(4, 8, 20, 68)))]:
        cfg = dict(rows, pallas_round_budgets=(8, 24, 68))
        cfg.update(kw)
        run(name, sc, n_rays, params, ar.TracerOptions(**cfg), rec,
            n_iter=7)


def crossover():
    from benchmarks.large_scene import office_scene

    n_rays = 1_000_000
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=32,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    rec = jnp.array([3.0, 1.0, -3.0], jnp.float32)
    for n_tris in (1280, 2560, 5120):
        scene = office_scene(n_tris)
        # rows (flat) config — the small-scene facade choice
        sc_rows = ar.scene_to_arrays(scene, 1024)
        run(f"rows_{n_tris}", sc_rows, n_rays, params,
            ar.TracerOptions(backend="pallas", tri_chunk=1024,
                             rng_impl="rbg", pallas_layout="rows",
                             pallas_unroll=8,
                             pallas_round_budgets=(4, 12, 16)),
            rec, n_iter=3)
        # schedule-mode clustered config — the large-scene facade choice
        sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=32)
        sc_cl = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
        run(f"sched_{n_tris}", sc_cl, n_rays, params,
            ar.TracerOptions(backend="pallas", pallas_version=2,
                             rng_impl="rbg",
                             pallas_schedule=True, pallas_key_layout="dir72",
                             pallas_cell_bits=5, pallas_tri_block=32,
                             pallas_sched_unroll=6),
            rec, n_iter=3)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"device: {jax.devices()[0]}", flush=True)
    if which in ("small", "all"):
        small()
    if which in ("crossover", "all"):
        crossover()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
