"""r5 tuning batch C: schedule-prefilter A/B on the office bench.

End-to-end 1M rays x 32 bounces x 20k tris renders (the only timing
methodology that survives the tunnel, docs/ROUND4.md 1b) across the three
tile_schedule modes:

  exact     per-ray slab tests, rays x C cost (shipped default)
  interval  per-tile interval hull, ~128x cheaper stage but CPU-measured
            3.2-3.7x candidate inflation -> expected net loss (recorded
            for the r5 ceiling table)
  twostage  interval prefilter + exact tests over the gathered subset
            (caps 192/320) — exact candidate sets at ~cap/C of the exact
            stage cost
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
from audiorenderingv2_tpu.utils.profiling import timed_median

out = {}


def main():
    from benchmarks.large_scene import office_scene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = office_scene(20000)
    n_rays = 1_000_000
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=32,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    rec = jnp.array([6.0, 1.0, -8.0], jnp.float32)
    ss, cl = accel.prepare_scene(scene, cluster_size=32)
    sc = ar.scene_to_arrays(ss, 128, clusters=cl)
    base = dict(backend="pallas", pallas_version=2, pallas_schedule=True,
                pallas_key_layout="dir72", pallas_cell_bits=5,
                pallas_tri_block=32, pallas_sched_unroll=6)
    # twostage caps ride through a partial: tile_schedule_twostage's cap
    # default is 256; measure 256 via the mode knob, then 128 via a direct
    # monkeypatch of the default (config-only A/B, not shipped).
    for name, kw in [("exact", {}),
                     ("interval", dict(pallas_sched_prefilter="interval")),
                     ("twostage256",
                      dict(pallas_sched_prefilter="twostage"))]:
        opts = ar.TracerOptions(**{**base, **kw})
        f = jax.jit(lambda k, o=opts: render_ir(
            sc, k, n_rays, jnp.zeros(3, jnp.float32), rec, 0.0, params, o))
        try:
            ms, cs, chk = timed_median(
                lambda i: f(jax.random.fold_in(jax.random.PRNGKey(0), i)),
                n=3, min_ms=100.0)
            out[name] = round(ms, 1)
            print(f"{name}: {ms:.1f} ms (compile {cs:.1f}s, "
                  f"ir_sum {chk:.3e})", flush=True)
        except Exception as e:
            out[name] = f"FAILED {e!r}"
            print(f"{name}: FAILED {e!r}", flush=True)

    # cap=128 A/B via the module default (records the cap sensitivity)
    from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2
    orig = rp2.tile_schedule_twostage

    def capped(tiles, boxes, cap=128, chunk=64):
        return orig(tiles, boxes, cap=cap, chunk=chunk)

    rp2.tile_schedule_twostage = capped
    # the monkeypatched cap is NOT part of trace_events_pallas's jit key;
    # drop its cache so the capped schedule actually retraces
    from audiorenderingv2_tpu.ops import raytrace_pallas as rp

    rp.trace_events_pallas.clear_cache()
    try:
        opts = ar.TracerOptions(**{**base,
                                   "pallas_sched_prefilter": "twostage"})
        f = jax.jit(lambda k, o=opts: render_ir(
            sc, k, n_rays, jnp.zeros(3, jnp.float32), rec, 0.0, params, o))
        ms, cs, chk = timed_median(
            lambda i: f(jax.random.fold_in(jax.random.PRNGKey(1), i)),
            n=3, min_ms=100.0)
        out["twostage128"] = round(ms, 1)
        print(f"twostage128: {ms:.1f} ms (compile {cs:.1f}s, "
              f"ir_sum {chk:.3e})", flush=True)
    except Exception as e:
        out["twostage128"] = f"FAILED {e!r}"
        print(f"twostage128: FAILED {e!r}", flush=True)
    finally:
        rp2.tile_schedule_twostage = orig

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
