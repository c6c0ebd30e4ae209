"""Facade == bench parity (VERDICT r4 #1 "Done" check).

The r4 gap: all tuning lived in bench.py env defaults while
``AudioRenderer(opts=None)`` ran untuned configs (legacy clustered
traversal on the office, default unroll/budgets on 3D_U) — a CLI user got
~2.4x less than the benches measured. r5's ``tuned.auto_options`` closes
it; this bench PROVES it on chip by timing the product facade itself:

  small_facade    AudioRenderer(3D_U 10 tris, auto opts).render()
                  -> must match the small-bench warm time (~85 ms)
  office_facade   AudioRenderer(office 20k tris, auto opts).render()
                  -> must match the large-bench warm time (~2.9 s)
  office_experiment  experiment.run_experiment on the office facade
                  (the reference's experimentation mode, main.cpp:531-626)

Writes benchmarks/results/facade_bench_r5.json.
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

import audiorenderingv2_tpu as ar
from audiorenderingv2_tpu.renderer import AudioRenderer
from audiorenderingv2_tpu.utils.profiling import timed_median
from benchmarks.large_scene import office_scene

OUT = Path(__file__).parent / "results" / "facade_bench_r5.json"
report = {"device": None}


def main():
    report["device"] = str(jax.devices()[0])
    print(f"device: {jax.devices()[0]}", flush=True)
    n_rays = int(os.environ.get("AR2_FACADE_RAYS", 1_000_000))

    # --- small scene through the facade (reference config.json workload)
    # The SAME materials list bench.py/warmup.py load (the names match no
    # scene material, so absorptions resolve to the 0.5 default either
    # way, but identical construction keeps the scene arrays — and any
    # cache keys derived from them — byte-identical).
    materials = [ar.MaterialSpec(n, a) for n, a in
                 [("low", 0.1), ("med", 0.3), ("high", 0.6),
                  ("red", 0.2), ("blue", 0.9)]]
    scene = ar.load_scene("/root/reference/assets/models/3D_U.obj",
                          materials)
    r = AudioRenderer(scene, ir_seconds=2, sample_rate=16000,
                      n_rays=n_rays, base_power=3.62, max_bounces=100,
                      hrtf_absorption_rate=0.9)
    r.set_receiver(np.array([2.5, 9.9, 0.0], np.float32), 0.0)
    on_tpu = r.opts.backend == "pallas"
    if on_tpu:  # the auto config must be the tuned one (CPU resolves xla)
        assert (r.opts.pallas_layout == "rows"
                and r.opts.pallas_unroll == 8), r.opts
    ms, cs, _ = timed_median(lambda i: r.render(), n=7, min_ms=5.0)
    report["small_facade"] = {"ms": round(ms, 1),
                              "compile_first_s": round(cs, 1),
                              "renders_per_s": round(1000.0 / ms, 2),
                              "opts": "auto(rows,u8,budgets)"}
    print(f"small facade: {ms:.1f} ms/render (compile {cs:.1f}s)",
          flush=True)

    # --- office scene through the facade
    lscene = office_scene(int(os.environ.get("AR2_FACADE_TRIS", 20000)))
    lr = AudioRenderer(lscene, ir_seconds=2, sample_rate=16000,
                       n_rays=n_rays, base_power=3.62, max_bounces=32,
                       hrtf_absorption_rate=0.9)
    lr.set_receiver(np.array([6.0, 1.0, -8.0], np.float32), 0.0)
    if on_tpu:  # the auto config must be the tuned clustered one
        assert (lr.opts.pallas_schedule
                and lr.sc.cluster_boxes is not None), lr.opts
    ms, cs, _ = timed_median(lambda i: lr.render(), n=3, min_ms=50.0)
    report["office_facade"] = {"ms": round(ms, 1),
                               "compile_first_s": round(cs, 1),
                               "renders_per_s": round(1000.0 / ms, 3),
                               "opts": "auto(schedule,cs32,tb32,su6,dir72)"}
    print(f"office facade: {ms:.0f} ms/render = {1000.0/ms:.3f} renders/s "
          f"(compile {cs:.1f}s)", flush=True)

    # --- the reference's experimentation mode on the office facade
    from audiorenderingv2_tpu.experiment import run_experiment
    from audiorenderingv2_tpu.io.wav import read_wav

    audio = read_wav(
        "/root/reference/assets/sound_samples/guitar_sample_16k.wav")
    res = run_experiment(lr, audio.mono(),
                         rounds=int(os.environ.get("AR2_FACADE_ROUNDS", 5)))
    report["office_experiment"] = {
        "median_render_ms": round(res.render.median, 1),
        "median_convolute_ms": round(res.convolute.median, 1),
        "median_convolute_process_ms": round(res.convolute_process.median,
                                             1),
        "ir_peak_cov": round(res.peak_cov, 4),
    }
    print(res.summary(), flush=True)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
