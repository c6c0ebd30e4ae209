"""Pre-seed the persistent compilation cache for the shipped configurations.

The reference builds its OptiX pipeline from embedded PTX in seconds
(AudioRenderer.cpp:264-296); the TPU analog — a Mosaic kernel compile
through a remote-compile backend — is 20 s to minutes per new program and
highly variable. The package enables JAX's persistent compilation cache
(``__init__._enable_compile_cache``) so this cost is paid once per machine,
but a user's FIRST render still eats it interactively.

``python -m audiorenderingv2_tpu.warmup`` compiles the shipped
configurations sequentially (one process, shared cache) so every later
process — the CLI, the benches, the driver — starts warm:

  1. the headline-bench small-scene program (1M rays, rows layout,
     bench.py defaults),
  2. the schedule-mode clustered program (the large-scene / office path),
  3. the renderer-default program at the reference config.json workload.

Each entry records (cold) compile+first seconds and a warm re-run median;
the JSON lands in ``benchmarks/results/warmup_r4.json`` (or ``--out``),
which bench.py folds into its output so every round's bench JSON reports
cold vs warm startup honestly.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _timeit(fn, n=2):
    import jax
    import numpy as np

    from audiorenderingv2_tpu.utils.profiling import device_fence

    t0 = time.time()
    device_fence(fn())
    cold_s = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        device_fence(fn())
        ts.append(time.time() - t0)
    return cold_s, float(np.median(ts))


def shipped_configs():
    """The configurations the benches and CLI defaults actually run."""
    import jax.numpy as jnp

    import audiorenderingv2_tpu as ar

    # Scene construction must match bench.py EXACTLY (same materials list):
    # the scene arrays are closure-baked into the HLO as constants, so any
    # difference changes the compile-cache key and the warming is wasted.
    ref_scene = "/root/reference/assets/models/3D_U.obj"
    materials = [ar.MaterialSpec(n, a) for n, a in
                 [("low", 0.1), ("med", 0.3), ("high", 0.6),
                  ("red", 0.2), ("blue", 0.9)]]
    if os.path.exists(ref_scene):
        small_scene = ar.load_scene(ref_scene, materials)
    else:
        from audiorenderingv2_tpu import testing

        v, t = testing.box_room((14.0, 9.0, 11.0))
        small_scene = testing.scene_from_arrays(v, t, 0.3)

    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=100,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    # The shared config builder bench.py uses — ALL AR2_BENCH_* overrides
    # (not just UNROLL/LAYOUT) produce the same HLO cache key here as in a
    # bench run with the same env.
    from audiorenderingv2_tpu import tuned

    small_opts = tuned.bench_small_options()

    def small():
        import jax

        from audiorenderingv2_tpu.core.tracer import render_ir

        sc = ar.scene_to_arrays(small_scene, small_opts.tri_chunk)

        # The jit must replicate bench.py's byte for byte: pose arguments
        # TRACED (not constant-folded), and the wrapper NAMED `render` —
        # JAX's persistent cache key hashes the module's @sym_name, which
        # carries the jitted function's name, so `jit_f` can never hit a
        # `jit_render` entry even with an identical body (r4 review
        # finding; verified against bench_r4.log's 125 s post-warmup
        # compile).
        @jax.jit
        def render(key, emitter, rec, yaw):
            return render_ir(sc, key, 1_000_000, emitter, rec, yaw, params,
                             small_opts, with_stats=True)

        return lambda: render(jax.random.PRNGKey(0),
                              jnp.zeros(3, jnp.float32),
                              jnp.array([2.5, 9.9, 0.0], jnp.float32),
                              jnp.float32(0.0))

    def large():
        import jax

        from audiorenderingv2_tpu import accel
        from audiorenderingv2_tpu.core.tracer import render_ir

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from benchmarks.large_scene import office_scene

        from audiorenderingv2_tpu import tuned

        lscene = office_scene(int(os.environ.get("AR2_BENCH_LARGE_TRIS",
                                                 20000)))
        sorted_scene, clusters = accel.prepare_scene(
            lscene, cluster_size=tuned.bench_large_cluster_size())
        lsc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
        lparams = ar.TraceParams(sample_rate=16000, ir_length=32000,
                                 base_power=3.62, max_bounces=32,
                                 energy_threshold=0.0,
                                 hrtf_absorption_rate=0.9)
        lopts = tuned.bench_large_options()
        # Named `render_large` to match bench.py's jit (cache-key naming,
        # see the small() comment).
        @jax.jit
        def render_large(k):
            return render_ir(lsc, k, 1_000_000, jnp.zeros(3, jnp.float32),
                             jnp.array([6.0, 1.0, -8.0], jnp.float32), 0.0,
                             lparams, lopts, with_stats=True)

        return lambda: render_large(jax.random.PRNGKey(0))

    def renderer_default():
        import numpy as np

        from audiorenderingv2_tpu.renderer import AudioRenderer

        r = AudioRenderer(small_scene, ir_seconds=2, sample_rate=16000,
                          n_rays=1_000_000, base_power=3.62,
                          max_bounces=100)
        r.set_receiver(np.array([2.5, 9.9, 0.0]), 0.0)
        return lambda: r.render()

    return [("small_bench", small), ("large_bench", large),
            ("renderer_default", renderer_default)]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "results", "warmup_r5.json"))
    ap.add_argument("--configs", default="small_bench,large_bench,"
                    "renderer_default",
                    help="comma-separated subset to warm")
    args = ap.parse_args(argv)

    import jax

    wanted = {c.strip() for c in args.configs.split(",") if c.strip()}
    report = {"device": str(jax.devices()[0]),
              "cache_dir": jax.config.jax_compilation_cache_dir,
              "configs": {}}
    for name, build in shipped_configs():
        if name not in wanted:
            continue
        print(f"warming {name} ...", flush=True)
        try:
            fn = build()
            cold_s, warm_s = _timeit(fn)
            report["configs"][name] = {
                "compile_first_s": round(cold_s, 1),
                "warm_s": round(warm_s, 3),
            }
            print(f"  {name}: compile+first {cold_s:.1f}s, "
                  f"warm {warm_s * 1000:.1f} ms", flush=True)
        except Exception as e:  # keep warming the rest
            report["configs"][name] = {"error": repr(e)}
            print(f"  {name}: FAILED {e!r}", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
