"""BASELINE config #5 scale point: 16M rays on the conference-class scene.

(The repo's conference_realsize.obj is a missing large blob,
.MISSING_LARGE_BLOBS:1 — office_scene(20000) is the stand-in, as in every
large-scene bench.) Three measurements:

  single_16m   ONE 16M-ray launch, single pose (does the event buffer +
               schedule state fit HBM at 16M? peak bytes recorded)
  chunked_16m  4 x 4M-ray launches, per-chunk histograms summed into one
               IR (the fallback shape if a single launch ever outgrows
               HBM; also the per-chunk pattern multi-chip sharding uses)
  matrix_16m   the literal config #5 workload: 4 sources x 4 listeners x
               1M rays/pair = 16M rays through the fused pose-batch path

Usage: python benchmarks/scale16m.py [single|chunked|matrix|all]
Emits one JSON line; on-chip results land in BENCH extras via bench notes.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import audiorenderingv2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

import audiorenderingv2_tpu as ar
from audiorenderingv2_tpu import accel, multi
from audiorenderingv2_tpu.core.tracer import render_ir
from audiorenderingv2_tpu.utils.profiling import timed_median
from benchmarks.large_scene import office_scene

N_TOTAL = 16_000_000
out = {}


def mem_gb():
    try:
        stats = jax.devices()[0].memory_stats()
        return round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        return None


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import os

    n_total = int(os.environ.get("AR2_16M_RAYS", N_TOTAL))
    bounces = int(os.environ.get("AR2_16M_BOUNCES", 32))
    scene = office_scene(int(os.environ.get("AR2_16M_TRIS", 20000)))
    sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=32)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=bounces,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    opts = ar.TracerOptions(backend="pallas", pallas_version=2,
                            rng_impl="rbg",
                            pallas_interpret=(jax.devices()[0].platform
                                              == "cpu"),
                            pallas_schedule=True, pallas_key_layout="dir72",
                            pallas_cell_bits=5, pallas_tri_block=32,
                            pallas_sched_unroll=6)
    em = jnp.zeros(3, jnp.float32)
    rec = jnp.array([6.0, 1.0, -8.0], jnp.float32)
    out.update(device=str(jax.devices()[0]), n_tris=int(scene.n_triangles),
               n_rays_total=n_total, bounces=bounces)
    print(f"device: {jax.devices()[0]}, {scene.n_triangles} tris, "
          f"{n_total} rays", flush=True)

    if which in ("single", "all"):
        f = jax.jit(lambda k: render_ir(sc, k, n_total, em, rec, 0.0,
                                        params, opts))
        try:
            ms, cs, _ = timed_median(
                lambda i: f(jax.random.fold_in(jax.random.PRNGKey(0), i)),
                n=2, min_ms=20.0)
            out["single_16m"] = {
                "ms": round(ms, 1), "compile_first_s": round(cs, 1),
                "rays_per_s": round(n_total / ms * 1000.0),
                "peak_hbm_gb": mem_gb()}
            print(f"single launch: {ms:.0f} ms = "
                  f"{n_total/ms*1000:.3e} rays/s, peak HBM "
                  f"{out['single_16m']['peak_hbm_gb']} GB", flush=True)
        except Exception as e:
            out["single_16m"] = {"error": repr(e)}
            print(f"single launch FAILED: {e!r}", flush=True)

    if which in ("chunked", "all"):
        n_chunk = n_total // 4
        fc = jax.jit(lambda k: render_ir(sc, k, n_chunk, em, rec, 0.0,
                                         params, opts,
                                         n_total_rays=n_total))

        def full(i):
            key = jax.random.fold_in(jax.random.PRNGKey(7), i)
            acc = None
            for c in range(4):
                ir = fc(jax.random.fold_in(key, c))
                acc = ir if acc is None else acc + ir
            return acc

        ms, cs, _ = timed_median(full, n=2, min_ms=20.0)
        out["chunked_16m"] = {
            "ms": round(ms, 1), "compile_first_s": round(cs, 1),
            "rays_per_s": round(n_total / ms * 1000.0),
            "chunks": 4, "peak_hbm_gb": mem_gb()}
        print(f"chunked (4x{n_chunk}): {ms:.0f} ms = "
              f"{n_total/ms*1000:.3e} rays/s", flush=True)

    if which in ("matrix", "all"):
        n_pair = n_total // 16
        emitters = np.array([[0.0, 0.0, 0.0], [4.0, 1.0, -2.0],
                             [-3.0, 1.5, 3.0], [6.0, 0.5, 4.0]], np.float32)
        receivers = np.array([[6.0, 1.0, -8.0], [-5.0, 1.0, 6.0],
                              [2.0, 1.7, 2.0], [-6.0, 0.8, -5.0]],
                             np.float32)
        yaws = np.array([0.0, 90.0, -45.0, 180.0], np.float32)

        def mat(i):
            irs = multi.render_ir_matrix(
                sc, jax.random.fold_in(jax.random.PRNGKey(3), i), emitters,
                receivers, yaws, n_pair, params, opts, pair_batch=8)
            s = irs.sum()
            assert np.isfinite(s) and s > 0, s
            return jnp.asarray(irs[:1, :1])  # fence target (already host)

        t0 = time.time()
        mat(0)
        cs = time.time() - t0
        ts = []
        for i in range(1, 3):
            t0 = time.time()
            mat(i)
            ts.append(time.time() - t0)
        ms = float(np.median(ts)) * 1000.0
        out["matrix_16m"] = {
            "ms": round(ms, 1), "compile_first_s": round(cs, 1),
            "rays_per_s": round(n_total / ms * 1000.0),
            "pairs": 16, "rays_per_pair": n_pair,
            "peak_hbm_gb": mem_gb()}
        print(f"4x4 matrix ({n_pair} rays/pair): {ms:.0f} ms = "
              f"{n_total/ms*1000:.3e} rays/s aggregate", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
