"""Production-scale gradients on a CLUSTERED scene (VERDICT r4 #4).

The r4 gap: `record_paths_pallas` always ran the legacy in-kernel
traversal, so recording topology on a 20k-triangle scene paid ~373 ms per
1-bounce round. r5 threads schedule mode (per-round XLA candidate lists +
dir72 coherent sorts) through the recorder; this bench times the full
gradient step on the 20k-tri office at 1M rays x 32 bounces:

  record   record_paths_pallas, schedule mode (one topology refresh)
  replay   render_ir_replay forward from the recorded topology
  grad     d(MSE(replayed IR, target))/d(absorption logits)

plus the correctness gate at a mid-scale (65k rays x 12 bounces) where the
direct XLA autodiff through the full nearest-hit search is still
affordable: replay grad must match XLA grad to 1% — on the SAME device.

Usage: python benchmarks/grad_bench_clustered.py [n_rays] [bounces]
Emits one JSON line.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import audiorenderingv2_tpu  # noqa: F401  (persistent compile cache)
import jax
import jax.numpy as jnp

import audiorenderingv2_tpu as ar
from audiorenderingv2_tpu import accel
from audiorenderingv2_tpu.core import sampling
from audiorenderingv2_tpu.core.tracer import trace_ir
from audiorenderingv2_tpu.diff import replay
from audiorenderingv2_tpu.diff.inverse import with_material_absorption
from audiorenderingv2_tpu.utils.profiling import timed_median
from benchmarks.large_scene import office_scene


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out = {"device": str(jax.devices()[0]), "n_rays": n_rays,
           "bounces": bounces, "scene": "office_20k"}
    print(f"device: {jax.devices()[0]}", flush=True)

    import os
    scene = office_scene(int(os.environ.get("AR2_GRAD_TRIS", 20000)))
    sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=32)
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    out["n_tris"] = int(scene.n_triangles)
    mat_ids = jnp.zeros((sc.plane_n.shape[0],), jnp.int32)
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=bounces,
                            energy_threshold=0.0)
    # The r5 schedule-mode recording path (tuned clustered config).
    popts = ar.TracerOptions(
        backend="pallas", pallas_version=2,
        pallas_interpret=(jax.devices()[0].platform == "cpu"),
        pallas_schedule=True, pallas_key_layout="dir72",
        pallas_cell_bits=5, pallas_tri_block=32, pallas_sched_unroll=6)
    emitter = jnp.zeros(3, jnp.float32)
    rec = jnp.array([6.0, 1.0, -8.0], jnp.float32)
    dirs = sampling.sample_directions(jax.random.PRNGKey(0), n_rays)

    # --- record (the r5 lever: schedule-mode rounds) ---
    rec_fn = jax.jit(lambda d: replay.record_paths_pallas(
        sc, d, emitter, rec, 0.0, params, popts))
    ms, cs, _ = timed_median(lambda i: rec_fn(dirs), n=3, min_ms=5.0)
    out["record_ms"], out["record_compile_s"] = round(ms, 1), round(cs, 1)
    print(f"record (schedule mode): {ms:.1f} ms "
          f"(compile+first {cs:.1f}s)", flush=True)
    tri_ids, recv = rec_fn(dirs)
    tri_ids = jnp.asarray(np.asarray(tri_ids))  # settle before timing below
    recv = jnp.asarray(np.asarray(recv))
    out["recv_hits"] = int((np.asarray(recv) >= 0).sum())

    # --- replay forward ---
    def replay_ir(logits, ids, rv, d):
        sc_t = with_material_absorption(sc, mat_ids,
                                        jax.nn.sigmoid(logits))
        return replay.render_ir_replay(sc_t, ids, rv, d, emitter, rec, 0.0,
                                       params, soft_binning=False)

    logits = jnp.zeros((1,), jnp.float32)
    rep_fn = jax.jit(replay_ir)
    ms, cs, _ = timed_median(lambda i: rep_fn(logits, tri_ids, recv, dirs),
                             n=3, min_ms=1.0)
    out["replay_ms"], out["replay_compile_s"] = round(ms, 1), round(cs, 1)
    print(f"replay: {ms:.1f} ms (compile+first {cs:.1f}s)", flush=True)
    target = jnp.asarray(np.asarray(rep_fn(logits, tri_ids, recv, dirs)))
    target = target * 0.9

    # --- grad ---
    def loss(lg, ids, rv, d):
        ir = replay_ir(lg, ids, rv, d)
        return jnp.mean((ir - target) ** 2) * 1e12

    grad_fn = jax.jit(jax.grad(loss))

    def gcall(i):
        g = grad_fn(logits, tri_ids, recv, dirs)
        return jnp.abs(g) + 1e-30  # fence-able positive scalar

    ms, cs, _ = timed_median(gcall, n=3, min_ms=1.0)
    out["grad_ms"], out["grad_compile_s"] = round(ms, 1), round(cs, 1)
    g_big = float(np.asarray(grad_fn(logits, tri_ids, recv, dirs))[0])
    print(f"grad: {ms:.1f} ms (compile+first {cs:.1f}s); g={g_big:.6e}",
          flush=True)
    out["step_total_ms"] = round(out["record_ms"] + out["replay_ms"]
                                 + out["grad_ms"], 1)
    out["grad_steps_per_s_topology_each_step"] = round(
        1000.0 / out["step_total_ms"], 3)
    out["grad_steps_per_s_replay_only"] = round(
        1000.0 / (out["replay_ms"] + out["grad_ms"]), 3)

    # --- mid-scale correctness gate (replay vs direct XLA autodiff) ---
    import os
    n_small = int(os.environ.get("AR2_GRAD_GATE_RAYS", 16384))
    b_small = int(os.environ.get("AR2_GRAD_GATE_BOUNCES", 8))
    p_small = ar.TraceParams(sample_rate=16000, ir_length=32000,
                             base_power=3.62, max_bounces=b_small,
                             energy_threshold=0.0)
    d_small = sampling.sample_directions(jax.random.PRNGKey(1), n_small)
    # Direct autodiff through the full nearest-hit search at 20k tris is
    # activation-memory-bound: small blocks + remat keep it inside HBM.
    # tri_chunk must divide sc's padded triangle count (packed at 128).
    xopts = ar.TracerOptions(block_size=2048, tri_chunk=128,
                             early_exit=False, remat=True)
    ids_s, recv_s = jax.jit(lambda d: replay.record_paths_pallas(
        sc, d, emitter, rec, 0.0, p_small, popts))(d_small)

    tgt_s = jax.jit(lambda lg: replay.render_ir_replay(
        with_material_absorption(sc, mat_ids, jax.nn.sigmoid(lg)),
        ids_s, recv_s, d_small, emitter, rec, 0.0, p_small,
        soft_binning=False))(logits) * 0.9

    def loss_xla(lg):
        sc_t = with_material_absorption(sc, mat_ids, jax.nn.sigmoid(lg))
        ir = trace_ir(sc_t, d_small, emitter, rec, 0.0, p_small, xopts)
        return jnp.mean((ir - tgt_s) ** 2) * 1e12

    def loss_rep(lg):
        sc_t = with_material_absorption(sc, mat_ids, jax.nn.sigmoid(lg))
        ir = replay.render_ir_replay(sc_t, ids_s, recv_s, d_small, emitter,
                                     rec, 0.0, p_small, soft_binning=False)
        return jnp.mean((ir - tgt_s) ** 2) * 1e12

    t0 = time.time()
    g_x = float(np.asarray(jax.jit(jax.grad(loss_xla))(logits))[0])
    print(f"xla autodiff gate ran in {time.time()-t0:.1f}s", flush=True)
    g_r = float(np.asarray(jax.jit(jax.grad(loss_rep))(logits))[0])
    rel = abs(g_x - g_r) / max(abs(g_x), 1e-30)
    out["grad_match"] = {"n_rays": n_small, "bounces": b_small,
                         "g_xla": g_x, "g_replay": g_r,
                         "rel_err": rel, "ok": bool(rel < 1e-2)}
    print(f"grad match @ {n_small} rays x {b_small} bounces: "
          f"xla={g_x:.6e} replay={g_r:.6e} rel={rel:.2e}", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
