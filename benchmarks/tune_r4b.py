"""r4 batch B: small-scene schedule fine-tune at unroll 8 (rows layout) +
large-scene per-visit overhead diagnosis (schedule mode).

Small (1M rays, 3D_U): rows+u8 measured 79.5 ms (tune_r4.log). With bounces
now ~2x cheaper, re-sweep the round schedule around [8,24,68].

Large (20k tris, schedule mode, tb32): tb32 only bought 5% — the per-visit
cost is NOT the post-dot tail. Hypothesis: the fori_loop scalar machinery
(SMEM id read -> VMEM dynamic slice -> serialized loop carry) taxes every
visit. Diagnosis + fix candidates:

  noint        kernel with the intersection math removed from each visit
               (loop + SMEM + dynamic slice only) — the machinery share
  su2/su4      sched_unroll: 2/4 candidate visits per fori iteration

Usage: python benchmarks/tune_r4b.py [small|large|micro|all]
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


def run(name, sc, n_rays, params, opts, rec, n_iter=5):
    f = jax.jit(lambda k: render_ir(sc, k, n_rays, jnp.zeros(3, jnp.float32),
                                    rec, 0.0, params, opts))
    # Vary the key per call (fold_in counter): repeated identical dispatches
    # measured bogus sub-ms times through the axon tunnel (tune_r4b r4 run).
    ctr = [0]

    def call():
        ctr[0] += 1
        return f(jax.random.fold_in(jax.random.PRNGKey(0), ctr[0]))

    try:
        ms, tc = timeit(call, n=n_iter)
    except Exception as e:
        print(f"{name}: FAILED {e!r}", flush=True)
        return
    out[name] = round(ms, 2)
    print(f"{name}: {ms:.2f} ms ({n_rays/ms*1000:.3e} rays/s, "
          f"compile {tc:.1f}s)", flush=True)


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
    for name, budgets in [("b3", (8, 24, 68)),       # shipped
                          ("b4", (6, 12, 24, 58)),   # r2 default shape
                          ("b3a", (6, 18, 76)),
                          ("b3b", (12, 32, 56)),
                          ("b4a", (4, 8, 24, 64))]:
        run(f"u8_{name}", sc, n_rays, params,
            ar.TracerOptions(**dict(rows, pallas_round_budgets=budgets)),
            rec)
    # unroll sensitivity at the shipped schedule
    for u in (10, 12):
        run(f"u{u}_b3", sc, n_rays, params,
            ar.TracerOptions(**dict(rows, pallas_unroll=u,
                                    pallas_round_budgets=(8, 24, 68))), rec)


def large():
    from benchmarks.large_scene import office_scene
    from audiorenderingv2_tpu.core import sampling
    from audiorenderingv2_tpu.ops import raytrace_pallas as rp
    from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2

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

    run("tb32", sc, n_rays, params, ar.TracerOptions(**base), rec, n_iter=3)
    run("tb32_su2", sc, n_rays, params,
        ar.TracerOptions(**dict(base, pallas_sched_unroll=2)), rec, n_iter=3)
    run("tb32_su4", sc, n_rays, params,
        ar.TracerOptions(**dict(base, pallas_sched_unroll=4)), rec, n_iter=3)

    # Per-visit machinery share: ONE schedule-mode round on a mid-render
    # state, intersection math removed (diag="noint") vs full.
    packed = rp2.pack_tris_v2(sc, 1, tri_block=32)
    coeffs, attrs, boxes = packed
    e0 = params.base_power / (n_rays * 4.18879)
    dirs = sampling.sample_directions(jax.random.PRNGKey(0), n_rays)
    n_pad = ((n_rays + 127) // 128) * 128
    scal = rp._scalars(jnp.zeros(3, jnp.float32), rec, jnp.float32(0.0),
                       e0, params)
    tiles = rp2.to_tiles(rp.init_state(dirs, jnp.zeros(3, jnp.float32), e0,
                                       n_pad))
    # One round on the round-0 state (round-0 candidate load is ~2.6x
    # mid-render — fine for a machinery-vs-intersection RATIO).
    sched = jax.jit(lambda t: rp2.tile_schedule(t, boxes))
    s0 = jax.block_until_ready(sched(tiles))
    for name, diag in [("round_full", "full"), ("round_noint", "noint")]:
        f = jax.jit(lambda t, s, d=diag: rp2.trace_round_v2(
            t, coeffs, attrs, boxes, scal, params, 1, sched=s, diag=d,
            tri_block=32))
        try:
            ms, tc = timeit(lambda: f(tiles, s0), n=3)
            out[name] = round(ms, 2)
            print(f"{name}: {ms:.2f} ms (compile {tc:.1f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {e!r}", flush=True)


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
