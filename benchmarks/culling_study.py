"""Offline culling study: tested-triangles per ray-bounce vs grouping.

Reproduces the r3 tables in docs/ROUND3.md 1b: dump a mid-render ray
population from the office bench (stage "dump", runs on the chip), then
score sort-key layouts x cluster sizes x ray-group granularities by the
exact per-ray slab-hit cluster union (numpy, CPU).

Usage:
  python benchmarks/culling_study.py dump          # writes midstate.npz
  python benchmarks/culling_study.py keys          # key/cluster table
  python benchmarks/culling_study.py groups        # group-size floor table

The reference analog of what is being tuned: OptiX's per-ray hardware BVH
traversal (AudioRenderer.cpp:95-218) tests ~log T triangles per ray; the
TPU's 128-lane tiles share one candidate list per 128 rays, so the list's
tightness IS the performance model.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STATE = Path(__file__).with_name("midstate.npz")


def _scene():
    from benchmarks.large_scene import office_scene
    return office_scene(20000)


def dump():
    import audiorenderingv2_tpu as ar
    import jax
    import jax.numpy as jnp
    from audiorenderingv2_tpu import accel
    from audiorenderingv2_tpu.core import sampling
    from audiorenderingv2_tpu.ops import raytrace_pallas as rp
    from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as rp2

    scene = _scene()
    ss, cl = accel.prepare_scene(scene)
    sc = ar.scene_to_arrays(ss, 128, clusters=cl)
    params = ar.TraceParams(sample_rate=16000, ir_length=32000,
                            base_power=3.62, max_bounces=32,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9)
    key = jax.random.PRNGKey(0)
    n = 1_000_000
    dirs = sampling.sample_directions(key, n)
    e0 = params.base_power / (n * 4.18879)
    coeffs, attrs, boxes = rp2.pack_tris_v2(sc, 1)
    scal = rp._scalars(jnp.zeros(3), jnp.array([6.0, 1.0, -8.0], jnp.float32),
                       jnp.float32(0.0), e0, params)
    st = rp.init_state(dirs, jnp.zeros(3), e0, ((n + 127) // 128) * 128,
                       ncols=rp2.state_ncols(1))
    step = jax.jit(lambda t: rp2.trace_round_v2(t, coeffs, attrs, boxes,
                                                scal, params, 1))
    sortj = jax.jit(lambda s: rp._sort_state_by_keys(
        s, rp._compaction_keys(s, True, cell_bits=3, dir_split=True)))
    tiles = rp2.to_tiles(st)
    for _ in range(16):
        tiles = rp2.to_tiles(sortj(rp2.from_tiles(step(tiles))))
    s = np.asarray(rp2.from_tiles(tiles))
    np.savez_compressed(STATE, **{c: s[:, getattr(rp, f"_C_{c}")]
                                  for c in ("PX", "PY", "PZ", "VX", "VY",
                                            "VZ", "DONE")})
    print(f"dumped {STATE}")


def _load():
    d = np.load(STATE)
    pre = "" if "PX" in d.files else "r16_"   # tolerate older tagged dumps
    P = np.stack([d[pre + "PX"], d[pre + "PY"], d[pre + "PZ"]],
                 -1).astype(np.float32)
    V = np.stack([d[pre + "VX"], d[pre + "VY"], d[pre + "VZ"]],
                 -1).astype(np.float32)
    return P, V, d[pre + "DONE"]


def _cluster_boxes(scene, cs):
    from audiorenderingv2_tpu import accel

    ss, cl = accel.prepare_scene(scene, cluster_size=cs)
    lo = np.stack([cl.lo_x, cl.lo_y, cl.lo_z], -1)
    hi = np.stack([cl.hi_x, cl.hi_y, cl.hi_z], -1)
    m = np.isfinite(lo[:, 0])
    return lo[m], hi[m]


def _keys(P, V, done, scene, layout):
    from audiorenderingv2_tpu.ops.raytrace_pallas import (_compaction_keys,
                                                          _C_DONE, _C_PX,
                                                          _C_VX)
    import jax.numpy as jnp

    st = np.zeros((len(P), 16), np.float32)
    st[:, _C_PX:_C_PX + 3] = P
    st[:, _C_VX:_C_VX + 3] = V
    st[:, _C_DONE] = done
    if layout == "legacy":
        k = _compaction_keys(jnp.asarray(st), True, cell_bits=3,
                             dir_split=True)
    else:
        k = _compaction_keys(jnp.asarray(st), True, cell_bits=5,
                             key_layout="dir72")
    return np.asarray(k)


def _union(Ps, Vs, Ds, lo, hi, group, subsample):
    n = len(Ps) // group
    take = np.arange(0, n, subsample)
    p = Ps.reshape(n, group, 3)[take]
    v = Vs.reshape(n, group, 3)[take]
    dn = Ds.reshape(n, group)[take]
    counts = np.zeros(len(take), np.int32)
    ch = max(1, 32768 // group)
    for i in range(0, len(take), ch):
        pp, vv, dd = p[i:i + ch], v[i:i + ch], dn[i:i + ch]
        inv = 1.0 / np.where(np.abs(vv) > 1e-20, vv,
                             np.where(vv >= 0, 1e-20, -1e-20))
        t1 = (lo[None, None] - pp[:, :, None]) * inv[:, :, None]
        t2 = (hi[None, None] - pp[:, :, None]) * inv[:, :, None]
        tn = np.minimum(t1, t2).max(-1)
        tf = np.maximum(t1, t2).min(-1)
        entry = np.maximum(tn, 0.0)
        ok = (tf >= entry) & (dd[:, :, None] == 0)
        counts[i:i + ch] = ok.any(1).sum(-1)
    return counts


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "keys"
    if mode == "dump":
        dump()
        return
    P, V, done = _load()
    scene = _scene()
    if mode == "keys":
        for layout in ("legacy", "dir72"):
            k = _keys(P, V, done, scene, layout)
            o = np.argsort(k, kind="stable")
            row = f"{layout:7s}:"
            for cs in (128, 64, 32):
                lo, hi = _cluster_boxes(scene, cs)
                c = _union(P[o], V[o], done[o], lo, hi, 128, 4)
                row += f"  cs{cs}: {c.mean() * cs:6.0f}"
            print(row + "   tests/ray-bounce (128-ray tiles)", flush=True)
    elif mode == "groups":
        k = _keys(P, V, done, scene, "dir72")
        o = np.argsort(k, kind="stable")
        for cs in (128, 64, 32):
            lo, hi = _cluster_boxes(scene, cs)
            row = f"cs{cs}:"
            for g, sub in ((1, 512), (8, 64), (32, 16), (128, 4)):
                c = _union(P[o], V[o], done[o], lo, hi, g, sub)
                row += f"  g{g}: {c.mean() * cs:6.0f}"
            print(row + "   tests/ray-bounce by ray-group size", flush=True)


if __name__ == "__main__":
    main()
