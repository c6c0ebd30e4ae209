"""Mosaic microbenchmarks for the sub-tile scheduling redesign (r4).

The large-scene culling data (docs/ROUND3.md 1b) shows a ~2-4x useful-work
reduction if ray groups smaller than the 128-lane tile could follow their
own candidate cluster lists. Every such design needs one of two lane
primitives whose Mosaic cost is unknown:

  repeat   strided lane broadcast: expand a [8, 4] block to [8, 128] by
           repeating each lane value 32x (gives each 32-lane ray subgroup
           its own scalar operand, e.g. its own triangle quantity)
  slice32  static 32-lane extraction [1, 128] -> 4 x [1, 32] pieces placed
           back at different offsets (lane-group shuffles)

Each variant runs inside one Pallas kernel looped ``iters`` times over the
same VMEM data, against a pure-madd baseline of equal nominal vector work,
so the printed ratio is the overhead factor of the lane primitive. If
``repeat`` is ~1x, the quad-subgroup kernel is buildable; at >>1x the
r3 cost-model conclusion (sub-tile scheduling ~parity) stands.
"""
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ITERS = 2048
TILES = 64


def _bench(kernel, n_out_lanes=128):
    f = pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, n_out_lanes), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((TILES, 8, n_out_lanes), jnp.float32),
    )
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(TILES, 8, 128)), jnp.float32)
    g = jax.jit(lambda a: f(a))
    jax.block_until_ready(g(x))
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(g(x))
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def k_baseline(x_ref, o_ref):
    """ITERS dependent madds on one [8, 128] register — the unit of work."""
    a = x_ref[0]
    acc = jnp.zeros_like(a)
    for _ in range(ITERS):
        acc = acc * jnp.float32(0.999) + a
    o_ref[0] = acc


def k_repeat(x_ref, o_ref):
    """ITERS x (strided lane broadcast [8, 4] -> [8, 128], then one madd)."""
    a = x_ref[0]
    small = a[:, :4]
    acc = jnp.zeros_like(a)
    for _ in range(ITERS):
        wide = jnp.repeat(small, 32, axis=1)       # [8, 128]
        acc = acc * jnp.float32(0.999) + wide
        small = acc[:, :4]
    o_ref[0] = acc


def k_slice32(x_ref, o_ref):
    """ITERS x (4 static 32-lane slices re-concatenated, then one madd)."""
    a = x_ref[0]
    acc = jnp.zeros_like(a)
    for _ in range(ITERS):
        parts = [a[:, 32 * j:32 * (j + 1)] for j in (1, 0, 3, 2)]
        wide = jnp.concatenate(parts, axis=1)
        acc = acc * jnp.float32(0.999) + wide
        a = acc
    o_ref[0] = acc


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    out = {}
    base = _bench(k_baseline)
    out["baseline_ms"] = round(base, 3)
    print(f"baseline (madd only): {base:.3f} ms", flush=True)
    for name, k in (("repeat", k_repeat), ("slice32", k_slice32)):
        try:
            ms = _bench(k)
            out[f"{name}_ms"] = round(ms, 3)
            out[f"{name}_ratio"] = round(ms / base, 2)
            print(f"{name}: {ms:.3f} ms ({ms / base:.2f}x baseline)",
                  flush=True)
        except Exception as e:
            out[f"{name}_error"] = repr(e)
            print(f"{name}: FAILED {e!r}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
