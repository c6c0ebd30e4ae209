"""Microbench: between-round compaction strategies at 1M x 24 f32 state.

The clustered large-scene path pays one coherent re-sort of the full ray
state per bounce (32x per render). Candidate implementations:

  A. multi-operand lax.sort: key + all 24 state columns as payload
     (the current _sort_state_by_keys)
  B. 2-operand sort (key, iota) -> row gather jnp.take(state, perm, 0)
  C. 2-operand sort (key, iota) -> column-wise gather (take per column)
  D. argsort(key) -> row gather
  E. sort keys only (lower bound: the irreducible key-sort cost)

Usage: python benchmarks/sort_bench.py [n_rays] [ncols] [variants]

``variants`` defaults to "EBCD" — A (the multi-operand sort) is OFF by
default: on the v5e axon tunnel its 25-operand sort was still compiling
after 30 minutes (kill-after-30-min observation, 2026-08-20), which is by
itself the reason the large-scene bench compile took 266 s in round 2.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import audiorenderingv2_tpu  # noqa: F401  (persistent compile cache)
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1000


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncols = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    variants = sys.argv[3].upper() if len(sys.argv) > 3 else "EBCD"
    n = ((n + 127) // 128) * 128
    print(f"device: {jax.devices()[0]}; n={n} ncols={ncols}", flush=True)

    key = jax.random.PRNGKey(0)
    state = jax.random.normal(key, (n, ncols), jnp.float32)
    # Realistic key distribution: ~8^3 cells x 24 dirs + done bit
    keys = jnp.floor(jax.random.uniform(key, (n,)) * 24576.0).astype(
        jnp.int32)

    @jax.jit
    def sort_multi(st, k):
        cols = [st[:, j] for j in range(st.shape[1])]
        out = jax.lax.sort([k, *cols], num_keys=1, is_stable=True)
        return jnp.stack(out[1:], axis=1)

    @jax.jit
    def sort_gather_rows(st, k):
        iota = jnp.arange(st.shape[0], dtype=jnp.int32)
        _, perm = jax.lax.sort([k, iota], num_keys=1, is_stable=True)
        return jnp.take(st, perm, axis=0)

    @jax.jit
    def sort_gather_cols(st, k):
        iota = jnp.arange(st.shape[0], dtype=jnp.int32)
        _, perm = jax.lax.sort([k, iota], num_keys=1, is_stable=True)
        return jnp.stack([jnp.take(st[:, j], perm) for j in
                          range(st.shape[1])], axis=1)

    @jax.jit
    def argsort_gather(st, k):
        perm = jnp.argsort(k, stable=True)
        return jnp.take(st, perm, axis=0)

    @jax.jit
    def keys_only(k):
        return jax.lax.sort([k], num_keys=1, is_stable=True)[0]

    table = {
        "A": ("A multi-operand sort", sort_multi, (state, keys)),
        "B": ("B sort+row-gather", sort_gather_rows, (state, keys)),
        "C": ("C sort+col-gather", sort_gather_cols, (state, keys)),
        "D": ("D argsort+row-gather", argsort_gather, (state, keys)),
        "E": ("E keys only", keys_only, (keys,)),
    }
    for v in variants:
        name, fn, args = table[v]
        try:
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            tc = time.time() - t0
            ms = timeit(fn, *args)
            print(f"{name}: {ms:.1f} ms (compile+first {tc:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
