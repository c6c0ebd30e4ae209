"""Tuned tracer configurations — ONE source of truth for the fast paths.

Three consumers share these builders so a user of the product facade gets
the same measured-fastest programs the benches run (and so warmup.py warms
byte-identical HLO):

  * ``AudioRenderer`` (renderer.py) resolves ``opts=None`` through
    :func:`auto_options` — small scenes get the rows-layout/unroll-8
    config, larger scenes the schedule-mode clustered config. This is the
    r5 fix for the r4 gap where the facade ran the legacy traversal while
    all tuning lived in bench env defaults (the reference has no such gap:
    its one OptiX pipeline IS the product path, AudioRenderer.cpp:373-410).
  * ``bench.py`` builds its configs via :func:`bench_small_options` /
    :func:`bench_large_options`, which apply the AR2_BENCH_* env overrides.
  * ``warmup.py`` calls the same two builders, so every env override a
    bench run honors produces the same compile-cache key when warmed
    (previously warmup mirrored only UNROLL/LAYOUT and silently wasted the
    warming for other overrides).

The constants record what the r3/r4 on-chip tuning measured
(benchmarks/results/tune_r3b.log, tune_r4.log, tune_r4b/c.log;
docs/ROUND3.md §4c, docs/ROUND4.md §1-2).
"""
from __future__ import annotations

import os

from .core.tracer import TracerOptions

# Scenes at or above this many triangles trace through Morton clusters +
# schedule mode; below it, the flat rows-layout kernel wins (the schedule's
# per-round XLA stages cost more than brute-force intersection on tiny
# kernels). r5 on-chip bracketing (benchmarks/results/tune_r5.log /
# tune_r5b.log, 1M rays x 32 bounces, office-style scenes): schedule beats
# rows 1.8x at ~970 tris, 4.7x at 1280, 8.6x at 2560, 13.7x at 5120.
# 512 is accel.prepare_scene's clustering floor — every scene that CAN
# cluster measured faster clustered.
CLUSTER_THRESHOLD = 512

# Tuned clustered-scene settings (docs/ROUND4.md §2b).
CLUSTER_SIZE = 32
SCHED_TRI_BLOCK = 32
SCHED_UNROLL = 6

# Tuned small-scene bounce-round split at the reference's max_bounces=100
# (docs/ROUND3.md §4c: [8, 24, 68] beat 1/2/4-round alternatives).
SMALL_BUDGET_FRACS = (0.08, 0.24)
SMALL_UNROLL = 8


def round_budgets_for(max_bounces: int) -> tuple | None:
    """The tuned 3-round bounce split, scaled to ``max_bounces``.

    Exactly (8, 24, 68) at the reference's 100 bounces (keeping the
    bench/warmup cache keys stable); proportional with a floor of one
    bounce per round otherwise. Returns None below 6 bounces, where a
    3-round split degenerates (the library's default schedule handles it).
    """
    mb = int(max_bounces)
    if mb < 6:
        return None
    r1 = max(1, int(mb * SMALL_BUDGET_FRACS[0]))
    r2 = max(1, int(mb * SMALL_BUDGET_FRACS[1]))
    return (r1, r2, mb - r1 - r2)


def small_scene_options(max_bounces: int, *, rng_impl: str = "rbg",
                        tri_chunk: int = 1024) -> TracerOptions:
    """The measured-fastest flat-kernel config (rows layout + unroll 8 +
    3-round budgets + rbg directions): 79.5 ms / 1.26e7 rays/s on the
    reference workload (tune_r4.log)."""
    return TracerOptions(
        backend="pallas", tri_chunk=tri_chunk, rng_impl=rng_impl,
        pallas_layout="rows", pallas_unroll=SMALL_UNROLL,
        pallas_round_budgets=round_budgets_for(max_bounces))


def clustered_scene_options(*, rng_impl: str = "rbg") -> TracerOptions:
    """The measured-fastest clustered config (schedule mode + dir72 keys +
    32-row blocks + 6-visit unroll): 2.91 s at 20k tris x 1M rays x 32
    bounces (tune_r4b/c)."""
    return TracerOptions(
        backend="pallas", pallas_version=2, tri_chunk=128,
        rng_impl=rng_impl,
        pallas_schedule=True, pallas_key_layout="dir72",
        pallas_cell_bits=5, pallas_tri_block=SCHED_TRI_BLOCK,
        pallas_sched_unroll=SCHED_UNROLL)


def auto_options(n_triangles: int, max_bounces: int,
                 backend: str | None = None) -> tuple[TracerOptions, int | None]:
    """Resolve the tuned TracerOptions for a scene.

    Returns ``(opts, cluster_size)``; ``cluster_size`` is None when the
    scene should NOT be cluster-sorted (small scenes — clustering a tiny
    kernel only adds the schedule stages). Non-pallas backends get plain
    defaults (the XLA path is the differentiable/portable one and has no
    layout knobs).
    """
    if backend is None:
        import jax

        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend != "pallas":
        return TracerOptions(backend=backend), None
    if int(n_triangles) >= CLUSTER_THRESHOLD:
        return clustered_scene_options(), CLUSTER_SIZE
    return small_scene_options(max_bounces), None


# --------------------------------------------------------------------------
# Bench configurations (env-overridable). bench.py and warmup.py MUST build
# through these so a warmed program's cache key matches the bench's.

def bench_small_options(env=os.environ) -> TracerOptions:
    """The headline-bench small-scene config with AR2_BENCH_* overrides."""
    budgets_env = env.get("AR2_BENCH_BUDGETS", "8,24,68")
    budgets = (tuple(int(b.strip()) for b in budgets_env.split(","))
               if budgets_env.strip() else None)
    backend = env.get("AR2_BENCH_BACKEND", "pallas")
    return TracerOptions(
        block_size=int(env.get("AR2_BENCH_BLOCK", 65536)),
        tri_chunk=1024,
        backend=backend,
        rays_per_tile=int(env.get("AR2_BENCH_TILE", 256)),
        rng_impl=env.get("AR2_BENCH_RNG", "rbg"),
        pallas_layout=env.get("AR2_BENCH_LAYOUT", "rows"),
        pallas_unroll=int(env.get("AR2_BENCH_UNROLL", 8)),
        pallas_round_budgets=budgets,
        pallas_native_rng=(backend == "pallas" and
                           env.get("AR2_BENCH_NATIVE_RNG", "0") == "1"))


def bench_large_options(env=os.environ) -> TracerOptions:
    """The large-scene (clustered office) bench config with overrides."""
    return TracerOptions(
        backend="pallas", pallas_version=2,
        pallas_schedule=env.get("AR2_BENCH_SCHEDULE", "1") == "1",
        pallas_key_layout=env.get("AR2_BENCH_KEYS", "dir72"),
        pallas_cell_bits=int(env.get("AR2_BENCH_CELL_BITS", 5)),
        pallas_tri_block=int(env.get("AR2_BENCH_TRI_BLOCK",
                                     SCHED_TRI_BLOCK)),
        pallas_sched_unroll=int(env.get("AR2_BENCH_SCHED_UNROLL",
                                        SCHED_UNROLL)),
        pallas_dir_split=env.get("AR2_BENCH_DIR_SPLIT", "0") == "1")


def bench_large_cluster_size(env=os.environ) -> int:
    return int(env.get("AR2_BENCH_CLUSTER_SIZE", CLUSTER_SIZE))
