"""IR histogram accumulation without atomics.

The reference resolves write conflicts on the IR arrays with device-wide
``atomicAdd`` (devicePrograms.cu:135-166). TPUs have no atomics and XLA's
scatter-add serializes on duplicate indices, so the histogram here is built
with a sort-based, gather-only reduction:

  1. sort (bin, weight) event pairs by bin            — O(E log^2 E) on the VPU
  2. inclusive prefix-sum of the sorted weights       — O(E)
  3. per-bin boundaries via vectorized binary search  — O(B log E), gathers only
  4. histogram[b] = cumsum[end_b] - cumsum[start_b]

CAUTION — f32 cumsum swamping at scale: once the running sum grows past
~2^23 times a deposit, that deposit vanishes from the prefix sum entirely
(measured: 75% of occupied bins zeroed at 1M events with ~1e-9 weights).
On TPU, large event sets therefore dispatch to ops/histogram_pallas.py,
whose per-bin MXU accumulation is direct (median rel err ~5e-9 vs float64)
— the behavior the reference's f32 atomicAdd has. The sort path remains
for CPU/small-E use, where the sum stays within f32 resolution of the
deposits, and as the fallback when the accumulator exceeds VMEM.

Every step has a defined VJP (sort_key_val permutes, cumsum and gather are
linear), so d(hist)/d(weights) exists — this is what makes the IR
differentiable w.r.t. ray energies, and (with soft binning, see
``soft_deposit``) w.r.t. arrival delays too. Events with bin >= n_bins are
sorted past the last boundary and silently dropped, mirroring the reference's
``array_pos < ir_length`` guard (devicePrograms.cu:133).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def histogram_sum(bins: jax.Array, weights: jax.Array, n_bins: int) -> jax.Array:
    """Sum ``weights`` into ``n_bins`` buckets keyed by int32 ``bins``.

    bins/weights may have any (equal) shape; they are flattened. Entries with
    bin < 0 or bin >= n_bins are dropped. Returns float32 [n_bins].
    """
    # The n_bands=1 case of histogram_sum_banded (one implementation to
    # keep in sync); always the sort path — callers wanting the Pallas
    # kernel use the banded entry point.
    return histogram_sum_banded(bins.reshape(-1),
                                weights.reshape(-1, 1), n_bins,
                                use_pallas=False)[:, 0]


# Set False to force the sort-based path even on TPU (debug escape hatch);
# per-call control comes via the ``use_pallas`` argument below.
USE_PALLAS_HISTOGRAM = True


def histogram_sum_banded(bins: jax.Array, weights: jax.Array,
                         n_bins: int,
                         use_pallas: bool | None = None) -> jax.Array:
    """Like :func:`histogram_sum` but weights carry a trailing band axis.

    bins: int [E]; weights: [E, n_bands]. One shared sort of the bin keys
    (argsort + gather) feeds per-band cumulative sums; the binary-searched
    segment boundaries are band-independent. Returns [n_bins, n_bands].

    On TPU, large event sets route to the matmul-scatter Pallas kernel
    (ops/histogram_pallas.py) instead — the 1M-event sort is ~60 ms on a
    v5e, the kernel ~5 ms — whenever the accumulator fits VMEM. Both
    paths share this signature and gradient semantics.

    ``use_pallas``: None = auto (default backend is TPU and the event set
    is large); True/False force one path — thread False when explicitly
    placing a computation on CPU under a TPU-default process, where the
    default-backend check would mis-dispatch (TracerOptions.pallas_histogram
    plumbs this from the tracer).
    """
    bins = bins.reshape(-1)
    if bins.shape[0] != weights.shape[0]:
        # JAX gather clamps out-of-bounds indices, so a length mismatch
        # would silently double-count the last weight row instead of
        # erroring downstream.
        raise ValueError(f"{bins.shape[0]} bins but {weights.shape[0]} "
                         f"weight rows")
    if use_pallas is None:
        use_pallas = (USE_PALLAS_HISTOGRAM and bins.size >= 65536
                      and jax.default_backend() == "tpu")
    if use_pallas:
        from ..ops import histogram_pallas

        if histogram_pallas.fits_vmem(n_bins, weights.shape[-1]):
            return histogram_pallas.histogram_sum_banded_pallas(
                bins, weights.astype(jnp.float32), n_bins)
        # Accumulator past the VMEM budget (long IRs x bands): chunk the
        # BIN RANGE and keep the direct accumulation — the sort fallback's
        # f32 running sum zeroes small late deposits at millions of events
        # (module-header CAUTION). Every chunk shares one compiled kernel
        # (fixed chunk width; the tail slices its output), re-reading the
        # events per chunk — a few extra event passes instead of a
        # silently truncated reverb tail.
        chunk = histogram_pallas.max_bins(weights.shape[-1])
        if chunk >= 1:
            w32 = weights.astype(jnp.float32)
            outs = []
            for lo in range(0, n_bins, chunk):
                b = bins - lo  # in-range events land in [0, chunk)
                outs.append(histogram_pallas.histogram_sum_banded_pallas(
                    b, w32, chunk)[: min(chunk, n_bins - lo)])
            return jnp.concatenate(outs, axis=0)
    e, n_bands = weights.shape
    weights = weights.astype(jnp.float32)
    oob = (bins < 0) | (bins >= n_bins)
    bins = jnp.where(oob, n_bins, bins).astype(jnp.int32)

    order = jnp.argsort(bins)
    sorted_bins = bins[order]
    sorted_w = weights[order]
    csum = jnp.cumsum(sorted_w, axis=0)
    csum = jnp.concatenate([jnp.zeros((1, n_bands), jnp.float32), csum], axis=0)
    edges = jnp.arange(n_bins, dtype=jnp.int32)
    ends = jnp.searchsorted(sorted_bins, edges, side="right").astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    return csum[ends] - csum[starts]


# Deposit-slot construction (hard round vs soft linear interpolation) lives
# in core/tracer._slot_bins, next to its only consumer.
