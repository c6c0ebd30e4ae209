"""Pallas TPU histogram: sum weights into bins without sort or atomics.

The reference accumulates IR deposits with device-wide ``atomicAdd``
(devicePrograms.cu:135-166); the portable path here (core/binning.py) uses a
sort-based reduction, whose 1M-event ``argsort`` costs ~60 ms on a v5e — close
to half the render. This kernel replaces it on TPU with a matmul scatter:

The histogram (``n_bins`` padded to R*128) lives as an [R, 128] f32 block
resident in VMEM across all grid steps. Each step takes 128 events (one lane
vector) and builds two one-hot matrices by iota comparison:

    A[r, e]  = (flat[e] >> 7 == r)            [R, 128]  — bin row
    Bw[c, e] = (flat[e] & 127 == c) * w[e]    [128, 128] — bin column * weight

so ``A @ Bw^T`` is exactly "add w[e] to histogram[row[e], col[e]]" for all
128 events at once — scatter as an MXU contraction, no serialization on
duplicate bins. One-hot operands are exact in any matmul precision; weight
precision is preserved by HIGHEST (f32) accumulation.

Gradients: d(hist)/d(weights) of a histogram-sum is a pure gather
(``g_w[e] = g_hist[flat[e]]``), wired as a custom VJP — the Pallas forward
never needs differentiating. Bin indices are integers and carry no gradient.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128
# Events per grid step (unrolled event-rows of 128 lanes each).
_EV_ROWS = 16
# VMEM budget for the resident accumulator (f32 bytes, all bands).
_MAX_ACC_BYTES = 6 * 2**20


def _hist_kernel(flat_ref, w_ref, out_ref, *, rows: int, n_bands: int,
                 r_pad: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r_pad, _LANES), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    for r in range(rows):
        fl = flat_ref[0, r:r + 1, :]                    # [1, 128] int32
        a = (row_iota == (fl >> 7)).astype(jnp.float32)    # [R, 128e]
        c = (col_iota == (fl & 127)).astype(jnp.float32)   # [128c, 128e]
        for b in range(n_bands):
            bw = c * w_ref[0, b, r:r + 1, :]
            out_ref[b] += jax.lax.dot_general(
                a, bw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)


def _hist_pallas_raw(flat: jax.Array, weights: jax.Array, n_bins: int,
                     interpret: bool = False) -> jax.Array:
    """[E] int32 bins + [E, n_bands] f32 -> [n_bins, n_bands] f32 sums.

    Out-of-range bins are dropped (guarded to a sentinel slot in the pad
    rows). E is padded internally; no sort, no scatter.
    """
    e = flat.shape[0]
    n_bands = weights.shape[1]
    # Histogram rows: one spare slot for dropped events, sublane-aligned.
    r_pad = _r_pad(n_bins)
    sentinel = r_pad * _LANES - 1

    oob = (flat < 0) | (flat >= n_bins)
    flat = jnp.where(oob, sentinel, flat).astype(jnp.int32)
    weights = weights.astype(jnp.float32)

    step = _EV_ROWS * _LANES
    e_pad = -(-e // step) * step
    if e_pad != e:
        flat = jnp.pad(flat, (0, e_pad - e), constant_values=sentinel)
        weights = jnp.pad(weights, ((0, e_pad - e), (0, 0)))
    n_steps = e_pad // step

    flat2 = flat.reshape(n_steps, _EV_ROWS, _LANES)
    w2 = weights.T.reshape(n_bands, n_steps, _EV_ROWS, _LANES) \
        .transpose(1, 0, 2, 3)

    out = pl.pallas_call(
        functools.partial(_hist_kernel, rows=_EV_ROWS, n_bands=n_bands,
                          r_pad=r_pad),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, _EV_ROWS, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_bands, _EV_ROWS, _LANES),
                         lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n_bands, r_pad, _LANES),
                               lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bands, r_pad, _LANES), jnp.float32),
        interpret=interpret,
    )(flat2, w2)
    return out.reshape(n_bands, r_pad * _LANES)[:, :n_bins].T


def _r_pad(n_bins: int) -> int:
    """Accumulator rows for ``n_bins`` + 1 sentinel slot, sublane-aligned.
    The ONE definition shared by the kernel and its VMEM guard (a drifted
    copy would let fits_vmem approve allocations the kernel exceeds)."""
    r = -(-(n_bins + 1) // _LANES)
    return -(-r // 8) * 8


def fits_vmem(n_bins: int, n_bands: int) -> bool:
    return n_bands * _r_pad(n_bins) * _LANES * 4 <= _MAX_ACC_BYTES


def max_bins(n_bands: int) -> int:
    """Largest n_bins whose accumulator fits the VMEM budget — the bin-
    range chunk size binning.histogram_sum_banded uses for long IRs."""
    r_max = _MAX_ACC_BYTES // (n_bands * _LANES * 4)
    r_max = (r_max // 8) * 8
    return max(r_max * _LANES - 1, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def histogram_sum_banded_pallas(flat: jax.Array, weights: jax.Array,
                                n_bins: int,
                                interpret: bool = False) -> jax.Array:
    """Drop-in TPU replacement for ``binning.histogram_sum_banded``."""
    return _hist_pallas_raw(flat, weights, n_bins, interpret)


def _fwd(flat, weights, n_bins, interpret):
    return _hist_pallas_raw(flat, weights, n_bins, interpret), flat


def _bwd(n_bins, interpret, flat, g):
    # g: [n_bins, n_bands]. Dropped events read a zero row.
    gpad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
    idx = jnp.where((flat >= 0) & (flat < n_bins), flat, n_bins)
    return None, gpad[idx]


histogram_sum_banded_pallas.defvjp(_fwd, _bwd)
