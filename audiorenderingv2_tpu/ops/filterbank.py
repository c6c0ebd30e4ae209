"""Frequency-band filterbank for banded auralization.

The reference applies one broadband absorption per material
(devicePrograms.cu:174). Real materials absorb frequency-dependently, so the
framework supports per-band absorption (BASELINE config #2: 4 bands): the
tracer produces one IR per band, and auralization splits the dry signal into
the same bands, convolves each with its IR, and sums.

The splitter is a zero-phase FFT-domain filterbank with raised-cosine
crossovers: bands sum EXACTLY to the input (complementary gains), so a
scene with identical absorption in every band reproduces the broadband
result bit-for-bit up to float error.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Default 4-band octave-style split [Hz] (interior crossover frequencies).
DEFAULT_BAND_EDGES = (250.0, 1000.0, 4000.0)


def band_gains(n_freqs: int, sample_rate: int,
               edges=DEFAULT_BAND_EDGES, transition: float = 0.25) -> np.ndarray:
    """Complementary band gains [n_bands, n_freqs] over rfft bins.

    Each crossover is a raised-cosine with ``transition`` fractional width;
    gains sum to 1 at every frequency.
    """
    freqs = np.linspace(0, sample_rate / 2, n_freqs)
    edges = list(edges)
    n_bands = len(edges) + 1
    # lowpass response rolling off around each crossover
    lp = np.ones((len(edges), n_freqs))
    for i, f0 in enumerate(edges):
        width = f0 * transition
        lo, hi = f0 - width, f0 + width
        ramp = np.clip((freqs - lo) / max(hi - lo, 1e-9), 0.0, 1.0)
        lp[i] = 0.5 * (1.0 + np.cos(np.pi * ramp))
    # band b = lp[b] - lp[b-1]; ends are lp[0] and 1 - lp[-1]; sums to 1.
    gains = np.empty((n_bands, n_freqs))
    gains[0] = lp[0]
    for b in range(1, n_bands - 1):
        gains[b] = lp[b] - lp[b - 1]
    gains[n_bands - 1] = 1.0 - lp[-1]
    return gains.astype(np.float32)


def split_bands(x: jax.Array, sample_rate: int,
                edges=DEFAULT_BAND_EDGES) -> jax.Array:
    """Split a signal [L] into complementary bands [n_bands, L]
    (zero-phase FFT filtering; bands sum to x exactly)."""
    x = jnp.asarray(x, jnp.float32)
    length = x.shape[0]
    spec = jnp.fft.rfft(x)
    gains = jnp.asarray(band_gains(spec.shape[0], sample_rate, edges))
    return jnp.fft.irfft(spec[None, :] * gains, n=length, axis=-1)


@functools.partial(jax.jit, static_argnames=("sample_rate", "edges"))
def convolve_file_banded(samples: jax.Array, ir_banded: jax.Array,
                         sample_rate: int,
                         edges=DEFAULT_BAND_EDGES) -> jax.Array:
    """Banded overlap-add auralization.

    ir_banded: [2, n_bands, ir_length]. The dry signal is band-split with the
    matching filterbank; each band convolves (reference overlap-add scheme,
    ops/convolve.py) with its band IR and the bands sum.
    Returns float32 [2, L].
    """
    from . import convolve

    n_bands = ir_banded.shape[1]
    if n_bands == 1:
        return convolve.convolve_file_stereo(samples, ir_banded[:, 0], sample_rate)
    bands = split_bands(samples, sample_rate, edges)  # [B, L]

    def per_band(sig_b, ir_b):  # ir_b [2, n]
        return convolve.convolve_file_stereo(sig_b, ir_b, sample_rate)

    out = jax.vmap(per_band, in_axes=(0, 1))(bands, ir_banded)  # [B, 2, L]
    return jnp.sum(out, axis=0)


def convolve_live_banded(block: jax.Array, ir_banded: jax.Array,
                         sample_rate: int,
                         edges=DEFAULT_BAND_EDGES) -> jax.Array:
    """Banded live-block circular convolution. ir_banded [2, n_bands, n];
    block [n]. Returns [2, n]."""
    from . import convolve

    n_bands = ir_banded.shape[1]
    if n_bands == 1:
        return convolve.convolve_live(block, ir_banded[:, 0])
    bands = split_bands(block, sample_rate, edges)  # [B, n]
    out = jax.vmap(convolve.convolve_live, in_axes=(0, 1))(bands, ir_banded)
    return jnp.sum(out, axis=0)
