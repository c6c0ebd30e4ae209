"""Multi-source / multi-listener rendering.

The reference supports exactly one emitter and one receiver per run
(LaunchParams.h:20-43). Production auralization wants S sources x L
listeners; on TPU this is one more batch axis:

  * :func:`render_ir_matrix` renders the [S, L] IR matrix with ONE compiled
    trace reused across pairs (pose is a traced argument, so no recompiles),
    optionally sharding each render's rays over the device mesh,
  * :func:`mix_sources` auralizes per listener: each source's dry signal is
    convolved with its IR to that listener and the results sum — linearity
    of the wave equation, same normalization as the single-source path.

Listeners are independent (a listener does not shadow another listener's
arrivals), matching how the reference would behave run L separate times.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .core import sampling
from .core.tracer import SceneArrays, TracerOptions, trace_ir
from .core.tracer_ref import TraceParams
from .ops import convolve
from .parallel.sharding import render_ir_sharded


def render_ir_matrix(
    sc: SceneArrays,
    key: jax.Array,
    emitters: np.ndarray,
    receivers: np.ndarray,
    receiver_yaws_deg: np.ndarray,
    n_rays: int,
    params: TraceParams,
    opts: TracerOptions = TracerOptions(),
    mesh=None,
) -> np.ndarray:
    """Render IRs for every (source, listener) pair.

    Args:
      emitters: [S, 3]; receivers: [L, 3]; receiver_yaws_deg: [L].
      n_rays: rays per pair render.
      mesh: optional device mesh — each pair's rays shard across it.

    Returns float32 [S, L, 2, ir_length].
    """
    emitters = np.atleast_2d(np.asarray(emitters, np.float32))
    receivers = np.atleast_2d(np.asarray(receivers, np.float32))
    # Broadcast a scalar yaw to every listener; mismatched lengths are an
    # error (a short yaw list would otherwise silently zero listener rows).
    yaws = np.broadcast_to(np.asarray(receiver_yaws_deg, np.float32),
                           (receivers.shape[0],))

    if mesh is not None:
        def one(k, em, rc, yw):
            return render_ir_sharded(sc, k, n_rays, em, rc, yw, params, opts,
                                     mesh=mesh)
    else:
        @functools.partial(jax.jit)
        def one(k, em, rc, yw):
            dirs = sampling.sample_directions(k, n_rays)
            return trace_ir(sc, dirs, em, rc, yw, params, opts)

    out = np.zeros((len(emitters), len(receivers), 2, params.ir_length),
                   np.float32)
    for si, em in enumerate(emitters):
        for li, (rc, yw) in enumerate(zip(receivers, yaws)):
            k = jax.random.fold_in(key, si * len(receivers) + li)
            out[si, li] = np.asarray(one(k, jnp.asarray(em), jnp.asarray(rc),
                                         jnp.float32(yw)))
    return out


def mix_sources(
    ir_matrix: np.ndarray,
    signals: list[np.ndarray],
    sample_rate: int,
) -> np.ndarray:
    """Auralize S sources at L listeners.

    Args:
      ir_matrix: [S, L, 2, ir_length] from :func:`render_ir_matrix`.
      signals: S mono dry signals (may have different lengths; zero-padded
        to the longest).
    Returns float32 [L, 2, max_len] — per-listener stereo mixes.
    """
    s, l = ir_matrix.shape[:2]
    if len(signals) != s:
        raise ValueError(f"{s} sources but {len(signals)} signals")
    max_len = max(sig.shape[0] for sig in signals)
    out = np.zeros((l, 2, max_len), np.float32)
    for si, sig in enumerate(signals):
        padded = np.zeros(max_len, np.float32)
        padded[: sig.shape[0]] = sig
        for li in range(l):
            out[li] += np.asarray(convolve.convolve_file_stereo(
                jnp.asarray(padded), jnp.asarray(ir_matrix[si, li]),
                sample_rate))
    return out
