"""Differentiable inverse rendering.

The capability the reference lacks entirely (it has no gradients anywhere):
fit scene/source parameters from a target impulse response or target audio by
gradient descent through the tracer. Enabled by two design choices upstream:

  * the tracer's fixed-topology bounce scan is reverse-differentiable
    (``TracerOptions(early_exit=False)``), with gradients flowing to
    absorption (via the per-bounce (1-a) products), to emitter/receiver pose
    (via path lengths and the receiver chord), and to geometry (via the
    precomputed plane/barycentric rows);
  * soft (linear-interpolation) binning makes d(IR)/d(arrival delay) exist
    (``TracerOptions(soft_binning=True)``), see core/binning.py.

Matches BASELINE config #4: "differentiable inverse: fit material absorption
+ source pose from target IR via gradient descent".
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import sampling
from ..core.tracer import SceneArrays, TracerOptions, scene_to_arrays, trace_ir
from ..core.tracer_ref import TraceParams
from ..scene import Scene


def material_ids_padded(scene: Scene, t_padded: int) -> jnp.ndarray:
    """Per-padded-triangle material slot: material id, or the trailing
    'no material' slot for id -1 and for padding triangles."""
    n_mats = len(scene.material_names)
    ids = np.full(t_padded, n_mats, np.int64)
    tm = scene.tri_material[:t_padded]
    ids[: tm.shape[0]] = np.where(tm < 0, n_mats, tm)
    return jnp.asarray(ids)


def with_material_absorption(sc: SceneArrays, mat_ids: jax.Array,
                             per_material: jax.Array) -> SceneArrays:
    """Rebuild SceneArrays with absorption gathered from a traced
    per-material table — the hook that lets absorption be an optimization
    variable."""
    return sc._replace(absorption=per_material[mat_ids])


def ir_loss(pred: jax.Array, target: jax.Array, kind: str = "l2") -> jax.Array:
    """Scalar IR discrepancy. 'l2' on raw energies; 'log' compares
    log(1+ir/scale) which balances early strong arrivals vs the tail."""
    if kind == "l2":
        return jnp.mean((pred - target) ** 2)
    if kind == "log":
        scale = jnp.maximum(jnp.max(target), 1e-12)
        f = lambda x: jnp.log1p(x / scale * 100.0)
        return jnp.mean((f(pred) - f(target)) ** 2)
    raise ValueError(kind)


@dataclass
class FitResult:
    params: dict
    losses: np.ndarray

    @property
    def final_loss(self) -> float:
        return float(self.losses[-1])


def _diff_opts(opts: TracerOptions) -> TracerOptions:
    # The Pallas kernel is forward-only; gradients need the XLA scan path.
    return dataclasses.replace(opts, early_exit=False, soft_binning=True,
                               remat=True, backend="xla")


def fit_scene_parameters(
    scene: Scene,
    target_ir: jax.Array,
    params: TraceParams,
    *,
    n_rays: int = 8192,
    fit_absorption: bool = True,
    fit_emitter: bool = False,
    init_emitter=(0.0, 0.0, 0.0),
    receiver_pos=(0.0, 0.0, 0.0),
    receiver_yaw_deg: float = 0.0,
    init_absorption: float = 0.5,
    steps: int = 100,
    learning_rate: float = 0.05,
    opts: TracerOptions = TracerOptions(block_size=4096),
    loss_kind: str = "log",
    seed: int = 0,
    callback: Callable[[int, float, dict], None] | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 50,
) -> FitResult:
    """Fit per-material absorption and/or emitter position to a target IR.

    Absorption is parameterized through a sigmoid so it stays in (0, 1).
    A fixed direction set (common random numbers) keeps the Monte-Carlo
    noise identical across steps, so the optimizer sees a smooth landscape.
    Returns the fitted parameters and the loss curve.
    """
    opts = _diff_opts(opts)
    sc = scene_to_arrays(scene, opts.tri_chunk)
    mat_ids = material_ids_padded(scene, sc.absorption.shape[0])
    n_mats = len(scene.material_names)

    dirs = sampling.sample_directions(jax.random.PRNGKey(seed), n_rays)
    target_ir = jnp.asarray(target_ir, jnp.float32)
    rec = jnp.asarray(receiver_pos, jnp.float32)
    yaw = jnp.float32(receiver_yaw_deg)

    theta0: dict = {}
    if fit_absorption:
        logit = float(np.log(init_absorption / (1.0 - init_absorption)))
        theta0["absorption_logits"] = jnp.full((n_mats + 1,), logit, jnp.float32)
    if fit_emitter:
        theta0["emitter"] = jnp.asarray(init_emitter, jnp.float32)
    if not theta0:
        raise ValueError("nothing to fit")

    fixed_emitter = jnp.asarray(init_emitter, jnp.float32)

    def predict(theta):
        sc_t = sc
        if fit_absorption:
            per_mat = jax.nn.sigmoid(theta["absorption_logits"])
            sc_t = with_material_absorption(sc_t, mat_ids, per_mat)
        emitter = theta.get("emitter", fixed_emitter)
        return trace_ir(sc_t, dirs, emitter, rec, yaw, params, opts)

    def loss_fn(theta):
        return ir_loss(predict(theta), target_ir, loss_kind)

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(theta0)

    @jax.jit
    def step_fn(theta, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(theta, updates), opt_state, loss

    theta = theta0
    losses = []
    start_step = 0
    if checkpoint_path is not None:
        from .checkpoint import load_fit_state, save_fit_state

        restored = load_fit_state(checkpoint_path, theta0, opt_state)
        if restored is not None:
            start_step, theta, opt_state, losses = restored

    for i in range(start_step, steps):
        theta, opt_state, loss = step_fn(theta, opt_state)
        losses.append(float(loss))
        if callback is not None:
            callback(i, float(loss), theta)
        if (checkpoint_path is not None
                and ((i + 1) % checkpoint_every == 0 or i + 1 == steps)):
            save_fit_state(checkpoint_path, i + 1, theta, opt_state, losses)

    out: dict = {}
    if fit_absorption:
        out["absorption"] = np.asarray(jax.nn.sigmoid(theta["absorption_logits"]))
    if fit_emitter:
        out["emitter"] = np.asarray(theta["emitter"])
    return FitResult(params=out, losses=np.asarray(losses))


def render_soft_ir(scene: Scene, params: TraceParams, *, n_rays: int,
                   emitter, receiver_pos, receiver_yaw_deg: float = 0.0,
                   opts: TracerOptions = TracerOptions(block_size=4096),
                   seed: int = 0) -> jax.Array:
    """Render a soft-binned target IR with the same direction stream the
    fitter uses (helper for self-consistent inverse tests/demos)."""
    opts = _diff_opts(opts)
    sc = scene_to_arrays(scene, opts.tri_chunk)
    dirs = sampling.sample_directions(jax.random.PRNGKey(seed), n_rays)
    return trace_ir(sc, dirs, jnp.asarray(emitter, jnp.float32),
                    jnp.asarray(receiver_pos, jnp.float32),
                    jnp.float32(receiver_yaw_deg), params, opts)
