"""Path-replay differentiation (diff/replay.py).

Replay must reproduce the forward tracer exactly on the recorded topology
(same arithmetic, no search), and its gradients must match both full-tracer
autodiff and finite differences — at O(rays * bounces) cost.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audiorenderingv2_tpu as ar
from audiorenderingv2_tpu import testing
from audiorenderingv2_tpu.core import sampling
from audiorenderingv2_tpu.core.tracer import TracerOptions, scene_to_arrays, trace_ir
from audiorenderingv2_tpu.diff import inverse, replay


def _setup(n_bands=1, absorption=0.3):
    bv, bt = testing.box_room((8.0, 6.0, 7.0))
    sv, st = testing.icosphere(radius=1.2, center=(1.5, -0.5, 1.0),
                               subdivisions=1)
    v = np.vstack([bv, sv])
    t = np.vstack([bt, st + len(bv)])
    ab = np.concatenate([np.full(len(bt), absorption, np.float32),
                         np.full(len(st), 0.55, np.float32)])
    scene = testing.scene_from_arrays(v, t, ab)
    params = ar.TraceParams(sample_rate=8000, ir_length=2000,
                            base_power=3.62, max_bounces=6,
                            energy_threshold=0.0, hrtf_absorption_rate=0.9,
                            n_bands=n_bands)
    sc = scene_to_arrays(scene, 512)
    dirs = sampling.sample_directions(jax.random.PRNGKey(7), 4096)
    emitter = jnp.array([0.0, 0.0, 0.0], jnp.float32)
    rec = jnp.array([-2.0, 1.0, -1.5], jnp.float32)
    return scene, sc, dirs, emitter, rec, params


@pytest.mark.parametrize("n_bands", [1, 2])
def test_replay_forward_matches_tracer(n_bands):
    _, sc, dirs, emitter, rec, params = _setup(n_bands=n_bands)
    opts = TracerOptions(block_size=2048, tri_chunk=512)
    ir_ref = trace_ir(sc, dirs, emitter, rec, 30.0, params, opts)

    ids, recv = replay.record_paths(sc, dirs, emitter, rec, 30.0, params, opts)
    ir_rep = replay.render_ir_replay(sc, ids, recv, dirs, emitter, rec, 30.0,
                                     params, soft_binning=False)
    # Record and replay are two differently-fused XLA programs: identical
    # arithmetic (exact match) on the CPU mesh; on chip an ulp of fusion
    # drift can round a handful of arrival bins, so compare statistically
    # there (r3 on-chip failure class, docs/ROUND4.md).
    testing.assert_ir_close(np.asarray(ir_rep), np.asarray(ir_ref),
                            rtol=1e-6, atol=1e-12)
    assert np.asarray(ir_rep).sum() > 0


def test_replay_respects_energy_threshold():
    _, sc, dirs, emitter, rec, params = _setup(absorption=0.8)
    # threshold high enough to kill rays after ~2 bounces of 0.8 absorption
    e0 = params.base_power / (dirs.shape[0] * ar.constants.SPHERE_VOLUME)
    import dataclasses
    params = dataclasses.replace(params, energy_threshold=e0 * 0.05)
    opts = TracerOptions(block_size=2048, tri_chunk=512)
    ir_ref = trace_ir(sc, dirs, emitter, rec, 0.0, params, opts)
    ids, recv = replay.record_paths(sc, dirs, emitter, rec, 0.0, params, opts)
    ir_rep = replay.render_ir_replay(sc, ids, recv, dirs, emitter, rec, 0.0,
                                     params, soft_binning=False)
    testing.assert_ir_close(np.asarray(ir_rep), np.asarray(ir_ref),
                            rtol=1e-6, atol=1e-12)


def test_replay_absorption_grad_matches_full_autodiff():
    scene, sc, dirs, emitter, rec, params = _setup()
    opts = TracerOptions(block_size=2048, tri_chunk=512, soft_binning=True,
                         early_exit=False)
    mat_ids = (np.asarray(sc.valid) > 0).astype(np.int32)  # 1 real, 0 pad
    # two-slot material table: slot1 drives every real triangle
    tri_mat = jnp.where(jnp.asarray(sc.valid) > 0, 1, 0)

    def ir_full(a):
        sc2 = sc._replace(absorption=a[tri_mat])
        return trace_ir(sc2, dirs, emitter, rec, 30.0, params, opts)

    ids, recv = replay.record_paths(sc, dirs, emitter, rec, 30.0, params, opts)

    def ir_rep(a):
        sc2 = sc._replace(absorption=a[tri_mat])
        return replay.render_ir_replay(sc2, ids, recv, dirs, emitter, rec,
                                       30.0, params, soft_binning=True)

    a0 = jnp.array([0.0, 0.35], jnp.float32)
    target = jax.lax.stop_gradient(ir_full(a0 + 0.1))
    loss_full = lambda a: jnp.sum((ir_full(a) - target) ** 2) * 1e6
    loss_rep = lambda a: jnp.sum((ir_rep(a) - target) ** 2) * 1e6
    g_full = jax.grad(loss_full)(a0)
    g_rep = jax.grad(loss_rep)(a0)
    np.testing.assert_allclose(np.asarray(g_rep), np.asarray(g_full),
                               rtol=2e-4, atol=1e-12)


def test_replay_emitter_grad_finite_difference():
    _, sc, dirs, emitter, rec, params = _setup()
    opts = TracerOptions(block_size=2048, tri_chunk=512)
    ids, recv = replay.record_paths(sc, dirs, emitter, rec, 0.0, params, opts)
    target = jax.lax.stop_gradient(replay.render_ir_replay(
        sc, ids, recv, dirs, emitter + 0.05, rec, 0.0, params))
    smooth = lambda ir: inverse.smooth_ir(ir, 3)

    def loss(em):
        ir = replay.render_ir_replay(sc, ids, recv, dirs, em, rec, 0.0, params)
        return jnp.sum((smooth(ir) - smooth(target)) ** 2) * 1e9

    g = jax.grad(loss)(emitter)
    eps = 1e-3
    for axis in range(3):
        e = jnp.zeros(3).at[axis].set(eps)
        fd = (loss(emitter + e) - loss(emitter - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[axis], float(fd),
                                   rtol=0.08, atol=1e-7)
    # gradient should pull the emitter toward the target offset (+ direction)
    assert float(jnp.sum(g)) < 0.0


def test_record_paths_receiver_counts():
    _, sc, dirs, emitter, rec, params = _setup()
    opts = TracerOptions(block_size=2048, tri_chunk=512)
    ids, recv = replay.record_paths(sc, dirs, emitter, rec, 0.0, params, opts)
    assert ids.shape == (dirs.shape[0], params.max_bounces)
    assert int((recv >= 0).sum()) > 0
    ev_bin, ev_w, ev_ear = replay.replay_events(
        sc, ids, recv, dirs, emitter, rec, 0.0, params)
    got = np.asarray(ev_w).sum(-1) > 0
    assert (got == np.asarray(recv >= 0)).all()


def test_fit_with_replay_recovers_absorption():
    """fit_scene_parameters(method='replay') recovers a uniform absorption —
    the same setup as test_gradients.py's full-autodiff fit, at
    O(rays * bounces) per step instead of O(rays * bounces * triangles)."""
    from audiorenderingv2_tpu.diff import fit_scene_parameters, render_soft_ir

    true_a = 0.35
    v, t = testing.box_room((10.0, 8.0, 9.0))
    scene = testing.scene_from_arrays(v, t, true_a)
    params = ar.TraceParams(sample_rate=4000, ir_length=4000, base_power=3.62,
                            max_bounces=4)
    rec = (1.5, 0.5, -2.0)
    opts = TracerOptions(block_size=128, tri_chunk=128)
    target = render_soft_ir(scene, params, n_rays=256, emitter=(0., 0., 0.),
                            receiver_pos=rec, opts=opts, seed=11)
    res = fit_scene_parameters(
        scene, target, params, n_rays=256, steps=60, learning_rate=0.1,
        receiver_pos=rec, seed=11, opts=opts,
        method="replay", replay_refresh=20)
    fitted = res.params["absorption"]
    assert abs(fitted[-1] - true_a) < 0.05
    assert res.losses[-1] < res.losses[0] * 0.05


def _assert_topology_equal(ids_p, ids_x, recv_p, recv_x):
    """Recorded topologies must be identical on the CPU mesh (bit-equal
    arithmetic). On chip, the two programs' f32 reductions may pick a
    different same-t winner on a handful of grazing rays (r3 triage class);
    require >= 99.5% of rays to carry identical paths there."""
    ids_p, ids_x = np.asarray(ids_p), np.asarray(ids_x)
    recv_p, recv_x = np.asarray(recv_p), np.asarray(recv_x)
    if not testing.on_tpu_suite():
        np.testing.assert_array_equal(ids_p, ids_x)
        np.testing.assert_array_equal(recv_p, recv_x)
        return
    same = ((ids_p == ids_x).all(axis=1) & (recv_p == recv_x))
    frac = same.mean()
    assert frac >= 0.995, f"only {frac:.4f} of rays share topology"


def test_record_paths_pallas_matches_xla():
    """Fast-path topology recording (Pallas kernel, interpret mode) ==
    record_paths (XLA search) — same triangle ids, same receiver steps."""
    _, sc, dirs, emitter, rec, params = _setup()
    opts = TracerOptions(block_size=2048, tri_chunk=512)
    popts = ar.TracerOptions(backend="pallas", pallas_version=2,
                             pallas_interpret=True)
    ids_x, recv_x = replay.record_paths(sc, dirs, emitter, rec, 30.0,
                                        params, opts)
    ids_p, recv_p = replay.record_paths_pallas(sc, dirs, emitter, rec, 30.0,
                                               params, popts)
    _assert_topology_equal(ids_p, ids_x, recv_p, recv_x)


def test_record_paths_pallas_clustered():
    """Recording through the cluster-culled front-to-back traversal gives
    the same topology as the XLA search (ids index the SAME sorted scene)."""
    from audiorenderingv2_tpu import accel, testing as t_

    v, t = t_.icosphere(radius=5.0, subdivisions=3)
    scene = t_.scene_from_arrays(v, t, 0.25)
    sorted_scene, clusters = accel.prepare_scene(scene)
    assert clusters is not None
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    params = ar.TraceParams(sample_rate=8000, ir_length=8000,
                            base_power=3.62, max_bounces=5)
    opts = ar.TracerOptions(block_size=256, tri_chunk=128)
    popts = ar.TracerOptions(backend="pallas", pallas_version=2,
                             pallas_interpret=True)
    dirs = sampling.sample_directions(jax.random.PRNGKey(11), 256)
    emitter = jnp.zeros(3)
    rec = jnp.array([1.5, 0.5, -0.5])
    ids_x, recv_x = replay.record_paths(sc, dirs, emitter, rec, 0.0,
                                        params, opts)
    ids_p, recv_p = replay.record_paths_pallas(sc, dirs, emitter, rec, 0.0,
                                               params, popts)
    _assert_topology_equal(ids_p, ids_x, recv_p, recv_x)
    # and the replayed IR from the pallas-recorded topology matches forward
    ir_fwd = np.asarray(ar.trace_ir(sc, dirs, emitter, rec, 0.0, params,
                                    opts))
    ir_rep = np.asarray(replay.render_ir_replay(
        sc, ids_p, recv_p, dirs, emitter, rec, 0.0, params,
        soft_binning=False))
    # replay accumulates deposits in launch order, the tracer in compacted
    # order -> f32 summation differences only (statistical on chip)
    testing.assert_ir_close(ir_rep, ir_fwd, rtol=2e-4, atol=1e-7)


def test_record_paths_pallas_clustered_schedule_mode():
    """Schedule-mode recording (the production-scale clustered gradient
    path, r5) produces the same topology as the XLA search and the legacy
    in-kernel traversal."""
    from audiorenderingv2_tpu import accel, testing as t_

    v, t = t_.icosphere(radius=5.0, subdivisions=3)
    scene = t_.scene_from_arrays(v, t, 0.25)
    sorted_scene, clusters = accel.prepare_scene(scene, cluster_size=32)
    assert clusters is not None
    sc = ar.scene_to_arrays(sorted_scene, 128, clusters=clusters)
    params = ar.TraceParams(sample_rate=8000, ir_length=8000,
                            base_power=3.62, max_bounces=5)
    opts = ar.TracerOptions(block_size=256, tri_chunk=128)
    sopts = ar.TracerOptions(backend="pallas", pallas_version=2,
                             pallas_interpret=True, pallas_schedule=True,
                             pallas_key_layout="dir72", pallas_cell_bits=5,
                             pallas_tri_block=32, pallas_sched_unroll=2)
    dirs = sampling.sample_directions(jax.random.PRNGKey(11), 256)
    emitter = jnp.zeros(3)
    rec = jnp.array([1.5, 0.5, -0.5])
    ids_x, recv_x = replay.record_paths(sc, dirs, emitter, rec, 0.0,
                                        params, opts)
    ids_s, recv_s = replay.record_paths_pallas(sc, dirs, emitter, rec, 0.0,
                                               params, sopts)
    _assert_topology_equal(ids_s, ids_x, recv_s, recv_x)
    # replayed IR from schedule-recorded topology matches the forward trace
    ir_fwd = np.asarray(ar.trace_ir(sc, dirs, emitter, rec, 0.0, params,
                                    opts))
    ir_rep = np.asarray(replay.render_ir_replay(
        sc, ids_s, recv_s, dirs, emitter, rec, 0.0, params,
        soft_binning=False))
    testing.assert_ir_close(ir_rep, ir_fwd, rtol=2e-4, atol=1e-7)
