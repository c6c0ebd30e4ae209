"""Cluster acceleration structure: Morton sort + AABBs preserve physics."""
import jax
import jax.numpy as jnp
import numpy as np

import audiorenderingv2_tpu as ar
from audiorenderingv2_tpu import accel, testing
from audiorenderingv2_tpu.core import sampling

SR = 8000


def test_sorted_scene_same_ir():
    v, t = testing.icosphere(radius=6.0, subdivisions=2)
    scene = testing.scene_from_arrays(v, t, 0.2)
    sorted_scene = accel.sort_scene_for_clusters(scene)
    assert sorted_scene.n_triangles == scene.n_triangles
    params = ar.TraceParams(sample_rate=SR, ir_length=SR, base_power=3.62,
                            max_bounces=6)
    opts = ar.TracerOptions(block_size=256, tri_chunk=128)
    dirs = sampling.sample_directions(jax.random.PRNGKey(1), 256)
    a = np.asarray(ar.trace_ir(ar.scene_to_arrays(scene, 128), dirs,
                               jnp.zeros(3), jnp.array([2.0, 0.0, 0.0]), 0.0,
                               params, opts))
    b = np.asarray(ar.trace_ir(ar.scene_to_arrays(sorted_scene, 128), dirs,
                               jnp.zeros(3), jnp.array([2.0, 0.0, 0.0]), 0.0,
                               params, opts))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-8)


def test_cluster_boxes_cover_triangles():
    v, t = testing.icosphere(radius=4.0, subdivisions=3)  # 1280 tris
    scene = accel.sort_scene_for_clusters(testing.scene_from_arrays(v, t, 0.2))
    clusters = accel.build_clusters(scene)
    assert clusters.n_clusters == scene.t_padded // accel.CLUSTER_SIZE
    valid = scene.valid > 0
    for c in range(clusters.n_clusters):
        sl = slice(c * 128, (c + 1) * 128)
        m = valid[sl]
        if not m.any():
            assert clusters.lo_x[c] == np.inf  # padding cluster: inverted box
            continue
        pts = np.concatenate([scene.v0[sl][m], scene.v1[sl][m], scene.v2[sl][m]])
        assert (pts[:, 0] >= clusters.lo_x[c] - 1e-5).all()
        assert (pts[:, 0] <= clusters.hi_x[c] + 1e-5).all()
        assert (pts[:, 2] >= clusters.lo_z[c] - 1e-5).all()
        assert (pts[:, 2] <= clusters.hi_z[c] + 1e-5).all()


def test_morton_locality():
    """Morton-sorted clusters should be much tighter than shuffled ones."""
    v, t = testing.icosphere(radius=4.0, subdivisions=3)
    rng = np.random.default_rng(0)
    raw = testing.scene_from_arrays(v, rng.permutation(t), 0.2)
    srt = accel.sort_scene_for_clusters(raw)

    def mean_volume(scene):
        cl = accel.build_clusters(scene)
        vol = ((cl.hi_x - cl.lo_x) * (cl.hi_y - cl.lo_y) * (cl.hi_z - cl.lo_z))
        return np.mean(vol[np.isfinite(vol)])

    assert mean_volume(srt) < mean_volume(raw) * 0.6


def test_cluster_culled_kernel_matches_unclulled():
    """v2 kernel with cluster culling == without (interpret mode)."""
    v, t = testing.icosphere(radius=6.0, subdivisions=3)  # 1280 tris
    scene = testing.scene_from_arrays(v, t, 0.2)
    sorted_scene, clusters = accel.prepare_scene(scene)
    assert clusters is not None
    params = ar.TraceParams(sample_rate=8000, ir_length=8000, base_power=3.62,
                            max_bounces=6)
    opts = ar.TracerOptions(backend="pallas", pallas_version=2,
                            pallas_interpret=True)
    dirs = sampling.sample_directions(jax.random.PRNGKey(2), 256)
    args = (jnp.zeros(3), jnp.array([2.0, 0.5, -1.0]), 0.0, params, opts)
    sc_cull = ar.scene_to_arrays(sorted_scene, 2048, clusters=clusters)
    sc_none = ar.scene_to_arrays(sorted_scene, 2048)
    a = np.asarray(ar.trace_ir(sc_cull, dirs, *args))
    b = np.asarray(ar.trace_ir(sc_none, dirs, *args))
    assert a.sum() > 0
    # The clustered path computes Moller-Trumbore as elementwise f32
    # chains; the unclulled group path uses an MXU dot. Same math, f32
    # rounding differs in the last bits -> tolerance above exact parity.
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_many_cluster_traversal_matches_unclulled():
    """Front-to-back traversal over many clusters (40 here) == no culling,
    including early termination and the never-reachable padding clusters."""
    from audiorenderingv2_tpu.ops import raytrace_pallas_v2 as v2

    v, t = testing.icosphere(radius=6.0, subdivisions=4)  # 5120 tris
    scene = testing.scene_from_arrays(v, t, 0.2)
    sorted_scene, clusters = accel.prepare_scene(scene)
    params = ar.TraceParams(sample_rate=8000, ir_length=8000, base_power=3.62,
                            max_bounces=4)
    opts = ar.TracerOptions(backend="pallas", pallas_version=2,
                            pallas_interpret=True)
    dirs = sampling.sample_directions(jax.random.PRNGKey(3), 128)
    args = (jnp.zeros(3), jnp.array([2.0, 0.5, -1.0]), 0.0, params, opts)
    sc_cull = ar.scene_to_arrays(sorted_scene, 2048, clusters=clusters)
    packed = v2.pack_tris_v2(sc_cull, 1)
    assert packed[2] is not None and packed[2].shape[0] == 40
    sc_none = ar.scene_to_arrays(sorted_scene, 2048)
    a = np.asarray(ar.trace_ir(sc_cull, dirs, *args))
    b = np.asarray(ar.trace_ir(sc_none, dirs, *args))
    assert a.sum() > 0
    # The clustered path computes Moller-Trumbore as elementwise f32
    # chains; the unclulled group path uses an MXU dot. Same math, f32
    # rounding differs in the last bits -> tolerance above exact parity.
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)
