"""Sort-based histogram vs numpy scatter; soft-binning gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from audiorenderingv2_tpu.core import binning


def test_histogram_matches_numpy_scatter():
    rng = np.random.default_rng(1)
    bins = rng.integers(-5, 40, size=5000).astype(np.int32)
    w = rng.normal(size=5000).astype(np.float32)
    out = np.asarray(binning.histogram_sum(jnp.asarray(bins), jnp.asarray(w), 32))
    expect = np.zeros(32, np.float64)
    for b, x in zip(bins, w):
        if 0 <= b < 32:
            expect[b] += x
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_histogram_jit_and_empty_bins():
    f = jax.jit(lambda b, w: binning.histogram_sum(b, w, 16))
    out = np.asarray(f(jnp.array([3, 3, 200, -1]), jnp.array([1.0, 2.0, 5.0, 7.0])))
    expect = np.zeros(16)
    expect[3] = 3.0
    np.testing.assert_allclose(out, expect)


def test_hard_deposit_rounds():
    from audiorenderingv2_tpu.core.tracer import _slot_bins

    bins, fracs = _slot_bins(jnp.array([1.4, 1.6, 2.5]),
                             jnp.array([True, True, True]), 10, soft=False)
    np.testing.assert_array_equal(np.asarray(bins)[:, 0], [1, 2, 2])  # round-half-even on 2.5
    np.testing.assert_allclose(np.asarray(fracs)[:, 0], 1.0)
    # inactive events route to the overflow marker
    bins, _ = _slot_bins(jnp.array([1.4]), jnp.array([False]), 10, soft=False)
    np.testing.assert_array_equal(np.asarray(bins)[:, 0], [10])


def test_soft_deposit_interpolates():
    from audiorenderingv2_tpu.core.tracer import _slot_bins

    bins, fracs = _slot_bins(jnp.array([2.25]), jnp.array([True]), 10, soft=True)
    np.testing.assert_array_equal(np.asarray(bins)[0], [2, 3])
    np.testing.assert_allclose(np.asarray(fracs)[0], [0.75, 0.25])


def test_soft_binning_delay_gradient():
    """d(hist)/d(bin position) must exist and match the interpolation slope."""
    from audiorenderingv2_tpu.core.tracer import _slot_bins

    def loss(bin_f):
        bins, ws = _slot_bins(bin_f, jnp.ones_like(bin_f, dtype=bool), 8,
                              soft=True)
        hist = binning.histogram_sum(bins, ws, 8)
        return hist[3]  # mass landing in bin 3

    g = jax.grad(loss)(jnp.array([2.4]))
    # moving the event from 2.4 toward 3 raises bin 3's mass at slope +1
    np.testing.assert_allclose(np.asarray(g), [1.0], atol=1e-6)


def test_weight_gradient_through_sort():
    def loss(w):
        hist = binning.histogram_sum(jnp.array([0, 1, 1, 5]), w, 8)
        return hist[1] * 2.0 + hist[5]

    g = jax.grad(loss)(jnp.array([1.0, 1.0, 1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(g), [0.0, 2.0, 2.0, 1.0])


def test_pallas_histogram_matches_numpy_scatter():
    """Matmul-scatter kernel (interpret mode) == float64 numpy scatter,
    including out-of-range drops and multiple bands. (Compared against the
    exact oracle rather than the sort path: the sort path's cumsum-difference
    trick carries ~1e-4 cancellation noise at this event count, while the
    kernel's per-bin MXU accumulation is direct.)"""
    from audiorenderingv2_tpu.ops import histogram_pallas

    rng = np.random.default_rng(3)
    e, n_bins, n_bands = 4096 + 77, 1000, 3
    flat = rng.integers(-10, n_bins + 50, size=e).astype(np.int32)
    w = rng.random(size=(e, n_bands)).astype(np.float32)
    got = np.asarray(histogram_pallas.histogram_sum_banded_pallas(
        jnp.asarray(flat), jnp.asarray(w), n_bins, True))
    expect = np.zeros((n_bins, n_bands), np.float64)
    for b, x in zip(flat, w):
        if 0 <= b < n_bins:
            expect[b] += x
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_pallas_histogram_weight_gradient():
    """The custom VJP (gather of the cotangent) == the sort path's grad."""
    from audiorenderingv2_tpu.ops import histogram_pallas

    rng = np.random.default_rng(4)
    e, n_bins = 600, 64
    flat = jnp.asarray(rng.integers(-3, n_bins + 3, size=e).astype(np.int32))
    w = jnp.asarray(rng.random(size=(e, 2)).astype(np.float32))
    probe = jnp.asarray(rng.random(size=(n_bins, 2)).astype(np.float32))

    g_pl = jax.grad(lambda x: jnp.sum(
        probe * histogram_pallas.histogram_sum_banded_pallas(
            flat, x, n_bins, True)))(w)
    g_sort = jax.grad(lambda x: jnp.sum(
        probe * binning.histogram_sum_banded(flat, x, n_bins)))(w)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_sort),
                               rtol=1e-5, atol=1e-6)


def test_soft_cross_ear_overflow_fallback():
    """A cross-ear deposit whose delayed bin would overflow the IR end
    falls back to the base bin in SOFT mode too (r5 fix of the r4 parity
    delta) — matching hard mode's energy placement in the last `delay`
    samples instead of dropping it."""
    import audiorenderingv2_tpu as ar
    from audiorenderingv2_tpu.core.tracer import _histogram_from_events

    params = ar.TraceParams(sample_rate=16000, ir_length=100,
                            base_power=1.0, max_bounces=4,
                            hrtf_absorption_rate=0.25)
    delay = params.cross_ear_delay
    assert delay > 0
    # one event per region: mid-IR (normal cross), tail (overflow)
    ev_bin = jnp.array([50.0, 97.0], jnp.float32)
    ev_w = jnp.array([[1.0], [1.0]], jnp.float32)
    ev_ear = jnp.array([0, 0], jnp.int32)
    hard = np.asarray(_histogram_from_events(ev_bin, ev_w, ev_ear, params,
                                             soft=False))
    soft = np.asarray(_histogram_from_events(ev_bin, ev_w, ev_ear, params,
                                             soft=True))
    # integer-bin events -> soft interp is degenerate; must match hard
    np.testing.assert_allclose(soft, hard, rtol=1e-6, atol=1e-7)
    # and the overflow cross deposit really landed at the base bin
    np.testing.assert_allclose(hard[1, 97], 0.75, rtol=1e-6)
    np.testing.assert_allclose(soft[1, 97], 0.75, rtol=1e-6)
    # energy conservation: nothing dropped in either mode
    np.testing.assert_allclose(soft.sum(), hard.sum(), rtol=1e-6)


def test_chunked_pallas_histogram_matches_sort(monkeypatch):
    """Long-IR accumulators past the VMEM budget chunk the BIN RANGE
    through the Pallas kernel (r5 fix: the silent sort-path fallback's
    f32 running sum zeroes small late deposits at scale)."""
    import jax.numpy as jnp

    from audiorenderingv2_tpu.core import binning
    from audiorenderingv2_tpu.ops import histogram_pallas as hp

    monkeypatch.setattr(hp, "_MAX_ACC_BYTES", 8 * 128 * 4 * 2)
    orig = hp.histogram_sum_banded_pallas
    monkeypatch.setattr(hp, "histogram_sum_banded_pallas",
                        lambda f, w, nb: orig(f, w, nb, interpret=True))
    assert not hp.fits_vmem(7000, 2)
    assert 1 <= hp.max_bins(2) < 7000
    rng = np.random.default_rng(0)
    bins_np = rng.integers(-5, 7100, 4096)
    w_np = rng.random((4096, 2)).astype(np.float32)
    out = binning.histogram_sum_banded(jnp.asarray(bins_np, jnp.int32),
                                       jnp.asarray(w_np), 7000,
                                       use_pallas=True)
    assert out.shape == (7000, 2)
    # float64 scatter oracle (the sort path itself carries the cumsum
    # swamping error this fix avoids, so it is NOT the reference here)
    ref = np.zeros((7000, 2))
    for b, wv in zip(bins_np, w_np.astype(np.float64)):
        if 0 <= b < 7000:
            ref[b] += wv
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-7)


def test_histogram_length_mismatch_raises():
    import jax.numpy as jnp
    import pytest

    from audiorenderingv2_tpu.core import binning

    with pytest.raises(ValueError, match="weight rows"):
        binning.histogram_sum_banded(jnp.zeros(10, jnp.int32),
                                     jnp.zeros((6, 1)), 16)
