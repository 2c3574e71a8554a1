import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.quantizer import (
    NonUniformQuantizer,
    dequantize,
    phase_schedule,
    power_thresholds,
    qdq_ste,
    quantize,
    quantize_dequantize,
    stack_quantizer_thresholds,
)


def test_threshold_formula():
    # tau_j = C * (j / (2^(bc-1)-1))^gamma (reference rcq_decoder.py:48-57)
    thr = power_thresholds(bc=3, C=5.0, gamma=1.5)
    assert thr.shape == (4,)
    expected = 5.0 * (np.arange(4) / 3.0) ** 1.5
    np.testing.assert_allclose(thr, expected, rtol=1e-6)
    assert thr[0] == 0.0 and thr[-1] == pytest.approx(5.0)


def test_golden_roundtrip_vector():
    # the reference's own smoke vector (rcq_decoder.py:609,
    # comprehensive_test.py:261): bc=3, C=5, gamma=1.5
    q = NonUniformQuantizer(bc=3, C=5.0, gamma=1.5)
    x = jnp.array([-3.2, -1.1, 0.5, 2.8, 4.1])
    thr = q.thresholds  # [0, 0.962, 2.722, 5.0]
    codes = np.asarray(q.quantize(x))
    # manual: |x| >= tau rule
    #  3.2 -> idx 2 (>=2.722), sign bit 1 -> 4+2=6
    #  1.1 -> idx 1, sign 1 -> 5
    #  0.5 -> idx 0, sign 0 -> 0
    #  2.8 -> idx 2 -> 2
    #  4.1 -> idx 2 -> 2
    np.testing.assert_array_equal(codes, [6, 5, 0, 2, 2])
    recon = np.asarray(q.dequantize(jnp.asarray(codes)))
    np.testing.assert_allclose(
        recon, [-thr[2], -thr[1], 0.0, thr[2], thr[2]], rtol=1e-6)


def test_qdq_idempotent():
    q = NonUniformQuantizer(bc=4, C=7.0, gamma=1.2)
    x = jnp.linspace(-9, 9, 101)
    once = q(x)
    twice = q(once)
    np.testing.assert_allclose(np.asarray(once), np.asarray(twice), atol=1e-6)


def test_qdq_matches_quantize_dequantize():
    q = NonUniformQuantizer(bc=3, C=5.0, gamma=1.5)
    x = jnp.array([-6.0, -5.0, -0.1, 0.0, 0.1, 0.96, 0.97, 2.72, 5.0, 6.0])
    fused = np.asarray(q(x))
    explicit = np.asarray(q.dequantize(q.quantize(x)))
    # the fused forms floor the dead zone at QDQ_SIGN_TINY so the sign
    # survives < 0 consumers (quantizer.py module docstring); the
    # int-code round trip stays reference-exact (+-0.0 — whose float
    # sign bit also matches the input's sign)
    from ldpc_tpu.quantizer import QDQ_SIGN_TINY
    np.testing.assert_allclose(fused, explicit, atol=QDQ_SIGN_TINY)
    np.testing.assert_array_equal(np.signbit(fused), np.asarray(x) < 0)


def test_exact_threshold_values_snap_up():
    # inclusive >= compare: a magnitude equal to a threshold gets that index
    thr = jnp.asarray(power_thresholds(3, 5.0, 1.0))  # uniform: 0, 5/3, 10/3, 5
    x = jnp.array([5 / 3, 10 / 3, 5.0])
    out = np.asarray(quantize_dequantize(x, thr))
    np.testing.assert_allclose(out, np.asarray(x), rtol=1e-6)


def test_clamp_above_max():
    q = NonUniformQuantizer(bc=3, C=5.0, gamma=1.5)
    assert float(q(jnp.asarray(100.0))) == pytest.approx(5.0)
    assert float(q(jnp.asarray(-100.0))) == pytest.approx(-5.0)


def test_phase_schedule_thirds():
    # reference rcq_decoder.py:156-167
    assert phase_schedule(10, 1).tolist() == [0] * 10
    s = phase_schedule(10, 3)
    assert s.tolist() == [0, 0, 0, 1, 1, 1, 2, 2, 2, 2]
    s = phase_schedule(10, 2)
    assert s.tolist() == [0, 0, 0, 1, 1, 1, 1, 1, 1, 1]


def test_stacked_thresholds():
    luts = stack_quantizer_thresholds(3, [(3.0, 1.3), (5.0, 1.3), (7.0, 1.3)], 9)
    assert luts.shape == (9, 4)
    np.testing.assert_allclose(luts[0], power_thresholds(3, 3.0, 1.3))
    np.testing.assert_allclose(luts[4], power_thresholds(3, 5.0, 1.3))
    np.testing.assert_allclose(luts[8], power_thresholds(3, 7.0, 1.3))


def test_ste_gradient_is_identity_in_range():
    import jax

    thr = jnp.asarray(power_thresholds(3, 5.0, 1.5))
    g = jax.grad(lambda x: qdq_ste(x, thr))(1.3)
    assert float(g) == pytest.approx(1.0)
    # outside the dynamic range the STE gradient is clipped to zero
    g = jax.grad(lambda x: qdq_ste(x, thr))(8.0)
    assert float(g) == pytest.approx(0.0)


def test_power_qdq_matches_lut():
    """Closed-form power_qdq must select exactly the same quantization level
    as the LUT quantize∘dequantize for every bit-width the framework uses
    (including values crafted to sit exactly on thresholds). Reconstructed
    values may differ by float32-vs-float64 pow rounding (≤1 ulp)."""
    from ldpc_tpu.quantizer import (power_qdq, power_thresholds,
                                    quantize_dequantize)

    rng = np.random.default_rng(0)
    for bc, C, gamma in [(3, 5.0, 1.3), (3, 3.0, 1.3), (4, 7.0, 1.5),
                         (8, 10.0, 1.3), (8, 14.0, 2.0)]:
        thr = jnp.asarray(power_thresholds(bc, C, gamma))
        x = np.concatenate([
            rng.normal(0, C, size=2000),
            np.asarray(thr),            # exactly on thresholds
            -np.asarray(thr),
            np.asarray([0.0, -0.0, C, -C, C * 1.5, -C * 1.5, 1e-9]),
        ]).astype(np.float32)
        lut = np.asarray(quantize_dequantize(jnp.asarray(x), thr))
        fast = np.asarray(power_qdq(jnp.asarray(x), C, gamma, 2 ** (bc - 1)))
        # same level for all generic inputs: map both reconstructions back to
        # the nearest-threshold index (on-device values are within 1 ulp of
        # their threshold). Inputs sitting EXACTLY on a float32 threshold may
        # legitimately differ by one level (1-ulp pow rounding; the engine
        # uses the exact LUT path for small-L quantizers where the reference
        # golden vectors live) — allow those only for on-threshold inputs.
        lut_idx = np.argmin(np.abs(np.abs(lut)[:, None] - np.asarray(thr)), 1)
        fast_idx = np.argmin(np.abs(np.abs(fast)[:, None] - np.asarray(thr)), 1)
        on_thr = np.isin(np.abs(x), np.asarray(thr))
        np.testing.assert_array_equal(lut_idx[~on_thr], fast_idx[~on_thr])
        assert np.all(np.abs(lut_idx - fast_idx) <= 1)
        np.testing.assert_array_equal(np.signbit(lut), np.signbit(fast))
        np.testing.assert_allclose(fast[~on_thr], lut[~on_thr], rtol=1e-6)


def test_staircase_qdq_bit_exact_with_lut():
    """staircase_qdq must be bit-identical to the LUT quantize∘dequantize
    (it reconstructs the same float32 threshold values by summing exact
    differences)."""
    from ldpc_tpu.quantizer import (power_thresholds, quantize_dequantize,
                                    staircase_qdq)

    rng = np.random.default_rng(1)
    for bc, C, gamma in [(2, 2.0, 1.0), (3, 5.0, 1.3), (4, 7.0, 1.5),
                         (5, 10.0, 2.0)]:
        thr = jnp.asarray(power_thresholds(bc, C, gamma))
        x = np.concatenate([
            rng.normal(0, C, size=4000),
            np.asarray(thr), -np.asarray(thr),
            np.asarray([0.0, -0.0, C * 2, -C * 2, 1e-12]),
        ]).astype(np.float32)
        a = np.asarray(quantize_dequantize(jnp.asarray(x), thr))
        b = np.asarray(staircase_qdq(jnp.asarray(x), thr))
        # identical up to accumulated step rounding: steps are exact f32
        # differences of f32 thresholds, so the sum telescopes exactly
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
        mism = np.abs(a - b) > 0
        assert mism.mean() < 0.01, f"bc={bc}: {mism.sum()} mismatches"


def test_uniform_qdq_matches_lut():
    """gamma=1 closed form selects the SAME quantizer index as the LUT
    scan for every input (incl. threshold knife edges); the reconstructed
    value agrees to 1 ulp (C*idx/M is rounded once in f32, while the LUT
    holds float64-computed thresholds)."""
    from ldpc_tpu.quantizer import (power_thresholds, quantize, uniform_qdq)

    for bv, C in ((8, 10.0), (6, 4.0), (5, 1.5)):
        levels = 2 ** (bv - 1)
        thr = power_thresholds(bv, C, 1.0)
        rng = np.random.default_rng(bv)
        x = np.concatenate([
            rng.normal(0, C, 4096).astype(np.float32),
            thr, -thr, np.nextafter(thr, np.inf), np.nextafter(thr, -np.inf),
        ]).astype(np.float32)
        a = np.asarray(uniform_qdq(jnp.asarray(x), np.float32(C), levels))
        idx_ref = np.asarray(quantize(jnp.asarray(x), jnp.asarray(thr)))
        # inputs sitting exactly ON a LUT threshold may snap one level
        # lower when the f32 closed-form threshold (C*j/M) lands 1 ulp
        # above the f64-computed LUT entry — bounded by one quantizer step
        step = C / (levels - 1)
        np.testing.assert_allclose(np.abs(a), thr[idx_ref % levels],
                                   atol=1.05 * step)
        # on generic (non-knife-edge) inputs the index matches exactly
        gen = slice(0, 4096)
        idx_a = np.rint(np.abs(a[gen]) * (levels - 1) / C).astype(np.int32)
        np.testing.assert_array_equal(idx_a, idx_ref[gen] % levels)


def test_engine_routes_gamma1_to_uniform(test_code):
    """A gamma=1 bv quantizer decodes identically through the engine's
    uniform fast path and an explicit LUT oracle comparison."""
    import ldpc_tpu
    from ldpc_tpu.channel import awgn_llr

    qp = ((5.0, 1.3),)
    a = ldpc_tpu.rcq_min_sum(test_code, bc=3, bv=8, quantizer_params=qp,
                             v2c_quantizer_params=((10.0, 1.0),),
                             max_iterations=10)
    llr = awgn_llr(jax.random.PRNGKey(3), jnp.zeros((128, 7)), 2.0)
    out = a(llr)
    # cross-check against a decoder whose spec carries gamma=1.0000001 (not
    # statically 1 -> power path); thresholds effectively identical
    b = ldpc_tpu.rcq_min_sum(test_code, bc=3, bv=8, quantizer_params=qp,
                             v2c_quantizer_params=((10.0, 1.0000001),),
                             max_iterations=10)
    ref = b(llr)
    np.testing.assert_array_equal(np.asarray(out.bits), np.asarray(ref.bits))


def test_phase_schedule_many_quantizers():
    """Q <= 3 keeps the reference's thirds rule bit-for-bit; Q > 3 (the
    paper's SSVI 'add a quantizer' extension) spreads evenly, Q == T is
    fully per-iteration."""
    from ldpc_tpu.quantizer import phase_schedule

    np.testing.assert_array_equal(phase_schedule(10, 3),
                                  [0, 0, 0, 1, 1, 1, 2, 2, 2, 2])
    np.testing.assert_array_equal(phase_schedule(10, 10), np.arange(10))
    s5 = phase_schedule(10, 5)
    assert s5[0] == 0 and s5[-1] == 4
    assert (np.diff(s5) >= 0).all()          # monotone
    assert len(np.unique(s5)) == 5           # every quantizer used
