"""Parameter-count goldens and variant construction behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

import ldpc_tpu


def test_param_count_goldens(test_code):
    """Reference goldens on the (7,4) code at 10 iterations:
    N-NMS 130, types 1-4: 40/40/20/20 (IMPLEMENTATION_SUMMARY.md:165-172,
    cartesian-product bucket universe)."""
    assert ldpc_tpu.neural_min_sum(test_code).param_count() == 130
    assert ldpc_tpu.neural_offset_min_sum(test_code).param_count() == 130
    assert ldpc_tpu.neural_2d_min_sum(test_code, 1).param_count() == 40
    assert ldpc_tpu.neural_2d_min_sum(test_code, 2).param_count() == 40
    assert ldpc_tpu.neural_2d_min_sum(test_code, 3).param_count() == 20
    assert ldpc_tpu.neural_2d_min_sum(test_code, 4).param_count() == 20
    assert ldpc_tpu.neural_2d_offset_min_sum(test_code, 2).param_count() == 40
    assert ldpc_tpu.basic_min_sum(test_code).param_count() == 0
    assert ldpc_tpu.rcq_min_sum(test_code).param_count() == 0
    assert ldpc_tpu.weighted_rcq(test_code, weight_sharing_type=2
                                 ).param_count() == 40


def test_invalid_sharing_type(test_code):
    with pytest.raises(ValueError):
        ldpc_tpu.neural_2d_min_sum(test_code, 7)


def test_nms_init_centered_at_reference_values(test_code):
    # neural_minsum_decoder.py:53 -> 0.7 + 0.1*randn
    dec = ldpc_tpu.neural_min_sum(test_code, seed=0)
    beta = np.asarray(dec.weights["beta"])
    assert abs(beta.mean() - 0.7) < 0.1
    # neural_2d_decoder.py:54-79 -> 0.1*randn (near zero)
    dec2 = ldpc_tpu.neural_2d_min_sum(test_code, 2, seed=0)
    assert abs(np.asarray(dec2.weights["beta"]).mean()) < 0.2
    # init='nms' re-centers shared weights for usable untrained decoders
    dec3 = ldpc_tpu.neural_2d_min_sum(test_code, 2, seed=0, init="nms")
    assert abs(np.asarray(dec3.weights["beta"]).mean() - 0.7) < 0.2
    assert abs(np.asarray(dec3.weights["alpha"]).mean() - 1.0) < 0.2


def test_ms_equals_nms_with_constant_weights(test_code):
    """N-NMS with all weights == 0.7 must equal fixed-factor min-sum."""
    ms = ldpc_tpu.basic_min_sum(test_code, factor=0.7)
    nms = ldpc_tpu.neural_min_sum(test_code)
    w = {"beta": jnp.full_like(nms.weights["beta"], 0.7), "alpha": None}
    rng = np.random.default_rng(0)
    llrs = jnp.asarray(rng.normal(0, 2, size=(64, 7)).astype(np.float32))
    a = ms(llrs)
    b = nms(llrs, weights=w)
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    np.testing.assert_allclose(np.asarray(a.posterior),
                               np.asarray(b.posterior), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.iterations),
                                  np.asarray(b.iterations))


def test_layered_converges_no_slower_than_flooding(mid_code):
    """Layered decoding with correct semantics should converge at least as
    fast as flooding on average (the reference's layered path is broken,
    SURVEY §8.3 — this asserts ours actually works)."""
    import jax

    key = jax.random.PRNGKey(0)
    from ldpc_tpu.channel import awgn_llr

    flood = ldpc_tpu.basic_min_sum(mid_code, max_iterations=20)
    layer = ldpc_tpu.make_decoder(mid_code, kind="ms", layered=True,
                                  max_iterations=20)
    cw = jnp.zeros((256, mid_code.n))
    llr = awgn_llr(key, cw, 3.0)
    a = flood(llr)
    b = layer(llr)
    # both decode correctly in the waterfall region
    assert float(jnp.mean(a.success)) > 0.9
    assert float(jnp.mean(b.success)) > 0.9
    # layered uses fewer or equal iterations on average
    assert float(jnp.mean(b.iterations)) <= float(jnp.mean(a.iterations)) + 0.5


def test_layered_rcq_matches_flooding_noiseless(test_code):
    dec = ldpc_tpu.rcq_min_sum(test_code, bc=3, layered=True)
    out = dec(jnp.full((4, 7), 10.0))
    assert bool(out.success.all())
    np.testing.assert_array_equal(np.asarray(out.bits), 0)


def test_bv_quantization_actually_quantizes(test_code):
    """The reference's bv knob is a no-op (SURVEY §8.5); ours must actually
    constrain posteriors to the bv-bit grid."""
    dec = ldpc_tpu.rcq_min_sum(test_code, bc=3, bv=3,
                               quantizer_params=[(5.0, 1.3)],
                               v2c_quantizer_params=[(10.0, 1.3)])
    rng = np.random.default_rng(0)
    llr = jnp.asarray(rng.normal(0, 2, size=(8, 7)).astype(np.float32))
    out = dec(llr)
    from ldpc_tpu.quantizer import power_thresholds

    grid = power_thresholds(3, 10.0, 1.3)
    vals = np.abs(np.asarray(out.posterior)).ravel()
    dist = np.min(np.abs(vals[:, None] - grid[None, :]), axis=1)
    assert dist.max() < 1e-5


def test_trajectory_output(test_code):
    dec = ldpc_tpu.neural_min_sum(test_code)
    llr = jnp.full((3, 7), 2.0)
    out = dec(llr, return_trajectory=True)
    assert out.posteriors_all.shape == (10, 3, 7)


@pytest.mark.parametrize("make", [
    lambda c: ldpc_tpu.basic_min_sum(c, max_iterations=8),
    lambda c: ldpc_tpu.neural_min_sum(c, max_iterations=8),
    lambda c: ldpc_tpu.neural_2d_min_sum(c, weight_sharing_type=2,
                                         max_iterations=8, init="nms"),
    lambda c: ldpc_tpu.rcq_min_sum(c, bc=3, bv=8, max_iterations=8),
    lambda c: ldpc_tpu.rcq_min_sum(c, bc=3, max_iterations=8, layered=True),
])
def test_success_implies_valid_codeword(mid_code, make):
    """Property: success=True <=> the hard decision satisfies every parity
    check (the syndrome definition, SURVEY §2b step 5)."""
    import jax

    dec = make(mid_code)
    llr = ldpc_tpu.awgn_llr(jax.random.PRNGKey(9),
                            np.zeros((128, mid_code.n), np.float32), 2.0)
    out = dec(llr)
    bits = np.asarray(out.bits)
    ok = np.asarray(out.success)
    syndrome = (mid_code.H.astype(np.int64) @ bits.T) % 2
    valid = (syndrome.sum(axis=0) == 0)
    np.testing.assert_array_equal(ok, valid)


def test_per_layer_weight_sharing():
    """per_layer=True keys weight buckets by (base row, degree bucket):
    param count multiplies by mb, and with every layer's weights set
    EQUAL the decoder is bit-identical to the plain shared one."""
    import dataclasses

    import jax
    from ldpc_tpu.channel import awgn_llr
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    rng = np.random.default_rng(2)
    lift = 16
    base = rng.integers(0, lift, size=(3, 8))
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=5)
    qc = build_qc_graph(base, lift)

    shared = ldpc_tpu.make_decoder(
        code, kind="orcq", bc=3, sharing_type=2, max_iterations=5, qc=qc,
        layered=True, seed=4)
    per = ldpc_tpu.make_decoder(
        code, kind="orcq", bc=3, sharing_type=2, max_iterations=5, qc=qc,
        layered=True, seed=4, per_layer=True)
    mb = base.shape[0]
    assert per.weights["beta"].shape[1] == mb * shared.weights["beta"].shape[1]
    assert per.weights["alpha"].shape[1] == \
        mb * shared.weights["alpha"].shape[1]
    assert per.param_count() == mb * shared.param_count()

    # tile the shared weights across layers -> identical decode
    tiled = {k: jnp.tile(w, (1, mb)) for k, w in shared.weights.items()}
    per_eq = dataclasses.replace(per, weights=tiled)
    llr = awgn_llr(jax.random.PRNGKey(1), jnp.zeros((32, code.n)), 2.0)
    a, b = shared(llr), per_eq(llr)
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    np.testing.assert_allclose(np.asarray(a.posterior),
                               np.asarray(b.posterior), rtol=1e-6)

    # the fused layered kernel resolves per-(row,degree) buckets too
    fused = dataclasses.replace(
        per_eq, qc_options={"fused": True, "batch_tile": 16,
                            "interpret": True, "dtype": jnp.float32})
    np.testing.assert_array_equal(np.asarray(fused(llr).bits),
                                  np.asarray(a.bits))

    # validation: per_layer needs QC layered + a weighted kind
    with pytest.raises(ValueError):
        ldpc_tpu.make_decoder(code, kind="orcq", bc=3, sharing_type=2,
                              max_iterations=5, qc=qc, per_layer=True)
    with pytest.raises(ValueError):
        ldpc_tpu.make_decoder(code, kind="rcq", bc=3, max_iterations=5,
                              qc=qc, layered=True, per_layer=True)
