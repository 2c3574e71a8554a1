"""QC roll-based engine vs the general gather engine: bit-exact parity.

The QC fast path (ldpc_tpu/decode/qc_engine.py) must produce IDENTICAL
results to the general engine on the same lifted code — same CN
min1/min2/first-argmin semantics, leave-one-out parity, variant transforms,
quantization, convergence freezing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ldpc_tpu
from ldpc_tpu.channel import awgn_llr
from ldpc_tpu.decode.qc_engine import build_qc_graph


def _base(mb, nb, lift, seed=0, density=1.0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, lift, size=(mb, nb))
    if density < 1.0:
        mask = rng.random((mb, nb)) < (1.0 - density)
        base = np.where(mask, -1, base)
        # every row/col needs >= 1 block
        for i in range(mb):
            if (base[i] >= 0).sum() == 0:
                base[i, rng.integers(nb)] = rng.integers(lift)
        for j in range(nb):
            if (base[:, j] >= 0).sum() == 0:
                base[rng.integers(mb), j] = rng.integers(lift)
    return base


def _pair(base, lift, T, **kw):
    """(general, qc) decoders with identical weights."""
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=T)
    qc = build_qc_graph(base, lift)
    gen = ldpc_tpu.make_decoder(code, max_iterations=T, **kw)
    fast = ldpc_tpu.make_decoder(code, max_iterations=T, qc=qc, **kw)
    # same weight tables (bucket universes are identical by construction)
    fast.weights = gen.weights
    return gen, fast


T = 6


@pytest.mark.parametrize("kw", [
    dict(kind="ms", factor=0.7),
    dict(kind="nms", sharing_type=1, seed=3, init="nms"),
    dict(kind="nms", sharing_type=2, seed=1, init="nms"),
    dict(kind="nms", sharing_type=3, seed=2, init="nms"),
    dict(kind="nms", sharing_type=4, seed=4, init="nms"),
    dict(kind="oms", sharing_type=2, seed=5),
    dict(kind="rcq", bc=3,
         quantizer_params=((3.0, 1.3), (5.0, 1.3), (7.0, 1.3))),
    dict(kind="rcq", bc=3, bv=8,
         quantizer_params=((3.0, 1.3), (5.0, 1.3), (7.0, 1.3))),
    dict(kind="wrcq", bc=4, sharing_type=2, seed=6, init="nms"),
    dict(kind="orcq", bc=3, sharing_type=2, seed=7),
    dict(kind="orcq", bc=4, bv=8, sharing_type=3, seed=8),
])
def test_qc_matches_general(kw):
    base = _base(3, 8, 16, seed=0, density=0.8)
    gen, fast = _pair(base, 16, T, **kw)
    llr = awgn_llr(jax.random.PRNGKey(7),
                   jnp.zeros((32, gen.code.n)), 2.5)
    a = gen(llr)
    b = fast(llr)
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    np.testing.assert_array_equal(np.asarray(a.success),
                                  np.asarray(b.success))
    np.testing.assert_array_equal(np.asarray(a.iterations),
                                  np.asarray(b.iterations))
    np.testing.assert_allclose(np.asarray(a.posterior),
                               np.asarray(b.posterior), rtol=1e-5, atol=1e-5)


def test_qc_full_base_matrix():
    """All-blocks-present protograph (the bench code's shape)."""
    base = _base(2, 6, 32, seed=1, density=1.0)
    gen, fast = _pair(base, 32, T, kind="rcq", bc=3, bv=8)
    llr = awgn_llr(jax.random.PRNGKey(0), jnp.zeros((16, gen.code.n)), 6.0)
    a, b = gen(llr), fast(llr)
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    np.testing.assert_array_equal(np.asarray(a.iterations),
                                  np.asarray(b.iterations))


def test_qc_trajectory_and_training():
    """QC path supports return_trajectory and STE training."""
    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    base = _base(2, 6, 16, seed=2)
    code = ldpc_tpu.create_qc_code(base, lift=16, max_iterations=4)
    qc = build_qc_graph(base, 16)
    dec = ldpc_tpu.make_decoder(code, kind="wrcq", sharing_type=2, bc=3,
                                max_iterations=4, qc=qc, init="nms")
    out = dec(jnp.ones((8, code.n)), return_trajectory=True)
    assert out.posteriors_all.shape == (4, 8, code.n)
    tr = PosteriorJointTrainer(
        dec, TrainingConfig(batch_size=16, num_epochs=1, snr_range=(1, 4)))
    hist = tr.train(num_samples=32, verbose=False)
    assert np.isfinite(hist["training_losses"]).all()
    assert hist["gradient_norms"][0] > 0


def test_qc_rejects_unsupported():
    base = _base(2, 4, 8)
    code = ldpc_tpu.create_qc_code(base, lift=8, max_iterations=4)
    qc = build_qc_graph(base, 8)
    with pytest.raises(ValueError):
        ldpc_tpu.make_decoder(code, kind="nms", sharing_type=0, qc=qc)


def test_qc_noiseless_identity():
    base = _base(3, 9, 24, seed=3, density=0.7)
    code = ldpc_tpu.create_qc_code(base, lift=24, max_iterations=8)
    qc = build_qc_graph(base, 24)
    dec = ldpc_tpu.make_decoder(code, kind="ms", qc=qc, max_iterations=8)
    out = dec(jnp.full((4, code.n), 7.5))
    assert bool(jnp.all(out.success))
    assert int(out.bits.sum()) == 0
    assert out.iterations.tolist() == [1, 1, 1, 1]


def test_qc_check_every_statistically_equivalent():
    """check_every amortizes the syndrome over chunks. Freezing granularity
    changes (a frame that converges mid-chunk is sampled at the chunk end),
    so outputs are not bit-identical — but error statistics must agree and
    iteration counts land on chunk boundaries."""
    from ldpc_tpu.decode.qc_engine import qc_decode_batch

    base = _base(3, 8, 16, seed=0, density=0.8)
    code = ldpc_tpu.create_qc_code(base, lift=16, max_iterations=8)
    qc = build_qc_graph(base, 16)
    dec = ldpc_tpu.make_decoder(code, kind="rcq", bc=4, qc=qc,
                                max_iterations=8)
    llr = awgn_llr(jax.random.PRNGKey(3), jnp.zeros((512, code.n)), 3.0)
    a = qc_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                        max_iterations=8)
    b = qc_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                        max_iterations=8, check_every=4)
    fer_a = float(jnp.mean(jnp.any(a.bits != 0, axis=1)))
    fer_b = float(jnp.mean(jnp.any(b.bits != 0, axis=1)))
    assert abs(fer_a - fer_b) < 0.04
    ib = np.asarray(b.iterations)
    assert set(np.unique(ib)) <= {4, 8}
    assert abs(float(jnp.mean(a.success)) - float(jnp.mean(b.success))) < 0.04
    with pytest.raises(ValueError):
        qc_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                        max_iterations=8, check_every=3)


def test_qc_bfloat16_close_to_f32():
    from ldpc_tpu.decode.qc_engine import qc_decode_batch

    base = _base(3, 8, 16, seed=1, density=0.8)
    code = ldpc_tpu.create_qc_code(base, lift=16, max_iterations=8)
    qc = build_qc_graph(base, 16)
    dec = ldpc_tpu.make_decoder(code, kind="ms", qc=qc, max_iterations=8)
    llr = awgn_llr(jax.random.PRNGKey(5), jnp.zeros((256, code.n)), 3.5)
    a = qc_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                        max_iterations=8)
    b = qc_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                        max_iterations=8, dtype=jnp.bfloat16)
    assert b.posterior.dtype == jnp.bfloat16
    fer_a = float(jnp.mean(jnp.any(a.bits != 0, axis=1)))
    fer_b = float(jnp.mean(jnp.any(b.bits != 0, axis=1)))
    # bf16 messages: FER statistically indistinguishable at this scale
    assert abs(fer_a - fer_b) < 0.05


def test_qc_layered_matches_general_layered():
    """QC layered (base-row layers) must be bit-exact with the general
    layered engine given the same layer partition (checks within a base row
    never share a variable, so a row is a valid simultaneous layer)."""
    from ldpc_tpu.decode.engine import decode_batch_layered

    base = _base(3, 8, 16, seed=0, density=0.8)
    lift, T = 16, 6
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=T)
    qc = build_qc_graph(base, lift)
    for kw in (dict(kind="ms"), dict(kind="rcq", bc=3, bv=8),
               dict(kind="wrcq", bc=4, sharing_type=2, seed=1, init="nms")):
        gen = ldpc_tpu.make_decoder(code, max_iterations=T, **kw)
        fast = ldpc_tpu.make_decoder(code, max_iterations=T, qc=qc,
                                     layered=True, **kw)
        fast.weights = gen.weights
        # base-row layer partition for the general engine
        layers = np.stack([np.arange(i * lift, (i + 1) * lift)
                           for i in range(base.shape[0])]).astype(np.int32)
        llr = awgn_llr(jax.random.PRNGKey(11),
                       jnp.zeros((32, code.n)), 2.5)
        a = decode_batch_layered(llr, gen.weights, layers, graph=gen.graph,
                                 spec=gen.spec, max_iterations=T)
        b = fast(llr)
        np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
        np.testing.assert_array_equal(np.asarray(a.iterations),
                                      np.asarray(b.iterations))
        np.testing.assert_allclose(np.asarray(a.posterior),
                                   np.asarray(b.posterior),
                                   rtol=1e-5, atol=1e-5)


def test_qc_layered_converges_faster_than_flooding():
    base = _base(4, 10, 16, seed=2, density=0.6)
    code = ldpc_tpu.create_qc_code(base, lift=16, max_iterations=12)
    qc = build_qc_graph(base, 16)
    flood = ldpc_tpu.make_decoder(code, kind="ms", qc=qc, max_iterations=12)
    layer = ldpc_tpu.make_decoder(code, kind="ms", qc=qc, max_iterations=12,
                                  layered=True)
    llr = awgn_llr(jax.random.PRNGKey(4), jnp.zeros((256, code.n)), 3.0)
    a, b = flood(llr), layer(llr)
    # layered propagates information within an iteration -> fewer iterations
    assert float(b.iterations.mean()) <= float(a.iterations.mean()) + 0.1


def test_qc_options_respected_and_training_unaffected():
    """qc_options tune the inference path; STE/trajectory calls ignore
    check_every/dtype so training keeps f32 per-iteration semantics."""
    import dataclasses

    base = _base(2, 6, 16, seed=0)
    code = ldpc_tpu.create_qc_code(base, lift=16, max_iterations=4)
    qc = build_qc_graph(base, 16)
    dec = ldpc_tpu.make_decoder(
        code, kind="rcq", bc=3, qc=qc, max_iterations=4,
        qc_options=dict(check_every=4, dtype=jnp.bfloat16))
    llr = awgn_llr(jax.random.PRNGKey(0), jnp.zeros((16, code.n)), 4.0)
    out = dec(llr)
    assert out.posterior.dtype == jnp.bfloat16
    assert set(np.unique(np.asarray(out.iterations))) <= {4}
    # trajectory path drops the perf opts -> f32, per-iteration counts
    dec2 = dataclasses.replace(dec, qc_options=dict(check_every=4,
                                                    dtype=jnp.bfloat16))
    out2 = dec2(llr, return_trajectory=True)
    assert out2.posterior.dtype == jnp.float32
    assert out2.posteriors_all.shape[0] == 4


@pytest.mark.parametrize("kw", [
    dict(kind="ms"),
    dict(kind="nms", sharing_type=2, seed=1, init="nms"),
    dict(kind="oms", sharing_type=1, seed=2),
    dict(kind="rcq", bc=3, bv=8),
    dict(kind="wrcq", bc=4, sharing_type=3, seed=3, init="nms"),
    dict(kind="orcq", bc=3, sharing_type=2, seed=4),
])
def test_qc_row_batched_matches_general(kw):
    """Row-regular protographs take the row-batched CN path; must stay
    bit-exact with the general engine across variants."""
    base = _base(4, 9, 16, seed=5, density=1.0)  # full => row-regular
    gen, fast = _pair(base, 16, T, **kw)
    llr = awgn_llr(jax.random.PRNGKey(13), jnp.zeros((64, gen.code.n)), 3.0)
    a, b = gen(llr), fast(llr)
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    np.testing.assert_array_equal(np.asarray(a.iterations),
                                  np.asarray(b.iterations))
    np.testing.assert_allclose(np.asarray(a.posterior),
                               np.asarray(b.posterior), rtol=1e-5, atol=1e-5)
