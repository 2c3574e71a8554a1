"""Pallas fused QC kernels vs the XLA QC engine (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ldpc_tpu
from ldpc_tpu.channel import awgn_llr
from ldpc_tpu.decode.pallas_qc import qc_pallas_decode_batch
from ldpc_tpu.decode.qc_engine import build_qc_graph, qc_decode_batch


def _setup(seed=0, density=1.0, lift=16, mb=3, nb=8, T=6, **kw):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, lift, size=(mb, nb))
    if density < 1.0:
        mask = rng.random((mb, nb)) < (1.0 - density)
        base = np.where(mask, -1, base)
        for i in range(mb):
            if (base[i] >= 0).sum() == 0:
                base[i, rng.integers(nb)] = rng.integers(lift)
        for j in range(nb):
            if (base[:, j] >= 0).sum() == 0:
                base[rng.integers(mb), j] = rng.integers(lift)
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=T)
    qc = build_qc_graph(base, lift)
    dec = ldpc_tpu.make_decoder(code, max_iterations=T, qc=qc, **kw)
    return code, qc, dec


@pytest.mark.parametrize("kw", [
    dict(kind="ms", factor=0.7),
    dict(kind="nms", sharing_type=2, seed=1, init="nms"),
    dict(kind="oms", sharing_type=2, seed=5),
    dict(kind="rcq", bc=3,
         quantizer_params=((3.0, 1.3), (5.0, 1.3), (7.0, 1.3))),
    dict(kind="rcq", bc=3, bv=8,
         quantizer_params=((3.0, 1.3), (5.0, 1.3), (7.0, 1.3))),
    dict(kind="wrcq", bc=4, sharing_type=2, seed=6, init="nms"),
    dict(kind="orcq", bc=3, sharing_type=2, seed=7),
])
def test_pallas_matches_qc_engine(kw):
    code, qc, dec = _setup(density=0.8, **kw)
    llr = awgn_llr(jax.random.PRNGKey(7), jnp.zeros((128, code.n)), 2.5)
    a = qc_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                        max_iterations=6, dtype=jnp.float32)
    b = qc_pallas_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                               max_iterations=6, dtype=jnp.float32,
                               batch_tile=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    np.testing.assert_array_equal(np.asarray(a.success),
                                  np.asarray(b.success))
    np.testing.assert_array_equal(np.asarray(a.iterations),
                                  np.asarray(b.iterations))
    np.testing.assert_allclose(np.asarray(a.posterior),
                               np.asarray(b.posterior), rtol=1e-5, atol=1e-5)


def test_pallas_check_every_and_bf16():
    code, qc, dec = _setup(kind="rcq", bc=3, bv=8)
    llr = awgn_llr(jax.random.PRNGKey(2), jnp.zeros((128, code.n)), 5.0)
    a = qc_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                        max_iterations=6, check_every=3,
                        dtype=jnp.bfloat16)
    b = qc_pallas_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                               max_iterations=6, check_every=3,
                               dtype=jnp.bfloat16, batch_tile=64,
                               interpret=True)
    # same dtype, same chunking -> identical decisions
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    np.testing.assert_array_equal(np.asarray(a.iterations),
                                  np.asarray(b.iterations))


def test_pallas_rejects_bad_tile():
    code, qc, dec = _setup(kind="ms")
    llr = jnp.ones((100, code.n))
    with pytest.raises(ValueError):
        qc_pallas_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                               max_iterations=6, batch_tile=64,
                               interpret=True)
