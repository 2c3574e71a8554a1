"""Channel sign-convention and statistics tests (the reference's #1 defect,
SURVEY §8.1: inconsistent BPSK map vs LLR sign vs decision rule)."""

import jax
import jax.numpy as jnp
import numpy as np

import ldpc_tpu
from ldpc_tpu.channel import awgn_llr, bpsk_modulate


def test_bpsk_convention():
    bits = jnp.array([0, 1, 0, 1])
    np.testing.assert_array_equal(np.asarray(bpsk_modulate(bits)),
                                  [1.0, -1.0, 1.0, -1.0])


def test_llr_sign_consistency():
    """All-zero codeword at high SNR must give strongly positive LLRs, so
    the uncoded decision (llr < 0) recovers the zero word — the property the
    reference violates (FER -> 1.0 at 10 dB, SURVEY §8.1)."""
    key = jax.random.PRNGKey(0)
    cw = jnp.zeros((100, 32))
    llr = awgn_llr(key, cw, 10.0)
    assert float(jnp.mean(llr > 0)) > 0.999
    # and decoding at high SNR succeeds
    code = ldpc_tpu.create_test_ldpc_code()
    dec = ldpc_tpu.basic_min_sum(code)
    llr = awgn_llr(key, jnp.zeros((500, 7)), 10.0)
    out = dec(llr)
    assert float(jnp.mean(out.success)) > 0.99
    fer = float(jnp.mean(jnp.any(out.bits != 0, axis=1)))
    assert fer < 0.01


def test_llr_statistics():
    """LLR mean/variance follow the standard AWGN relations:
    mean = 2/sigma^2 (for bit 0), var = 4/sigma^2."""
    key = jax.random.PRNGKey(1)
    snr_db = 3.0
    sigma2 = 10 ** (-snr_db / 10)
    llr = awgn_llr(key, jnp.zeros((2000, 64)), snr_db)
    assert abs(float(llr.mean()) - 2 / sigma2) < 0.1 * 2 / sigma2
    assert abs(float(llr.var()) - 4 / sigma2) < 0.1 * 4 / sigma2


def test_per_sample_snr_broadcast():
    key = jax.random.PRNGKey(2)
    cw = jnp.zeros((4, 16))
    snrs = jnp.array([0.0, 2.0, 4.0, 20.0])
    llr = awgn_llr(key, cw, snrs)
    # higher SNR -> larger LLR magnitudes
    mags = np.abs(np.asarray(llr)).mean(axis=1)
    assert mags[3] > mags[0]


def test_fer_monotone_in_snr():
    """FER waterfall: FER decreases with SNR on the (7,4) code."""
    code = ldpc_tpu.create_test_ldpc_code()
    dec = ldpc_tpu.basic_min_sum(code)
    key = jax.random.PRNGKey(3)
    fers = []
    for snr in [0.0, 4.0, 8.0]:
        key, k = jax.random.split(key)
        llr = awgn_llr(k, jnp.zeros((2000, 7)), snr)
        out = dec(llr)
        fers.append(float(jnp.mean(jnp.any(out.bits != 0, axis=1))))
    assert fers[0] > fers[1] > fers[2]
