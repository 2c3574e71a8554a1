"""Systematic GF(2) encoder: validity, systematic property, end-to-end
decode of real (nonzero) codewords — the test the all-zero-codeword
simulation methodology rests on."""

import jax
import jax.numpy as jnp
import numpy as np

import ldpc_tpu
from ldpc_tpu.channel import awgn_llr
from ldpc_tpu.encode import gf2_row_reduce, make_encoder


def test_rref_small():
    H = np.array([[1, 1, 0, 1], [0, 1, 1, 1]], np.uint8)
    R, piv = gf2_row_reduce(H)
    assert list(piv) == [0, 1]
    # RREF: pivot columns are unit vectors
    np.testing.assert_array_equal(R[:, piv], np.eye(2, dtype=np.uint8))


def test_encode_74_exhaustive():
    # NOTE: the reference's "(7,4)" H has FOUR independent rows
    # (ldpc_decoder.py:18-23), so the code it defines is really (7,3) —
    # the encoder reports the true dimension n - rank(H) = 3
    code = ldpc_tpu.create_test_ldpc_code()
    enc = make_encoder(code)
    assert enc.k_eff == 3
    u = np.array([[(i >> j) & 1 for j in range(3)] for i in range(8)])
    c = np.asarray(enc(jnp.asarray(u)))
    # all parity checks pass, all codewords distinct, payload embedded
    assert bool(jnp.all(enc.syndrome_ok(c)))
    assert len({tuple(row) for row in c}) == 8
    np.testing.assert_array_equal(c[:, np.asarray(enc.info_positions)], u)


def test_rank_deficient_H():
    code = ldpc_tpu.create_test_ldpc_code()
    H2 = np.vstack([code.H, code.H[0:1]])  # redundant check
    import dataclasses
    code2 = dataclasses.replace(code, H=H2)
    enc = make_encoder(code2)
    assert enc.k_eff == 3  # rank unchanged by the duplicate row
    c = enc(jnp.arange(3) % 2)
    assert bool(enc.syndrome_ok(c[None])[0])


def test_nonzero_codeword_end_to_end():
    """Encode random payloads, add noise, decode: at high SNR every frame
    recovers exactly; at moderate SNR the FER matches the all-zero run to
    within MC noise (the symmetry the simulator relies on)."""
    code = ldpc_tpu.create_peg_code(n=256, m=128, dv=3, seed=0,
                                    max_iterations=20)
    enc = make_encoder(code)
    dec = ldpc_tpu.basic_min_sum(code)
    key = jax.random.PRNGKey(0)
    ku, kn1, kn2, kz = jax.random.split(key, 4)
    B = 256
    u = jax.random.bernoulli(ku, 0.5, (B, enc.k_eff)).astype(jnp.int32)
    c = enc(u)
    assert bool(jnp.all(enc.syndrome_ok(c)))

    out_hi = dec(awgn_llr(kn1, c, 6.0))
    np.testing.assert_array_equal(np.asarray(out_hi.bits), np.asarray(c))
    assert bool(jnp.all(out_hi.success))

    snr = 2.5
    fer_c = float(jnp.mean(jnp.any(dec(awgn_llr(kn2, c, snr)).bits != c,
                                   axis=1)))
    z = jnp.zeros_like(c)
    fer_0 = float(jnp.mean(jnp.any(dec(awgn_llr(kz, z, snr)).bits != 0,
                                   axis=1)))
    assert abs(fer_c - fer_0) < 0.12  # same statistics, MC noise apart


def test_bench_scale_elimination_fast():
    """The (1280, 9472) bench-class H eliminates in seconds (bit-packed
    rows), and the encoder's parity map satisfies H."""
    rng = np.random.default_rng(0)
    base = rng.integers(0, 64, size=(5, 37))
    code = ldpc_tpu.create_qc_code(base, lift=64, max_iterations=6)
    import time
    t0 = time.time()
    enc = make_encoder(code)
    assert time.time() - t0 < 20.0
    assert enc.k_eff == code.n - len(enc.pivot_positions)
    u = jax.random.bernoulli(jax.random.PRNGKey(1), 0.5,
                             (4, enc.k_eff)).astype(jnp.int32)
    c = enc(u)
    H = np.asarray(code.H, np.int64)
    s = (np.asarray(c) @ H.T) % 2
    assert not s.any()
