"""Importance-sampling floor estimator: exactness anchors."""

import math

import jax
import jax.numpy as jnp
import numpy as np

import ldpc_tpu
from ldpc_tpu.sim.importance import (biased_awgn_llr,
                                     estimate_event_probability,
                                     estimate_trapping_floor)


def _Q(x):
    return 0.5 * math.erfc(x / math.sqrt(2.0))


def test_zero_shift_is_plain_mc():
    llr, log_w = biased_awgn_llr(jax.random.PRNGKey(0), 256, 32, 2.0,
                                 positions=[1, 5], shift=0.0)
    np.testing.assert_allclose(np.asarray(log_w), 0.0, atol=1e-6)
    # and the llr matches channel.awgn_llr's all-zero convention: mean
    # 2/sigma^2, overwhelmingly positive at 2 dB
    assert float(jnp.mean((llr > 0).astype(jnp.float32))) > 0.85


def test_matches_closed_form_gaussian_probability():
    """P[r_i < 0 for i in S] = Q(1/sigma)^2 — IS resolves a ~1e-7
    probability with 2^15 samples to a few percent."""
    snr = 8.0
    sigma = 10.0 ** (-snr / 20.0)
    S = [3, 11]
    exact = _Q(1.0 / sigma) ** 2   # ~ (1.2e-4)^2 at 8 dB... compute below

    def event(llr):
        return jnp.all(llr[:, jnp.asarray(S)] < 0, axis=1)

    p, rel = estimate_event_probability(
        event, n=24, snr_db=snr, positions=S, shift=1.0,
        n_samples=2 ** 15, batch=2 ** 12, key=jax.random.PRNGKey(3))
    assert rel < 0.2
    assert abs(p - exact) / exact < 0.2, (p, exact)


def test_decoder_level_is_matches_plain_mc():
    """At an SNR where plain MC resolves the localized-failure rate, the
    IS estimate agrees within combined statistical error."""
    code = ldpc_tpu.create_peg_code(n=48, m=24, dv=3, seed=2,
                                    max_iterations=12)
    dec = ldpc_tpu.basic_min_sum(code)
    from ldpc_tpu.design import find_trapping_sets
    rep = find_trapping_sets(code.H, a_max=4, b_max=3, restarts=2)
    ts = rep.dominant(1)[0]
    S = list(ts.variables)
    inside = np.zeros(code.n, bool)
    inside[S] = True
    outside = jnp.asarray(~inside)

    def localized_fail(llr):
        out = dec(llr)
        wrong = out.bits.astype(jnp.int32)
        stray = jnp.sum(jnp.where(outside[None, :], wrong, 0), axis=1)
        return (jnp.sum(wrong, axis=1) > 0) & (stray == 0)

    snr = 1.5
    # plain MC
    hits = frames = 0
    key = jax.random.PRNGKey(4)
    from ldpc_tpu.channel import awgn_llr
    for _ in range(40):
        key, sub = jax.random.split(key)
        llr = awgn_llr(sub, jnp.zeros((4096, code.n)), snr)
        hits += int(jnp.sum(localized_fail(llr)))
        frames += 4096
    mc = hits / frames
    assert hits > 30, "SNR too high for the MC side of this test"

    p, rel = estimate_event_probability(
        localized_fail, n=code.n, snr_db=snr, positions=S, shift=1.2,
        n_samples=2 ** 15, batch=2 ** 12, key=jax.random.PRNGKey(5))
    mc_rel = 1.0 / math.sqrt(hits)
    tol = 3.0 * math.sqrt(mc_rel ** 2 + rel ** 2) + 0.05
    assert abs(p - mc) / mc < tol, (p, mc, rel, mc_rel)


def test_floor_estimator_runs_and_orders():
    code = ldpc_tpu.create_peg_code(n=48, m=24, dv=3, seed=2,
                                    max_iterations=12)
    dec = ldpc_tpu.basic_min_sum(code)
    from ldpc_tpu.design import find_trapping_sets
    rep = find_trapping_sets(code.H, a_max=4, b_max=3, restarts=2)
    classes = []
    seen = set()
    for ts in rep.sets:
        if (ts.a, ts.b) in seen:
            continue
        seen.add((ts.a, ts.b))
        m = rep.class_counts()[(ts.a, ts.b)]["unique"]
        classes.append(((ts.a, ts.b), m, ts.variables))
        if len(classes) == 2:
            break
    est = estimate_trapping_floor(dec, classes, snr_db=4.0, shift=1.5,
                                  n_samples=2 ** 13, batch=2 ** 11)
    assert est.fer_floor >= 0.0 and np.isfinite(est.fer_floor)
    assert est.summary().startswith("IS floor estimate")
    for (m, p, rel) in est.per_class.values():
        assert p >= 0.0 and m >= 1


def test_punctured_support():
    """Punctured positions come back as zero LLRs (after weight
    computation over transmitted coordinates only) and shifting an
    untransmitted position is rejected."""
    import pytest

    llr, log_w = biased_awgn_llr(jax.random.PRNGKey(7), 64, 16, 3.0,
                                 positions=[4], shift=1.0,
                                 punctured=(0, 1))
    assert np.all(np.asarray(llr[:, :2]) == 0.0)
    assert np.all(np.asarray(llr[:, 2:]) != 0.0)
    with pytest.raises(ValueError, match="punctured"):
        biased_awgn_llr(jax.random.PRNGKey(7), 8, 16, 3.0,
                        positions=[1], shift=1.0, punctured=(0, 1))
