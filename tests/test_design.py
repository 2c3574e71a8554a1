"""Discretized density evolution (ldpc_tpu.design): exact-combine golden,
threshold behavior vs literature, quantized-vs-float ordering, designer
output shape/sanity."""

import itertools

import numpy as np
import pytest

from ldpc_tpu.design import (
    DegreeProfile,
    degree_profile_from_base,
    degree_profile_from_H,
    density_evolution,
    design_rcq_ladders,
)
from ldpc_tpu.design.dde import _cn_combine, _fold_min

REG36 = DegreeProfile(rho=((6, 1.0),), lam=((3, 1.0),),
                      var_nodes=((3, 1.0),))


def test_cn_combine_matches_enumeration():
    """The tie-aware min/sign combine equals brute-force enumeration."""
    rng = np.random.default_rng(0)
    pos = rng.random(5)
    neg = rng.random(5)
    neg[0] = 0.0
    t = pos.sum() + neg.sum()
    pos, neg = pos / t, neg / t

    def p(m, s):
        return pos[m] if s > 0 else neg[m]

    vals = [(m, +1) for m in range(5)] + [(m, -1) for m in range(1, 5)]
    ep, en = np.zeros(5), np.zeros(5)
    for (m1, s1), (m2, s2) in itertools.product(vals, repeat=2):
        pr = p(m1, s1) * p(m2, s2)
        m, s = min(m1, m2), s1 * s2
        if m == 0:
            ep[0] += pr
        elif s > 0:
            ep[m] += pr
        else:
            en[m] += pr
    zp, zn = _cn_combine(pos, neg, pos, neg)
    np.testing.assert_allclose(zp, ep, atol=1e-12)
    np.testing.assert_allclose(zn, en, atol=1e-12)

    # 5-fold (binary exponentiation) conserves mass exactly
    fp, fn = _fold_min(pos, neg, 5)
    assert abs(fp.sum() + fn.sum() - 1.0) < 1e-9


def test_min_sum_threshold_bracket():
    """Plain min-sum on the (3,6) ensemble: DE must converge at sigma
    0.818 and fail at sigma 0.866 (literature threshold ~0.84)."""
    ok = density_evolution(REG36, snr_db=1.75, max_iterations=60,
                           kind="ms", beta=1.0, grid_max=80.0)
    assert ok.error_prob[-1] < 1e-9
    bad = density_evolution(REG36, snr_db=1.25, max_iterations=60,
                            kind="ms", beta=1.0, grid_max=80.0)
    assert bad.error_prob[-1] > 1e-2


def test_error_prob_monotone_in_snr():
    errs = [density_evolution(REG36, snr_db=s, max_iterations=8, kind="ms",
                              beta=1.0, grid_max=60.0).error_prob[-1]
            for s in (0.0, 1.0, 2.0, 3.0)]
    assert all(a >= b for a, b in zip(errs, errs[1:]))


def test_rcq_ladder_quality_ordering():
    """The tuned bench ladder converges where a too-coarse ladder fails;
    and RCQ's clipping beats PLAIN (unweighted) min-sum on this high-rate
    profile — the paper's core claim, reproduced by DE: plain min-sum
    overestimates magnitudes and diverges at 6.0 dB while the clipped
    3-bit decoder converges."""
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(5, 37))
    prof = degree_profile_from_base(base)
    assert prof.rho == ((37, 1.0),) and prof.lam == ((5, 1.0),)
    kw = dict(snr_db=6.0, max_iterations=6)
    rcq = density_evolution(
        prof, kind="rcq", bc=3,
        quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
        bv=8, v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)),
        **kw)
    flt = density_evolution(prof, kind="ms", beta=1.0, grid_max=200.0, **kw)
    # plain min-sum error grows over iterations; rcq shrinks
    assert flt.error_prob[-1] > flt.error_prob[0]
    assert rcq.error_prob[-1] < rcq.error_prob[0]
    # too-coarse ladder stalls where the tuned one converges
    kw10 = dict(snr_db=6.5, max_iterations=10)
    tuned = density_evolution(
        prof, kind="rcq", bc=3,
        quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
        bv=8, v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)),
        **kw10)
    coarse = density_evolution(
        prof, kind="rcq", bc=3, quantizer_params=((0.5, 1.3),),
        bv=8, v2c_quantizer_params=((1.0, 1.0),), **kw10)
    assert tuned.error_prob[-1] < 1e-9
    assert coarse.error_prob[-1] > 1e-3


def test_profile_from_H_matches_base():
    import ldpc_tpu
    rng = np.random.default_rng(1)
    base = rng.integers(0, 16, size=(3, 8))
    base[0, 0] = -1  # one empty block for irregularity
    code = ldpc_tpu.create_qc_code(base, lift=16, max_iterations=5)
    pH = degree_profile_from_H(code.H)
    pB = degree_profile_from_base(base)
    assert pH == pB


def test_designer_shapes_and_sanity():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(5, 37))
    prof = degree_profile_from_base(base)
    qp, vqp, r = design_rcq_ladders(prof, bc=3, bv=8, max_iterations=6,
                                    snr_db=6.3, phases=3, passes=1,
                                    sweep=(0.8, 1.0, 1.25))
    assert len(qp) == 3 and len(vqp) == 3
    assert all(g == 1.3 for _, g in qp) and all(g == 1.0 for _, g in vqp)
    assert all(0.25 <= c <= 100.0 for c, _ in qp)
    assert r.error_prob.shape == (6,)
    assert r.threshold_db is not None and r.threshold_db < 9.3
    # the returned result is the winner's trajectory AT the design SNR
    again = density_evolution(prof, snr_db=6.3, max_iterations=6,
                              kind="rcq", bc=3, quantizer_params=qp,
                              bv=8, v2c_quantizer_params=vqp)
    np.testing.assert_allclose(again.error_prob, r.error_prob, rtol=1e-9)


def test_designer_beats_hand_ladder_threshold_peg():
    """End-to-end designer validation on a real code profile: the
    designed bc=3 ladder's DE convergence threshold must be at least as
    good as the hand-swept bench ladder's (measured FER parity at 3.5 dB
    was confirmed on the code itself — see design_rcq_ladders docstring)."""
    import ldpc_tpu
    from ldpc_tpu.design.dde import density_evolution as de

    code = ldpc_tpu.create_peg_code(n=256, m=128, dv=3, seed=0,
                                    max_iterations=12)
    prof = degree_profile_from_H(code.H)
    T = 8
    qp, vqp, r = design_rcq_ladders(prof, bc=3, bv=8, max_iterations=T,
                                    snr_db=3.0, phases=3, passes=0)

    def thr(q, v):
        lo, hi = 0.0, 6.0
        for _ in range(10):
            mid = (lo + hi) / 2
            e = de(prof, snr_db=mid, max_iterations=T, kind="rcq", bc=3,
                   quantizer_params=q, bv=8,
                   v2c_quantizer_params=v).error_prob[-1]
            lo, hi = (mid, hi) if e > 1e-7 else (lo, mid)
        return hi

    hand = thr(((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
               ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)))
    assert r.threshold_db <= hand + 0.1
    assert thr(qp, vqp) <= hand + 0.1
