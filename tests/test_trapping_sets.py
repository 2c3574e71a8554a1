"""Trapping-set enumerator: exact classification + greedy coverage vs
brute force on small codes."""

import itertools

import numpy as np

import ldpc_tpu
from ldpc_tpu.design.trapping_sets import (find_trapping_sets,
                                           trapping_set_profile)


def _brute_min_b(H, a):
    """Exhaustive minimum b over all size-a VN subsets."""
    n = H.shape[1]
    best = None
    for S in itertools.combinations(range(n), a):
        b = int(np.sum(H[:, S].sum(axis=1) % 2 == 1))
        best = b if best is None else min(best, b)
    return best


def test_classification_is_exact():
    """Hand-built (2, 0) elementary absorbing set: two columns sharing
    exactly two rows and nothing else."""
    H = np.zeros((4, 5), dtype=np.int8)
    H[0, 0] = H[1, 0] = 1          # col 0: rows {0, 1}
    H[0, 1] = H[1, 1] = 1          # col 1: rows {0, 1} -> 4-cycle
    H[2, 2] = H[3, 3] = H[2, 4] = H[3, 4] = 1
    rep = find_trapping_sets(H, a_max=2, b_max=0, restarts=1)
    assert (2, 0) in rep.spectrum
    ts = next(s for s in rep.sets if s.variables == (0, 1))
    assert ts.b == 0 and ts.elementary and ts.absorbing


def test_greedy_matches_brute_force_on_74():
    code = ldpc_tpu.create_test_ldpc_code()
    H = np.asarray(code.H)
    prof = trapping_set_profile(H, a_max=4, restarts=4, seed=0)
    for a in (1, 2, 3, 4):
        assert prof[a] == _brute_min_b(H, a), f"a={a}"


def test_greedy_matches_brute_force_on_peg():
    code = ldpc_tpu.create_peg_code(n=24, m=12, dv=3, seed=3,
                                    max_iterations=5)
    H = np.asarray(code.H)
    prof = trapping_set_profile(H, a_max=3, restarts=6, seed=1)
    for a in (1, 2, 3):
        assert prof[a] == _brute_min_b(H, a), f"a={a}"


def test_every_reported_set_reverifies():
    code = ldpc_tpu.create_peg_code(n=64, m=32, dv=3, seed=0,
                                    max_iterations=5)
    H = np.asarray(code.H)
    rep = find_trapping_sets(H, a_max=6, b_max=6, restarts=2)
    assert rep.sets, "expected some low-b sets on a dv=3 PEG code"
    for ts in rep.sets[:50]:
        S = list(ts.variables)
        deg = H[:, S].sum(axis=1)
        assert ts.a == len(set(S)) == len(S)
        assert ts.b == int(np.sum(deg % 2 == 1))
        assert ts.elementary == bool(np.all(deg[deg > 0] <= 2))
    assert all(rep.sets[i].b <= rep.sets[i + 1].b
               for i in range(len(rep.sets) - 1))
    assert rep.summary().startswith("trapping-set spectrum")


def test_qc_code_spectrum_runs():
    base, lift = ldpc_tpu.create_pbrl_qc_protograph(k=1032, rate=1 / 3,
                                                    lift=86)
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=5)
    prof = trapping_set_profile(code, a_max=5, restarts=1)
    # degree-1 IR parity columns => a (1, 1) trapping set exists by
    # construction (the structural reason RESULTS SS16's floor was
    # suspected on this family)
    assert prof[1] == 1
    assert all(prof[a] >= 0 for a in prof)


def test_a_max_exceeding_n_is_clamped():
    """a_max >= n used to corrupt the degree counters once every seed's
    set saturated (argmin over an all-inf row re-added variable 0)."""
    rng = np.random.default_rng(6)   # the seed that crashed pre-fix
    H = (rng.random((3, 6)) < 0.5).astype(np.int8)
    H[:, H.sum(0) == 0] = 1
    rep = find_trapping_sets(H, a_max=9, b_max=0, restarts=2)
    for ts in rep.sets:
        assert ts.b == 0 and ts.a <= 6
