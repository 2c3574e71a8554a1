import numpy as np
import pytest

import ldpc_tpu
from ldpc_tpu.codes import build_graph


def test_test_code_matches_reference_fixture(test_code):
    # reference ldpc_decoder.py:274-284: (7,4), 13 edges, degrees {3,3,3,4}/{1,3}
    assert (test_code.n, test_code.k, test_code.m) == (7, 4, 4)
    assert test_code.num_edges == 13
    assert test_code.rate == pytest.approx(4 / 7)
    assert sorted(test_code.check_node_degrees.values()) == [3, 3, 3, 4]
    dv = test_code.variable_node_degrees
    assert dv == {0: 3, 1: 3, 2: 3, 3: 1, 4: 1, 5: 1, 6: 1}
    assert test_code.max_iterations == 10


def test_graph_tables_consistent(test_code, test_graph):
    g = test_graph
    H = test_code.H
    E = g.num_edges
    # every edge endpoint matches H
    for e in range(E):
        assert H[g.edge_check[e], g.edge_var[e]] == 1
    # cn_slots covers every edge exactly once
    real = g.cn_slots[g.cn_mask]
    assert sorted(real.tolist()) == list(range(E))
    # edge_cn_slot is the inverse map
    flat = g.cn_slots.reshape(-1)
    for e in range(E):
        assert flat[g.edge_cn_slot[e]] == e
    # vn_slots covers every edge exactly once
    real = g.vn_slots[g.vn_mask]
    assert sorted(real.tolist()) == list(range(E))
    # cn_var_slots matches edge_var through cn_slots
    for i in range(g.m):
        for s in range(g.max_dc):
            if g.cn_mask[i, s]:
                assert g.cn_var_slots[i, s] == g.edge_var[g.cn_slots[i, s]]
            else:
                assert g.cn_var_slots[i, s] == g.n


def test_degree_buckets(test_graph):
    g = test_graph
    assert g.unique_dc == (3, 4)
    assert g.unique_dv == (1, 3)
    for e in range(g.num_edges):
        assert g.unique_dc[g.edge_dc_bucket[e]] == g.check_degree[g.edge_check[e]]
        assert g.unique_dv[g.edge_dv_bucket[e]] == g.var_degree[g.edge_var[e]]
        assert g.edge_dcdv_bucket[e] == (
            g.edge_dc_bucket[e] * len(g.unique_dv) + g.edge_dv_bucket[e])


def test_random_regular_code_is_low_density():
    code = ldpc_tpu.create_random_regular_code(n=256, m=128, dv=3, seed=0)
    density = code.H.mean()
    assert density < 0.05  # genuinely low density (reference's fake DVB-S2
    # factory emits ~50% density, SURVEY §8.7)
    assert (code.H.sum(axis=1) >= 1).all()
    assert set(np.unique(code.H.sum(axis=0))) <= {3, 4}


def test_peg_code_structure():
    code = ldpc_tpu.create_peg_code(n=96, m=48, dv=3, seed=0)
    assert (code.H.sum(axis=0) == 3).all()
    assert (code.H.sum(axis=1) >= 1).all()
    # PEG should avoid 4-cycles at this size: no two columns share 2+ checks
    H = code.H.astype(np.int32)
    gram = H.T @ H
    np.fill_diagonal(gram, 0)
    assert gram.max() <= 1


def test_qc_lifting():
    base = np.array([[0, 1, -1], [2, -1, 0]])
    code = ldpc_tpu.create_qc_code(base, lift=4)
    assert code.H.shape == (8, 12)
    assert code.num_edges == 4 * 4  # four non-(-1) blocks, weight-1 circulants
    # each circulant block is a shifted identity
    blk = code.H[0:4, 0:4]
    assert (blk == np.roll(np.eye(4, dtype=np.uint8), 0, axis=1)).all()
    blk = code.H[0:4, 4:8]
    assert (blk == np.roll(np.eye(4, dtype=np.uint8), 1, axis=1)).all()


def test_dvbs2_like_dimensions_and_density():
    code = ldpc_tpu.create_dvbs2_like_code(n=1800, k=800, seed=0)
    assert (code.n, code.k) == (1800, 800)
    assert code.H.mean() < 0.01
    # parity staircase: last column degree 1, others degree >= 2
    assert code.H[:, -1].sum() == 1
    assert (code.H.sum(axis=1) >= 2).all()


def test_pbrl_like_rates():
    code = ldpc_tpu.create_pbrl_like_code(k=120, rate=1 / 3, seed=0)
    assert code.k == 120 and code.n == 360
    assert code.H.mean() < 0.05


def test_alist_roundtrip(tmp_path, test_code):
    p = tmp_path / "code.alist"
    ldpc_tpu.save_alist(test_code, str(p))
    loaded = ldpc_tpu.load_alist(str(p))
    assert (loaded.H == test_code.H).all()
    assert loaded.n == test_code.n and loaded.m == test_code.m


def test_protograph_roundtrip(tmp_path):
    import numpy as np
    from ldpc_tpu import (create_qc_code, load_protograph, save_protograph)
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    rng = np.random.default_rng(0)
    base = rng.integers(-1, 16, size=(3, 7))
    path = str(tmp_path / "proto.txt")
    save_protograph(base, 16, path)
    back, lift = load_protograph(path)
    np.testing.assert_array_equal(back, base)
    assert lift == 16
    # the round-tripped protograph builds the same lifted code
    a = create_qc_code(base, 16)
    b = create_qc_code(back, lift)
    np.testing.assert_array_equal(a.H, b.H)
    qc = build_qc_graph(back, lift)
    assert qc.lift == 16


def test_pbrl_family_rate_compatible():
    """Rate-compatible nesting: every higher-rate H is the leading submatrix
    of the lowest-rate mother code (paper §VII-C family structure)."""
    import numpy as np
    from ldpc_tpu import create_pbrl_family

    fam = create_pbrl_family(k=96, rates=(1 / 3, 1 / 2, 2 / 3))
    assert set(fam) == {1 / 3, 1 / 2, 2 / 3}
    mother = fam[1 / 3]
    assert mother.n == 288 and mother.k == 96
    for r in (1 / 2, 2 / 3):
        c = fam[r]
        assert c.k == 96
        assert abs(c.rate - r) < 0.02
        sub = mother.H[: c.H.shape[0], : c.H.shape[1]]
        if sub.shape == c.H.shape and c.H.shape[0] >= min(mother.n - 96, 96):
            np.testing.assert_array_equal(c.H, sub)
    # every member decodes noiselessly
    import jax.numpy as jnp
    import ldpc_tpu
    for r, c in fam.items():
        dec = ldpc_tpu.basic_min_sum(c, max_iterations=8)
        out = dec(jnp.full((2, c.n), 6.0))
        assert bool(jnp.all(out.success)), f"rate {r}"


def test_dvbs2_qc_protograph():
    """QC-structured DVB-S2-style code: correct dimensions, low density,
    IRA staircase, decodable on the QC fast path (downscaled for test)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    base, lift = ldpc_tpu.create_dvbs2_qc_protograph(n=1800, k=800, lift=100)
    assert base.shape == (10, 18)
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=15)
    assert (code.n, code.k) == (1800, 800)
    density = code.H.mean()
    assert density < 0.01  # genuinely low-density (reference's is ~50%)
    # staircase: parity col p connects rows p and p-1
    for p in range(1, 10):
        assert base[p, 8 + p] == 0 and base[p, 8 + p - 1] == 0
    qc = build_qc_graph(base, lift)
    gen = ldpc_tpu.make_decoder(code, kind="ms", max_iterations=15)
    fast = ldpc_tpu.make_decoder(code, kind="ms", qc=qc, max_iterations=15)
    llr = ldpc_tpu.awgn_llr(jax.random.PRNGKey(0),
                            jnp.zeros((16, code.n)), 2.0)
    a, b = gen(llr), fast(llr)
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    # waterfall sanity at a workable SNR
    llr2 = ldpc_tpu.awgn_llr(jax.random.PRNGKey(1),
                             jnp.zeros((64, code.n)), 3.0)
    fer = float(jnp.mean(jnp.any(fast(llr2).bits != 0, axis=1)))
    assert fer < 0.5


def test_dvbs2_qc_full_size_builds():
    import ldpc_tpu

    base, lift = ldpc_tpu.create_dvbs2_qc_protograph()  # (16200, 7200)
    assert base.shape == (25, 45) and lift == 360
    nnz = (base >= 0).sum()
    # genuine ETSI rate-1/2 profile shape: 40% of info bits (8 base
    # cols = 2880 bits) at degree 8, the rest degree 3, + IRA staircase
    assert nnz == 8 * 8 + 12 * 3 + (25 + 24)
    deg = (base[:, :20] >= 0).sum(0)
    assert list(deg[:8]) == [8] * 8 and set(deg[8:].tolist()) == {3}


def test_tanner_155_structure():
    """The Tanner (155, 64, 20) QC code from its published construction
    (shifts 5^i * 2^j mod 31): (3,5)-regular, GF(2) rank 91 => k=64,
    4-cycle-free (its girth is 8)."""
    from ldpc_tpu.codes import create_tanner_155, gf2_rank, tanner_155_base

    code = create_tanner_155()
    assert (code.n, code.k, code.m) == (155, 64, 93)
    assert set(code.H.sum(1).tolist()) == {5}
    assert set(code.H.sum(0).tolist()) == {3}
    assert gf2_rank(code.H) == 91
    A = code.H.astype(np.int64) @ code.H.astype(np.int64).T
    assert (A - np.diag(np.diag(A))).max() <= 1  # no 4-cycles
    base = tanner_155_base()
    assert base.shape == (3, 5) and base[0, 0] == 1  # 5^0 * 2^0


def test_tanner_155_decodes_on_qc_engine():
    """The Tanner code decodes through the QC roll fast path and the
    general engine identically."""
    import jax

    from ldpc_tpu.channel import awgn_llr
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    code = ldpc_tpu.create_tanner_155(max_iterations=12)
    qc = build_qc_graph(ldpc_tpu.tanner_155_base(), 31)
    gen = ldpc_tpu.basic_min_sum(code, max_iterations=12)
    fast = ldpc_tpu.make_decoder(code, kind="ms", max_iterations=12, qc=qc)
    llr = awgn_llr(jax.random.PRNGKey(0), np.zeros((256, 155), np.float32),
                   3.0)
    a, b = gen(llr), fast(llr)
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    # FER at 3 dB for this code is well below 0.5 — decodes are meaningful
    assert float(np.asarray(a.success).mean()) > 0.5


def test_array_code():
    from ldpc_tpu.codes import create_array_code

    code = create_array_code(13, 3, 5)
    assert code.n == 65
    assert set(code.H.sum(1).tolist()) == {5}
    assert set(code.H.sum(0).tolist()) == {3}
    with pytest.raises(ValueError):
        create_array_code(13, 5, 5)


def test_committed_code_matrices_match_constructions():
    """The protograph files committed under codes/ load and reproduce
    their generating published constructions exactly."""
    import os

    from ldpc_tpu.codes import (create_dvbs2_qc_protograph, load_protograph,
                                tanner_155_base)

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "codes")
    B, lift = load_protograph(os.path.join(root, "tanner_155_64.proto"))
    assert lift == 31
    np.testing.assert_array_equal(B, tanner_155_base())
    code = ldpc_tpu.create_qc_code(B, lift=lift)
    from ldpc_tpu.codes import gf2_rank
    # H is rank-deficient by 2: true dimension 64 (create_tanner_155
    # corrects k the same way)
    assert (code.n, code.n - gf2_rank(code.H)) == (155, 64)

    B2, lift2 = load_protograph(
        os.path.join(root, "dvbs2_like_16200_7200.proto"))
    ref, ref_lift = create_dvbs2_qc_protograph()
    assert lift2 == ref_lift == 360
    np.testing.assert_array_equal(B2, ref)


def test_pbrl_qc_protograph():
    """QC PBRL (paper §VII-C structure): full rank, irregular degrees,
    leading-submatrix rate compatibility, and QC-engine decode parity."""
    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.channel import awgn_llr
    from ldpc_tpu.codes import create_qc_code, gf2_rank
    from ldpc_tpu.decode.qc_engine import build_qc_graph, qc_decode_batch

    B, L = ldpc_tpu.create_pbrl_qc_protograph(k=1032, rate=1 / 3, lift=86)
    assert B.shape == (24, 36) and L == 86
    code = create_qc_code(B, L, max_iterations=8)
    assert code.n == 3096 and code.k == 1032
    assert gf2_rank(code.H) == code.n - code.k  # full rank
    col_deg = (B >= 0).sum(0)
    assert col_deg.min() == 1 and col_deg.max() >= 6  # genuinely irregular

    # leading submatrix of the rate-1/3 mother == the rate-1/2 protograph
    B2, _ = ldpc_tpu.create_pbrl_qc_protograph(k=1032, rate=1 / 2, lift=86)
    assert (B[: B2.shape[0], : B2.shape[1]] == B2).all()

    # QC roll engine == general engine on this irregular protograph
    dec = ldpc_tpu.basic_min_sum(code)
    qc = build_qc_graph(B, L)
    llr = awgn_llr(jax.random.PRNGKey(0), jnp.zeros((16, code.n)), 1.0)
    ref = dec(llr)
    out = qc_decode_batch(llr, dec.weights, qc=qc, spec=dec.spec,
                          max_iterations=8)
    np.testing.assert_array_equal(np.asarray(out.bits),
                                  np.asarray(ref.bits))


def test_pbrl_qc_precoded_protograph():
    """precode=True: one punctured high-degree column tapping every row,
    same info size and transmitted rate as the unprecoded builder, and a
    decode sanity check with the punctured LLRs zeroed."""
    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.channel import awgn_llr, puncture_llr
    from ldpc_tpu.codes import create_qc_code, gf2_rank

    B, L, punct = ldpc_tpu.create_pbrl_qc_protograph(
        k=1032, rate=1 / 3, lift=86, precode=True)
    assert punct == (0,)
    assert B.shape == (25, 37) and L == 86
    assert (B[:, 0] >= 0).all()          # precode column taps every row
    code = create_qc_code(B, L, max_iterations=15)
    assert gf2_rank(code.H) == code.n - code.k
    enc = ldpc_tpu.make_encoder(code)
    assert enc.k_eff == 1032
    assert enc.k_eff / (code.n - L) == 1 / 3  # transmitted rate

    # decode with the precode bits punctured: converges at high SNR
    dec = ldpc_tpu.basic_min_sum(code)
    positions = tuple(range(L))          # base col 0 = bits [0, L)
    llr = awgn_llr(jax.random.PRNGKey(2), jnp.zeros((16, code.n)), 6.0)
    out = dec(puncture_llr(llr, positions))
    assert int(jnp.sum(out.success)) >= 14

    # the structural claim (RESULTS SS19): no b=1 sets beyond the benign
    # degree-1 bits — min-b is 2 for every a >= 2 within the search
    from ldpc_tpu.design import trapping_set_profile
    prof = trapping_set_profile(code.H, a_max=4, restarts=2, seed=0)
    assert prof[2] >= 2 and prof[3] >= 2 and prof[4] >= 2


def test_pbrl_qc_precoded_rate_compatibility():
    """precode=True keeps the PBRL leading-submatrix property: the
    rate-1/2 protograph is the leading submatrix of the rate-1/3 mother
    (rng consumption is prefix-stable in the rate)."""
    import ldpc_tpu

    B3, L, p3 = ldpc_tpu.create_pbrl_qc_protograph(k=1032, rate=1 / 3,
                                                   lift=86, precode=True)
    B2, _, p2 = ldpc_tpu.create_pbrl_qc_protograph(k=1032, rate=1 / 2,
                                                   lift=86, precode=True)
    assert p3 == p2 == (0,)
    assert (B3[: B2.shape[0], : B2.shape[1]] == B2).all()


def test_pbrl_qc_family_core_rate_nesting():
    """core_rate pins the IRA core to the family's highest rate, making
    EVERY rate's protograph the leading submatrix of the mother — the
    real-PBRL family structure the paper's §VII-C rate-specific table
    assumes (rates 1/3, 1/2, 2/3, 8/9 at k=1032; lift 43 puts all four
    on the lift lattice). Each member is full-rank at its nominal k."""
    import numpy as np

    import ldpc_tpu
    from ldpc_tpu.codes import create_qc_code, gf2_rank

    rates = (1 / 3, 1 / 2, 2 / 3, 8 / 9)
    fam = {r: ldpc_tpu.create_pbrl_qc_protograph(
        k=1032, rate=r, lift=43, precode=True, core_rate=8 / 9)
        for r in rates}
    Bm, L, pm = fam[1 / 3]
    assert Bm.shape == (49, 73) and L == 43 and pm == (0,)
    for r in rates[1:]:
        B, _, p = fam[r]
        assert p == pm
        assert np.array_equal(B, Bm[:B.shape[0], :B.shape[1]]), r
    # every member carries exactly k info bits (full-rank H)
    for r in rates:
        B = fam[r][0]
        code = create_qc_code(B, L, max_iterations=10)
        assert gf2_rank(code.H) == code.n - code.k
        assert code.k == 1032
        # transmitted rate (punctured precode column not sent)
        assert abs(code.k / (code.n - L) - r) < 1e-9

    # rate above the core errors clearly
    import pytest
    with pytest.raises(ValueError):
        ldpc_tpu.create_pbrl_qc_protograph(
            k=1032, rate=8 / 9, lift=43, precode=True, core_rate=2 / 3)
    with pytest.raises(ValueError):
        ldpc_tpu.create_pbrl_qc_protograph(
            k=1032, rate=1 / 3, lift=43, core_rate=8 / 9)  # no precode
