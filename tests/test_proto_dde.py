"""Protograph DE (design/proto_dde): agreement with ensemble DE on a
regular base, layered-vs-flooding convergence ordering (the measured
~2x schedule speedup), puncturing semantics."""

import numpy as np

from ldpc_tpu.design import degree_profile_from_base, density_evolution
from ldpc_tpu.design.proto_dde import protograph_density_evolution as pde

RCQ = dict(kind="rcq", bc=3,
           quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
           bv=8, v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)))


def _bench_base():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(5, 37))


def test_proto_flooding_matches_ensemble_on_regular_base():
    """On a REGULAR protograph every edge sees the same degrees, so
    per-edge DE collapses to the ensemble recursion."""
    base = _bench_base()
    prof = degree_profile_from_base(base)
    kw = dict(snr_db=6.4, max_iterations=6, **RCQ)
    flat = density_evolution(prof, **kw)
    proto = pde(base, schedule="flooding", **kw)
    # criteria differ microscopically (proto counts the bv dead zone as
    # correct, exactly like the engine's bit rule) — trajectories agree
    # to a few percent everywhere they are meaningfully nonzero
    np.testing.assert_allclose(proto.error_prob[:5], flat.error_prob[:5],
                               rtol=0.08)


def test_layered_converges_faster_than_flooding():
    """The layered schedule needs ~half the iterations at equal error —
    the measured hardware fact (docs/RESULTS.md §10) reproduced by DE."""
    base = _bench_base()
    kw = dict(snr_db=6.4, max_iterations=8, **RCQ)
    fl = pde(base, schedule="flooding", **kw)
    la = pde(base, schedule="layered", **kw)

    def first_below(r, eps=1e-5):
        idx = np.nonzero(r.error_prob < eps)[0]
        return int(idx[0]) if len(idx) else len(r.error_prob)

    assert first_below(la) <= first_below(fl) - 2
    assert np.all(la.error_prob <= fl.error_prob + 1e-12)


def test_punctured_column_degrades_high_rate_full_base():
    """Puncturing semantics: a punctured column contributes a delta-at-0
    channel pmf. On the FULL-base rate-0.865 bench code this is fatal —
    every check row touches every column, so the lost observations
    starve the whole graph (a real property of full bases, not a DE
    artifact); the pmfs must reflect a large stalled error."""
    base = _bench_base()
    kw = dict(snr_db=6.4, max_iterations=8, **RCQ)
    plain = pde(base, schedule="layered", **kw)
    punct = pde(base, schedule="layered", punctured_cols=(0, 1), **kw)
    assert punct.error_prob[1] > plain.error_prob[1]
    assert punct.error_prob[-1] > 1e-3  # stalls, unlike the plain run
    assert plain.error_prob[-1] < 1e-9


def test_pbrl_degree1_clipping_floor_and_bc4_fix():
    """Degree-1 clipping on the PBRL base (RESULTS §17): a degree-1 IR
    bit receives exactly ONE c2v message whose magnitude is clipped at
    the C2V quantizer's C, so with the narrow bench bc=3 ladder its
    ensemble error floors near P(llr < -C_max) — raising SNR barely
    helps. A bc=4 ladder with doubled range (3-6-12) removes ~2 decades
    while keeping fine low-range steps (the §VI add-a-quantizer/add-a-
    bit tension, resolved analytically). NB: §16's measured 1e-4 cap
    with its wide 6-11-16 ladder sits ~1000x ABOVE this ensemble curve —
    a finite-graph effect, which is the diagnosis §17 records."""
    import ldpc_tpu
    B, lift = ldpc_tpu.create_pbrl_qc_protograph(k=1032, rate=1 / 3,
                                                 lift=86)
    kw = dict(schedule="layered", max_iterations=12, bv=8,
              v2c_quantizer_params=((4.0, 1.0), (12.0, 1.0), (24.0, 1.0)))
    f25 = pde(B, snr_db=2.5, kind="rcq", bc=3,
              quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)), **kw)
    f30 = pde(B, snr_db=3.0, kind="rcq", bc=3,
              quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)), **kw)
    # floor: half a dB buys <2x (a converging curve would drop decades)
    assert f25.error_prob[-1] > 5e-5
    assert f30.error_prob[-1] > f25.error_prob[-1] / 2
    wide4 = pde(B, snr_db=2.5, kind="rcq", bc=4,
                quantizer_params=((3.0, 1.3), (6.0, 1.3), (12.0, 1.3)),
                **kw)
    assert wide4.error_prob[-1] < f25.error_prob[-1] / 30
    # low SNR sanity: nothing converges below the waterfall
    bad = pde(B, snr_db=-1.0, kind="rcq", bc=3, max_iterations=6,
              quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
              bv=8,
              v2c_quantizer_params=((4.0, 1.0), (12.0, 1.0), (24.0, 1.0)),
              schedule="layered")
    assert bad.error_prob[-1] > 1e-2


def test_analyze_decoder_matches_direct_pde():
    """analyze_decoder reads kind/LUTs/schedule/weights off a built QC
    decoder; for a plain RCQ decoder it must equal the direct call."""
    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.design import analyze_decoder

    base = _bench_base()
    code = ldpc_tpu.create_qc_code(base, lift=256, max_iterations=6)
    qc = build_qc_graph(base, 256)
    dec = ldpc_tpu.make_decoder(
        code, kind="rcq", bc=3, bv=8,
        quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
        v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)),
        max_iterations=6, qc=qc, layered=True)
    via_dec = analyze_decoder(dec, snr_db=6.4)
    direct = pde(base, schedule="layered", snr_db=6.4, max_iterations=6,
                 **RCQ)
    np.testing.assert_allclose(via_dec.error_prob, direct.error_prob,
                               rtol=1e-6, atol=1e-12)


def test_analyze_decoder_trained_weights_matter():
    """Per-edge (degree-shared) trained weights flow into the DE: an
    orcq decoder analyzed with its init weights differs from the same
    decoder with shifted beta, and both run the layered schedule."""
    import dataclasses
    import jax.numpy as jnp
    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.design import analyze_decoder

    base = _bench_base()
    code = ldpc_tpu.create_qc_code(base, lift=256, max_iterations=5)
    qc = build_qc_graph(base, 256)
    dec = ldpc_tpu.make_decoder(
        code, kind="orcq", bc=3, bv=8, sharing_type=2,
        quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
        v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)),
        max_iterations=5, qc=qc, layered=True, seed=3)
    r0 = analyze_decoder(dec, snr_db=6.4)
    shifted = dataclasses.replace(
        dec, weights={k: (v + 0.6 if k == "beta" else v)
                      for k, v in dec.weights.items()})
    r1 = analyze_decoder(shifted, snr_db=6.4)
    assert r0.error_prob.shape == (5,)
    # a 0.6 offset shift materially changes the predicted trajectory
    assert abs(r1.error_prob[-1] - r0.error_prob[-1]) > 1e-6 or \
        abs(r1.error_prob[2] - r0.error_prob[2]) > 1e-6


def test_refine_ladders_protograph():
    """The layered-schedule refinement pass only ever keeps changes that
    LOWER the protograph DE threshold, and returns make_decoder-ready
    shapes."""
    from ldpc_tpu.design import refine_ladders_protograph

    rng = np.random.default_rng(0)
    base = rng.integers(0, 64, size=(3, 10))
    qp0 = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
    vqp0 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
    qp, vqp, thr = refine_ladders_protograph(
        base, qp0, vqp0, bc=3, bv=8, max_iterations=6, snr_db=4.0,
        sweep=(0.9, 1.1))
    assert len(qp) == 3 and len(vqp) == 3
    assert all(g == 1.3 for _, g in qp)
    # threshold of the refined ladder is <= the seed's (monotone accept)
    _, _, thr_seed = refine_ladders_protograph(
        base, qp0, vqp0, bc=3, bv=8, max_iterations=6, snr_db=4.0,
        sweep=())
    assert thr <= thr_seed + 1e-9


def test_design_dynamic_quantizers_improves_and_builds():
    """The per-iteration designer (a) never worsens the DE error
    trajectory key vs its thirds-schedule seed, (b) returns a length-T
    ladder that make_decoder accepts directly (phase_schedule Q=T =
    one quantizer per iteration), and the built decoder decodes."""
    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.channel import awgn_llr
    from ldpc_tpu.design import design_dynamic_quantizers
    from ldpc_tpu.design.proto_dde import protograph_density_evolution

    rng = np.random.default_rng(1)
    base = rng.integers(0, 16, size=(3, 10))
    T, bc = 5, 4
    init = ((3.0, 1.3), (5.0, 1.3), (7.0, 1.3))
    vqp = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
    ps, res = design_dynamic_quantizers(
        base, snr_db=3.2, max_iterations=T, bc=bc, bv=8,
        v2c_quantizer_params=vqp, init_params=init, passes=1,
        C_factors=(0.8, 1.0, 1.25), gammas=(1.3,))
    assert len(ps) == T
    seed = protograph_density_evolution(
        base, snr_db=3.2, max_iterations=T, kind="rcq", bc=bc,
        quantizer_params=init, bv=8, v2c_quantizer_params=vqp,
        schedule="layered", grid_step=1.0 / 32.0)
    assert res.error_prob[-1] <= seed.error_prob[-1] + 1e-15

    lift = 16
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=T)
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    qc = build_qc_graph(base, lift)
    dec = ldpc_tpu.make_decoder(
        code, kind="rcq", bc=bc, bv=8, quantizer_params=ps,
        v2c_quantizer_params=vqp, max_iterations=T, qc=qc, layered=True)
    llr = awgn_llr(jax.random.PRNGKey(0), jnp.zeros((32, code.n)), 6.0)
    out = dec(llr)
    assert float(jnp.mean(out.success)) > 0.9


def test_iterate_refine_threshold_rule():
    """iterate_refine (design/iterate.py): auto design-SNR, monotone
    non-increasing thresholds over passes, make_decoder-ready best
    ladder, and a recognized stopping rule."""
    from ldpc_tpu.design import iterate_refine

    rng = np.random.default_rng(0)
    base = rng.integers(0, 64, size=(3, 10))
    qp0 = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
    vqp0 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
    hist = iterate_refine(
        base, qp0, vqp0, bc=3, bv=8, max_iterations=6, snr_db=None,
        max_passes=2, sweep=(0.9, 1.1))
    assert len(hist.passes) >= 2          # pass 0 + at least one refine
    thrs = [p.threshold_db for p in hist.passes]
    assert all(b <= a + 1e-9 for a, b in zip(thrs, thrs[1:]))
    best = hist.best
    assert len(best.cn) == 3 and len(best.v2c) == 3
    assert hist.stopped_by in ("threshold", "probe", "fixed_point",
                               "max_passes")
    d = hist.to_dict()
    assert d["best_index"] == best.index
    assert len(d["passes"]) == len(hist.passes)


def test_iterate_refine_probe_stopping():
    """A dev probe that keeps getting WORSE stops the loop after the
    first refine pass and pins best at pass 0 — measured evidence
    overrides DE-threshold descent (the RESULTS 23 overfit guard)."""
    from ldpc_tpu.design import iterate_refine

    rng = np.random.default_rng(0)
    base = rng.integers(0, 64, size=(3, 10))
    qp0 = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
    vqp0 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
    calls = []

    def probe(cn, v2c):
        calls.append((cn, v2c))
        return float(len(calls))          # strictly increasing = worse

    hist = iterate_refine(
        base, qp0, vqp0, bc=3, bv=8, max_iterations=6, snr_db=4.0,
        max_passes=4, sweep=(0.9, 1.1), dev_probe=probe)
    assert hist.stopped_by in ("probe", "fixed_point")
    assert hist.best.index == 0
    assert hist.best.probe == 1.0
    assert len(calls) == len(hist.passes)


def test_estimate_threshold_adaptive_bracket():
    """estimate_threshold finds the DE threshold without a caller-
    supplied bracket and agrees with a directly-bisected value."""
    from ldpc_tpu.design import estimate_threshold

    rng = np.random.default_rng(0)
    base = rng.integers(0, 64, size=(3, 10))
    qp0 = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
    vqp0 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
    thr = estimate_threshold(base, qp0, vqp0, bc=3, bv=8,
                             max_iterations=6)
    assert -2.0 < thr < 12.0
    # DE converges at thr, fails 0.5 dB below (bisection bracketing)
    from ldpc_tpu.design.proto_dde import protograph_density_evolution
    kw = dict(max_iterations=6, kind="rcq", bc=3, quantizer_params=qp0,
              bv=8, v2c_quantizer_params=vqp0, schedule="layered",
              grid_step=1.0 / 32.0)
    assert protograph_density_evolution(
        base, snr_db=thr + 0.05, **kw).error_prob[-1] <= 1e-7
    assert protograph_density_evolution(
        base, snr_db=thr - 0.5, **kw).error_prob[-1] > 1e-7


def test_refine_floor_objective_and_gamma_sweep():
    """objective='floor' minimizes the final DE error at the design SNR
    (never increases it), and the gamma sweep may move a pair's
    exponent — the dead-zone knob the C-only sweep cannot reach."""
    from ldpc_tpu.design.proto_dde import (protograph_density_evolution,
                                           refine_ladders_protograph)

    rng = np.random.default_rng(1)
    base = rng.integers(0, 64, size=(3, 10))
    qp0 = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
    vqp0 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
    kw = dict(max_iterations=6, kind="rcq", bc=3, bv=8,
              v2c_quantizer_params=vqp0, schedule="layered",
              grid_step=1.0 / 32.0)
    snr = 3.0   # below this ladder's threshold: error is reducible
    e0 = protograph_density_evolution(
        base, snr_db=snr, quantizer_params=qp0, **kw).error_prob[-1]
    qp1, vqp1, e1 = refine_ladders_protograph(
        base, qp0, vqp0, bc=3, bv=8, max_iterations=6, snr_db=snr,
        sweep=(0.8, 1.25), gammas=(1.0, 1.8), objective="floor")
    assert e1 <= e0 + 1e-12
    e_check = protograph_density_evolution(
        base, snr_db=snr, quantizer_params=qp1, **kw).error_prob[-1]
    assert abs(e_check - e1) < 1e-9       # returned score is the DE error
    gs = {g for _, g in qp1}
    assert gs <= {1.0, 1.3, 1.8}          # gammas stay in the sweep set


def test_iterate_refine_floor_mode():
    """With an unreachable eps nothing converges anywhere: the loop must
    engage FLOOR mode (window-bottom design SNR, de_floor/window_db
    recorded, non-increasing floors) and stop by a floor-regime rule."""
    from ldpc_tpu.design import iterate_refine

    rng = np.random.default_rng(0)
    base = rng.integers(0, 64, size=(3, 10))
    qp0 = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
    vqp0 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
    hist = iterate_refine(
        base, qp0, vqp0, bc=3, bv=8, max_iterations=6, snr_db=None,
        max_passes=2, sweep=(0.8, 1.25), gammas=(1.0, 1.8),
        eps=1e-30, snr_scan=(0.0, 6.0))
    p0 = hist.passes[0]
    assert p0.threshold_db >= 7.0         # capped: floor regime
    assert p0.de_floor is not None and p0.window_db is not None
    assert 0.0 <= p0.window_db <= 6.0     # knee anchor inside the scan
    assert p0.de_floor <= 1e-3            # knee = first err <= knee_eps
    # the knee can only move down: each pass's descent keeps the error
    # at its anchor <= knee_eps, so the next scan's knee <= the anchor
    fps = [p for p in hist.passes if p.window_db is not None]
    assert all(b.window_db <= a.window_db + 1e-12
               for a, b in zip(fps, fps[1:]))
    assert hist.stopped_by in ("floor", "fixed_point", "max_passes")


def test_floor_objective_guard_protects_waterfall():
    """guard_snr caps waterfall damage during floor descent: with the
    guard at a below-threshold SNR, the refined ladder's error THERE
    stays within guard_slack of the incumbent's, while the floor
    objective at snr_db still never worsens."""
    from ldpc_tpu.design.proto_dde import (protograph_density_evolution,
                                           refine_ladders_protograph)

    rng = np.random.default_rng(1)
    base = rng.integers(0, 64, size=(3, 10))
    qp0 = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
    vqp0 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
    kw = dict(max_iterations=6, kind="rcq", bc=3, bv=8,
              v2c_quantizer_params=vqp0, schedule="layered",
              grid_step=1.0 / 32.0)
    guard, design = 3.0, 6.0   # waterfall point / post-waterfall point
    g0 = protograph_density_evolution(
        base, snr_db=guard, quantizer_params=qp0, **kw).error_prob[-1]
    e0 = protograph_density_evolution(
        base, snr_db=design, quantizer_params=qp0, **kw).error_prob[-1]
    qp1, _, e1 = refine_ladders_protograph(
        base, qp0, vqp0, bc=3, bv=8, max_iterations=6, snr_db=design,
        objective="floor", guard_snr=guard, guard_slack=1.5,
        sweep=(0.5, 0.8, 1.25, 2.0), gammas=(1.0, 1.8))
    assert e1 <= e0 + 1e-15               # floor never worsens
    g1 = protograph_density_evolution(
        base, snr_db=guard, quantizer_params=qp1, **kw).error_prob[-1]
    assert g1 <= 1.5 * g0 + 1e-15         # waterfall damage capped
