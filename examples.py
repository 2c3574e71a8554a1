"""Example scenarios / demo CLI for the ldpc_tpu framework.

Capability parity with the reference's ``examples.py`` (10 scenarios +
``quick`` smoke mode, ``examples.py:28-469``): decode demos for every
decoder family, training, Monte-Carlo simulation with plots, weight-pattern
analysis, gradient analysis, quantizer round-trip, and checkpointing.

Usage:
    python examples.py quick     # fast smoke test
    python examples.py           # all scenarios
    python examples.py <name>    # one scenario (see SCENARIOS)
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _setup():
    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    return jax, jnp, ldpc_tpu


def example_basic_decoding():
    """Fixed-factor min-sum on the (7,4) test code (reference example 1)."""
    jax, jnp, ldpc_tpu = _setup()
    code = ldpc_tpu.create_test_ldpc_code()
    dec = ldpc_tpu.basic_min_sum(code, factor=0.7)
    llr = ldpc_tpu.simulate_awgn_channel(
        jax.random.PRNGKey(0), jnp.zeros(code.n), 4.0)
    bits, success, iters = dec.decode(llr)
    print(f"  (7,4) decode @4dB: success={bool(success)} iters={int(iters)} "
          f"bits={np.asarray(bits).tolist()}")


def example_neural_decoders():
    """N-NMS / N-OMS forward passes + parameter counts (reference ex. 2-3)."""
    jax, jnp, ldpc_tpu = _setup()
    code = ldpc_tpu.create_test_ldpc_code()
    llr = ldpc_tpu.simulate_awgn_channel(
        jax.random.PRNGKey(1), jnp.zeros(code.n), 2.0)
    for make in (ldpc_tpu.neural_min_sum, ldpc_tpu.neural_offset_min_sum):
        dec = make(code, max_iterations=10)
        out = dec(llr)
        print(f"  {dec.name}: params={dec.param_count()} "
              f"success={bool(out.success)} iters={int(out.iterations)}")


def example_2d_weight_sharing():
    """N-2D-NMS/-OMS types 1-4 and their parameter counts (reference ex. 4)."""
    jax, jnp, ldpc_tpu = _setup()
    code = ldpc_tpu.create_test_ldpc_code()
    for t in (1, 2, 3, 4):
        nms = ldpc_tpu.neural_2d_min_sum(code, weight_sharing_type=t,
                                         max_iterations=10)
        oms = ldpc_tpu.neural_2d_offset_min_sum(code, weight_sharing_type=t,
                                                max_iterations=10)
        print(f"  type {t}: N-2D-NMS params={nms.param_count()}  "
              f"N-2D-OMS params={oms.param_count()}")


def example_rcq_decoding():
    """RCQ / W-RCQ with the quantizer schedule (reference ex. 5-6)."""
    jax, jnp, ldpc_tpu = _setup()
    from ldpc_tpu.quantizer import NonUniformQuantizer

    q = NonUniformQuantizer(bc=3, C=5.0, gamma=1.5)
    x = jnp.asarray([-3.2, -1.1, 0.5, 2.8, 4.1])
    codes = q.quantize(x)
    back = q.dequantize(codes)
    print(f"  quantizer round-trip: {np.asarray(x).tolist()} -> "
          f"{np.asarray(codes).tolist()} -> "
          f"{np.round(np.asarray(back), 3).tolist()}")

    code = ldpc_tpu.create_peg_code(n=128, m=64, dv=3, seed=0,
                                    max_iterations=12)
    llr = ldpc_tpu.awgn_llr(jax.random.PRNGKey(2),
                            jnp.zeros((64, code.n)), 3.0)
    for dec in (ldpc_tpu.rcq_min_sum(code, bc=3, bv=8),
                ldpc_tpu.weighted_rcq(code, bc=3, weight_sharing_type=2)):
        out = dec(llr)
        fer = float(jnp.mean(jnp.any(out.bits != 0, axis=1)))
        note = ("  (untrained: W-RCQ weights need training — "
                "see examples 'training' / experiments/train_wrcq.py)"
                if dec.name.startswith("W-RCQ") else "")
        print(f"  {dec.name}: FER@3dB={fer:.3f} "
              f"avg_iters={float(out.iterations.mean()):.1f}{note}")


def example_oms_rcq():
    """W-OMS-RCQ — the paper's FPGA headline decoder (§VII-B, Table III),
    absent from the reference implementation."""
    jax, jnp, ldpc_tpu = _setup()
    code = ldpc_tpu.create_peg_code(n=128, m=64, dv=3, seed=0,
                                    max_iterations=12)
    llr = ldpc_tpu.awgn_llr(jax.random.PRNGKey(9),
                            jnp.zeros((64, code.n)), 3.0)
    dec = ldpc_tpu.weighted_oms_rcq(code, bc=3, bv=8, weight_sharing_type=2,
                                    max_iterations=12)
    out = dec(llr)
    print(f"  {dec.name}: params={dec.param_count()} "
          f"FER@3dB={float(jnp.mean(jnp.any(out.bits != 0, axis=1))):.3f}")
    print("  c2v = qdq(sign * (relu(mag - beta) - alpha)); train via the "
          "'training' scenario machinery (STE through quantizer + offset)")


def example_published_codes():
    """Published closed-form QC codes: Tanner (155, 64, 20) and Fan array
    codes, decoded through the QC roll engine."""
    jax, jnp, ldpc_tpu = _setup()
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    code = ldpc_tpu.create_tanner_155(max_iterations=20)
    qc = build_qc_graph(ldpc_tpu.tanner_155_base(), 31)
    dec = ldpc_tpu.make_decoder(code, kind="ms", max_iterations=20, qc=qc)
    print(f"  Tanner(155,64): rate={code.rate:.3f} "
          f"(3,5)-regular, girth 8, d_min 20")
    for snr in (2.0, 3.0, 4.0):
        llr = ldpc_tpu.awgn_llr(jax.random.PRNGKey(int(snr * 10)),
                                jnp.zeros((512, code.n)), snr)
        out = dec(llr)
        print(f"    FER@{snr:.0f}dB = "
              f"{float(jnp.mean(jnp.any(out.bits != 0, axis=1))):.4f}")
    arr = ldpc_tpu.create_array_code(13, 3, 5)
    print(f"  array(p=13,3,5): ({arr.n},{arr.k}) rate={arr.rate:.3f}")


def example_layered_decoding():
    """Layered-schedule RCQ (the reference's broken `_decode_layered`,
    implemented correctly — SURVEY §8.3)."""
    jax, jnp, ldpc_tpu = _setup()
    code = ldpc_tpu.create_peg_code(n=128, m=64, dv=3, seed=0,
                                    max_iterations=8)
    llr = ldpc_tpu.awgn_llr(jax.random.PRNGKey(3),
                            jnp.zeros((64, code.n)), 3.0)
    flood = ldpc_tpu.rcq_min_sum(code, bc=4, max_iterations=8)
    layer = ldpc_tpu.rcq_min_sum(code, bc=4, max_iterations=8, layered=True)
    for dec in (flood, layer):
        out = dec(llr)
        sched = "layered" if dec.layered else "flooding"
        print(f"  {sched}: FER={float(jnp.mean(jnp.any(out.bits!=0,1))):.3f} "
              f"avg_iters={float(out.iterations.mean()):.2f}")


def example_training():
    """Posterior-joint training of N-2D-NMS type 2 (reference ex. 7)."""
    jax, jnp, ldpc_tpu = _setup()
    code = ldpc_tpu.create_peg_code(n=128, m=64, dv=3, seed=0,
                                    max_iterations=8)
    dec = ldpc_tpu.neural_2d_min_sum(code, weight_sharing_type=2,
                                     max_iterations=8)
    tr = ldpc_tpu.PosteriorJointTrainer(
        dec, ldpc_tpu.TrainingConfig(batch_size=128, num_epochs=5,
                                     learning_rate=5e-3, snr_range=(1, 4)))
    hist = tr.train(num_samples=1024, verbose=False)
    print(f"  loss {hist['training_losses'][0]:.4f} -> "
          f"{hist['training_losses'][-1]:.4f}, "
          f"acc {hist['training_accuracies'][-1]:.4f}, "
          f"{hist['train_time']:.1f}s")


def example_gradient_analysis():
    """Gradient-explosion analysis (reference ex. 8)."""
    jax, jnp, ldpc_tpu = _setup()
    code = ldpc_tpu.create_test_ldpc_code()
    dec = ldpc_tpu.neural_min_sum(code, max_iterations=10)
    res = ldpc_tpu.GradientExplosionAnalyzer(dec).analyze(num_samples=32)
    for mode, st in res.items():
        print(f"  {mode}: mean={st['mean']:.3e} max={st['max']:.3e}")


def example_simulation():
    """Monte-Carlo FER/BER sweep + plots (reference ex. 9-10)."""
    jax, jnp, ldpc_tpu = _setup()
    from ldpc_tpu.report import plot_comparison_grid

    code = ldpc_tpu.create_peg_code(n=128, m=64, dv=3, seed=0,
                                    max_iterations=12)
    cfg = ldpc_tpu.SimulationConfig(
        snr_range=(1.0, 4.0), snr_step=1.0, max_frames=2048,
        max_errors=200, min_frames=512, wave_size=512)
    sim = ldpc_tpu.LDPCSimulator(cfg)
    decs = {
        "MS(0.7)": ldpc_tpu.basic_min_sum(code, max_iterations=12),
        "RCQ(3,8)": ldpc_tpu.rcq_min_sum(code, bc=3, bv=8,
                                         max_iterations=12),
    }
    results = sim.simulate_multiple_decoders(decs, verbose=False)
    for name, r in results.items():
        fers = ", ".join(f"{f:.3f}" for f in r.frame_error_rates)
        print(f"  {name}: FER = [{fers}]")
    path = plot_comparison_grid(results, "simulation_results/comparison.png")
    sim.save_results(filename="example_results.json")
    print(f"  plots -> {path}")


def example_weight_analysis():
    """Weight-pattern analysis (reference weight-pattern test)."""
    jax, jnp, ldpc_tpu = _setup()
    from ldpc_tpu.report import (analyze_weight_patterns,
                                 parameter_reduction_report)
    from ldpc_tpu.sim import create_test_decoders

    code = ldpc_tpu.create_test_ldpc_code()
    zoo = create_test_decoders(code)
    an = analyze_weight_patterns(zoo["N-NMS"])
    print(f"  N-NMS params={an['total_parameters']}, "
          f"mean-by-dc={ {k: round(v, 3) for k, v in an['mean_weight_by_check_degree'].items()} }")
    rep = parameter_reduction_report(zoo, baseline="N-NMS")
    for name, d in rep["decoders"].items():
        print(f"  {name}: {d['params']} params "
              f"({d['reduction_pct']:.1f}% reduction)")


def example_checkpointing():
    """Save/restore trained weights (new capability, SURVEY §5)."""
    import tempfile
    jax, jnp, ldpc_tpu = _setup()
    from ldpc_tpu.utils import load_trainer_checkpoint, save_trainer_checkpoint

    code = ldpc_tpu.create_test_ldpc_code()
    dec = ldpc_tpu.neural_min_sum(code, max_iterations=5)
    tr = ldpc_tpu.PosteriorJointTrainer(
        dec, ldpc_tpu.TrainingConfig(batch_size=64, num_epochs=2))
    tr.train(num_samples=256, verbose=False)
    with tempfile.TemporaryDirectory() as d:
        path = save_trainer_checkpoint(f"{d}/ckpt", tr, epoch=2)
        dec2 = ldpc_tpu.neural_min_sum(code, max_iterations=5, seed=99)
        tr2 = ldpc_tpu.PosteriorJointTrainer(
            dec2, ldpc_tpu.TrainingConfig(batch_size=64, num_epochs=2))
        epoch = load_trainer_checkpoint(path, tr2)
        same = np.allclose(np.asarray(dec.weights["beta"]),
                           np.asarray(dec2.weights["beta"]))
        print(f"  restored epoch={epoch}, weights match: {same}")


def example_zoo():
    """Load the shipped pretrained decoder and decode with it."""
    jax, jnp, ldpc_tpu = _setup()
    from ldpc_tpu.channel import awgn_llr

    entries = ldpc_tpu.list_pretrained()
    for path, spec in entries:
        print(f"  zoo entry: {spec['name']} at {path}")
    if not entries:
        print("  (no zoo entries found)")
        return
    # reduced schedule keeps this demo fast; weights tables are [:T]-sliced
    dec = ldpc_tpu.load_pretrained(entries[0][0], max_iterations=5)
    llr = awgn_llr(jax.random.PRNGKey(0), jnp.zeros((16, dec.code.n)), 6.75)
    out = dec(llr)
    print(f"  decoded 16 frames of n={dec.code.n}: "
          f"{int(np.asarray(out.success).sum())}/16 converged at T=5")


def example_design():
    """Quantizer-ladder design by density evolution (ldpc_tpu.design)."""
    import numpy as np

    import ldpc_tpu
    from ldpc_tpu.design import (analyze_decoder, degree_profile_from_base,
                                 design_rcq_ladders)
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    rng = np.random.default_rng(0)
    base = rng.integers(0, 64, size=(4, 16))
    prof = degree_profile_from_base(base)
    qp, vqp, res = design_rcq_ladders(prof, bc=3, bv=8, max_iterations=8,
                                      snr_db=5.0, phases=3, passes=0)
    print(f"  designed CN ladder {[c for c, _ in qp]} @gamma 1.3, "
          f"V2C {[c for c, _ in vqp]}; DE threshold "
          f"{res.threshold_db:.2f} dB")

    code = ldpc_tpu.create_qc_code(base, lift=64, max_iterations=8)
    qc = build_qc_graph(base, 64)
    dec = ldpc_tpu.make_decoder(code, kind="rcq", bc=3, bv=8,
                                quantizer_params=qp,
                                v2c_quantizer_params=vqp,
                                max_iterations=8, qc=qc, layered=True)
    r = analyze_decoder(dec, snr_db=5.0)
    print(f"  layered DE trajectory of the built decoder: "
          f"{[float(f'{e:.2g}') for e in r.error_prob]}")


def example_encode_end_to_end():
    """Systematic GF(2) encode -> AWGN -> decode -> message recovery: the
    full transmit path on random (non-zero) messages. Every Monte-Carlo
    scenario uses the all-zero codeword (valid by linearity,
    ``simulation_framework.py:107``); this demo shows the encoder closing
    the loop on real data, including the BPSK sign mapping."""
    jax, jnp, ldpc_tpu = _setup()
    from ldpc_tpu.channel import awgn_llr

    code = ldpc_tpu.create_peg_code(n=256, m=128, dv=3, seed=0,
                                    max_iterations=25)
    enc = ldpc_tpu.make_encoder(code)
    dec = ldpc_tpu.basic_min_sum(code)
    key = jax.random.PRNGKey(42)
    msg = jax.random.bernoulli(key, 0.5, (64, enc.k_eff)).astype(jnp.int32)
    cw = enc(msg)                                    # [64, n] GF(2) codewords
    assert bool(jnp.all(enc.syndrome_ok(cw)))
    # BPSK: bit 0 -> +1, bit 1 -> -1; awgn_llr takes the bit tensor
    llr = awgn_llr(jax.random.fold_in(key, 1), cw.astype(jnp.float32), 5.0)
    out = dec(llr)
    rec = out.bits[:, jnp.asarray(enc.info_positions)]  # systematic extraction
    ok = jnp.all(rec == msg, axis=1)
    print(f"  encode->AWGN@5dB->decode on 64 random messages "
          f"(k_eff={enc.k_eff}): {int(jnp.sum(ok))}/64 recovered, "
          f"decoder success on {int(jnp.sum(out.success))}/64")


def example_floor_diagnosis():
    """Finite-graph floor diagnosis: trapping-set spectrum + an
    importance-sampled failure probability (design/trapping_sets.py,
    sim/importance.py — RESULTS §19/§21 machinery in miniature)."""
    jax, jnp, ldpc_tpu = _setup()
    from ldpc_tpu.design import find_trapping_sets
    from ldpc_tpu.sim import estimate_trapping_floor

    code = ldpc_tpu.create_peg_code(n=96, m=48, dv=3, seed=1,
                                    max_iterations=15)
    rep = find_trapping_sets(code.H, a_max=6, b_max=3, restarts=2)
    print("  " + rep.summary().replace("\n", "\n  "))
    if rep.sets:
        ts = rep.dominant(1)[0]
        dec = ldpc_tpu.basic_min_sum(code)
        est = estimate_trapping_floor(
            dec, [((ts.a, ts.b), rep.class_counts()[(ts.a, ts.b)]["unique"],
                   ts.variables)],
            snr_db=4.0, shift=1.5, n_samples=4096, batch=1024)
        print("  " + est.summary().replace("\n", "\n  "))


SCENARIOS = {
    "basic": example_basic_decoding,
    "neural": example_neural_decoders,
    "2d": example_2d_weight_sharing,
    "rcq": example_rcq_decoding,
    "oms_rcq": example_oms_rcq,
    "codes": example_published_codes,
    "layered": example_layered_decoding,
    "training": example_training,
    "gradients": example_gradient_analysis,
    "simulation": example_simulation,
    "weights": example_weight_analysis,
    "checkpoint": example_checkpointing,
    "zoo": example_zoo,
    "design": example_design,
    "encode": example_encode_end_to_end,
    "floor": example_floor_diagnosis,
}


def run_quick_test():
    """Minimal smoke (reference ``examples.py:427-461``)."""
    t0 = time.time()
    example_basic_decoding()
    example_neural_decoders()
    print(f"quick test OK in {time.time() - t0:.1f}s")


def run_all_examples():
    for name, fn in SCENARIOS.items():
        print(f"[{name}] {fn.__doc__.splitlines()[0]}")
        t0 = time.time()
        fn()
        print(f"[{name}] done in {time.time() - t0:.1f}s\n")


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else None
    if arg == "quick":
        run_quick_test()
    elif arg in SCENARIOS:
        SCENARIOS[arg]()
    elif arg is None:
        run_all_examples()
    else:
        print(f"unknown scenario {arg!r}; one of: quick, "
              + ", ".join(SCENARIOS))
        sys.exit(1)
