"""Train-on-matched-ladder sanity sweep (RESULTS §31 item 3 follow-up).

Round 3 shipped the guide rule "refine first, train only if a gap
remains" on ONE dev point: trained W-OMS-RCQ on the pass-2 refined
ladder measured ~1.15x WORSE than the plain designed decoder (6.04e-6
vs 5.27e-6 at 2.0 dB, ~100-error counts). A trainer that cannot at
least MATCH the designed ladder it is initialized near is suspicious —
for W-OMS-RCQ the all-zero weight table IS the plain designed decoder,
so training should never end worse than it started unless the
protocol (init/LR/regularization) is at fault.

Arms (all W-OMS-RCQ type-2, bc=4/bv=8, layered T=10, ref2 ladder on
the round-3 precoded PBRL graph, punctured-LLR training):

- ``base``  — the round-3 protocol verbatim (LR 2e-3 cosine, random
  reference init).
- ``lowlr`` — LR 3e-4 (does the 2e-3 peak overshoot the design
  point's basin?).
- ``zinit`` — init EXACTLY at the design point (all-zero tables),
  LR 3e-4 (training can only move away if the gradient says so).
- ``wd``    — round-3 protocol + weight_decay 1e-3 toward zero (the
  design point), the new ``TrainingConfig.weight_decay``.

Dev: each arm + the plain designed decoder at 2.0 dB, 300 errors
(3x the round-3 counts).

    python experiments/train_matched.py [--errors 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CK_DIR = "experiments/train_matched_ck"
OUT = "experiments/train_matched_results.json"
ARMS = {
    "base": dict(learning_rate=2e-3, zinit=False, weight_decay=0.0),
    "lowlr": dict(learning_rate=3e-4, zinit=False, weight_decay=0.0),
    "zinit": dict(learning_rate=3e-4, zinit=True, weight_decay=0.0),
    "wd": dict(learning_rate=2e-3, zinit=False, weight_decay=1e-3),
}


def _setup():
    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pbrl_wrcq as pw

    base, lift, punct_cols = ldpc_tpu.create_pbrl_qc_protograph(
        k=1032, rate=1 / 3, precode=True)
    qc = build_qc_graph(base, lift)
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=pw.T)
    punct_bits = tuple(range(lift * punct_cols[0],
                             lift * (punct_cols[0] + 1)))
    qp, vqp = pw._ladder("ref2")
    fused = dict(fused=True, batch_tile=None, dtype=jnp.bfloat16)
    if jax.default_backend() == "cpu":
        fused = dict(fused, interpret=True, dtype=jnp.float32)

    def mk(kind, weights=None):
        dec = ldpc_tpu.make_decoder(
            code, kind=kind, bc=4, bv=8, quantizer_params=qp,
            v2c_quantizer_params=vqp, max_iterations=pw.T, qc=qc,
            layered=True, qc_options=dict(fused),
            **({} if kind == "rcq" else dict(sharing_type=2)))
        if weights is not None:
            dec.weights = {k: jnp.asarray(v) for k, v in weights.items()}
        return dec

    return mk, punct_bits


def train_arm(name, spec, epochs=30, verbose=True):
    import jax.numpy as jnp

    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig
    from ldpc_tpu.utils.checkpoint import save_checkpoint

    mk, punct_bits = _setup()
    dec = mk("orcq")
    if spec["zinit"]:
        dec.weights = {k: jnp.zeros_like(v) for k, v in dec.weights.items()
                       if v is not None}
    steps = epochs * (2048 // 128)
    tr = PosteriorJointTrainer(dec, TrainingConfig(
        batch_size=128, num_epochs=epochs,
        learning_rate=spec["learning_rate"], snr_range=(1.5, 3.5),
        lr_schedule="cosine", warmup_steps=8, decay_steps=steps,
        early_stop_accuracy=2.0, seed=0,
        punctured_positions=punct_bits,
        weight_decay=spec["weight_decay"]))
    h = tr.train(num_samples=2048, verbose=verbose)
    os.makedirs(CK_DIR, exist_ok=True)
    save_checkpoint(f"{CK_DIR}/{name}",
                    {k: v for k, v in dec.weights.items() if v is not None})
    print(f"trained {name}: loss {h['training_losses'][-1]:.5f}",
          flush=True)
    return h["training_losses"][-1]


def dev(arms, errors=300, frames=5 * 10 ** 8, snr=2.0, verbose=True):
    from ldpc_tpu.sim import SimulationConfig, simulate_single_snr
    from ldpc_tpu.utils.checkpoint import load_checkpoint

    mk, punct_bits = _setup()
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    cfg = SimulationConfig(
        snr_range=(snr, snr), max_frames=frames, max_errors=errors,
        min_frames=65536, wave_size=32768, early_exit_iters=5,
        survivor_budget=4096, punctured_positions=punct_bits,
        save_results=False)
    for name in ("designed",) + tuple(arms):
        if name in results:
            continue
        dec = (mk("rcq") if name == "designed"
               else mk("orcq", load_checkpoint(f"{CK_DIR}/{name}")))
        fer, ber, avg_it, nf, ne = simulate_single_snr(dec, snr, cfg)
        results[name] = {"fer": fer, "frames": nf, "errors": ne,
                        "snr": snr}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
        if verbose:
            print(f"{name:9s} @ {snr} dB: FER {fer:.3e} ({ne}/{nf})",
                  flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--errors", type=int, default=300)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--arms", nargs="+", default=list(ARMS))
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import logging
    logging.basicConfig(level=logging.INFO, force=True)

    if not args.skip_train:
        for name in args.arms:
            if not os.path.exists(f"{CK_DIR}/{name}"):
                train_arm(name, ARMS[name], epochs=args.epochs)
    dev(args.arms, errors=args.errors)
