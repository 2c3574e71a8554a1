"""Deep-FER validation of the round-3 bench ladder + a retrained zoo
decoder on it.

bench.py now ships the DDE-designed CN ladder (2.65-3.09-5.38@1.3,
RESULTS §23). The r2 deep-FER campaign (§11) validated the OLD hand
ladder to FER 2e-8; this re-validates at depth for the shipped config
and retrains the layered-T6 W-OMS-RCQ zoo decoder on the new ladder
(its r2 weights compensate the hand ladder's misdesign — §25 finding 4
predicts a smaller but real gain stacking training on a designed
ladder).

Arms (bench code, layered T=6, {3,T} two-checkpoint compaction sim):
  RCQ-dde-L6     — the shipped bench decoder
  W-ORCQ-dde-L6  — trained on the same ladder (saved to
                   zoo/worcq_bc3_layered_t6_dde)

    python experiments/bench_dde.py [--phase train|deep|all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QP_DDE = ((2.6474, 1.3), (3.0869, 1.3), (5.3767, 1.3))
VQP = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
T = 6
ZOO_PATH = "zoo/worcq_bc3_layered_t6_dde"


def _setup():
    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(5, 37))
    code = ldpc_tpu.create_qc_code(base, lift=256, max_iterations=T)
    qc = build_qc_graph(base, 256)
    fused = dict(fused=True, batch_tile=64, dtype=jnp.bfloat16)
    if jax.default_backend() == "cpu":
        fused = dict(fused, interpret=True, dtype=jnp.float32)

    def mk(kind):
        kw = {} if kind == "rcq" else dict(sharing_type=2)
        return ldpc_tpu.make_decoder(
            code, kind=kind, bc=3, bv=8, quantizer_params=QP_DDE,
            v2c_quantizer_params=VQP, max_iterations=T, qc=qc,
            layered=True, qc_options=dict(fused), **kw)

    return mk


def train(epochs: int = 30, verbose: bool = True):
    import ldpc_tpu
    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    mk = _setup()
    dec = mk("orcq")
    steps = epochs * (2048 // 128)
    tr = PosteriorJointTrainer(dec, TrainingConfig(
        batch_size=128, num_epochs=epochs, learning_rate=2e-3,
        snr_range=(5.5, 7.5), lr_schedule="cosine", warmup_steps=8,
        decay_steps=steps, early_stop_accuracy=2.0, seed=0))
    h = tr.train(num_samples=2048, verbose=verbose)
    ldpc_tpu.save_pretrained(
        ZOO_PATH, dec,
        meta={"trained": "2026-08-19 round 3",
              "protocol": "cosine 30ep B=128 snr 5.5-7.5 joint",
              "ladder": "DDE-designed 2.65-3.09-5.38@1.3 (RESULTS 23)"})
    print(f"trained: loss {h['training_losses'][-1]:.5f} -> {ZOO_PATH}",
          flush=True)


def deep(frames: int = 5 * 10 ** 7, errors: int = 100,
         snr_lo: float = 6.4, snr_hi: float = 6.7, snr_step: float = 0.1,
         out_path: str = "experiments/bench_dde_results.json",
         verbose: bool = True):
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig

    mk = _setup()
    arms = {"RCQ-dde-L6": mk("rcq")}
    if os.path.exists(os.path.join(ZOO_PATH, "spec.json")):
        trained = ldpc_tpu.load_pretrained(
            ZOO_PATH, qc_options=dict(fused=True, batch_tile=64,
                                      dtype=jnp.bfloat16))
        arms["W-ORCQ-dde-L6"] = trained

    os.makedirs("experiments/bench_dde_ck", exist_ok=True)
    curves = {}
    for name, dec in arms.items():
        cfg = SimulationConfig(
            snr_range=(snr_lo, snr_hi), snr_step=snr_step,
            max_frames=frames, max_errors=errors, min_frames=131072,
            wave_size=32768, early_exit_iters=3, survivor_budget=4096,
            save_results=False)
        sim = LDPCSimulator(cfg)
        curves[name] = sim.simulate_decoder(
            dec, name, verbose=verbose,
            checkpoint=f"experiments/bench_dde_ck/{name}.json")

    report = {
        "code": "QC(9472,8192) lift=256, layered T=6, DDE ladder "
                "2.65-3.09-5.38@1.3, uniform bv=8",
        "curves": {k: r.to_dict() for k, r in curves.items()},
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"results -> {out_path}", flush=True)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["train", "deep", "all"],
                    default="all")
    ap.add_argument("--frames", type=int, default=5 * 10 ** 7)
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import logging
    logging.basicConfig(level=logging.INFO, force=True)

    if args.phase in ("train", "all"):
        train(args.epochs)
    if args.phase in ("deep", "all"):
        deep(frames=args.frames)
