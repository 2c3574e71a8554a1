"""BASELINE config 5 at full scale: W-RCQ on a (9472, 8192)-class QC code —
posterior-joint STE training plus Monte-Carlo FER, on real hardware.

The reference's analogous path cannot run at any scale (broken loss import,
unbatched decoders — SURVEY §8.2/§8.4); its "large-code" fixture is a dense
random matrix that no scalar-loop decoder could traverse. Here the QC roll
engine trains and simulates the paper-scale code directly.

    python experiments/train_wrcq_qc9472.py [--lift 256] [--frames 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(lift: int = 256, frames: int = 16384, epochs: int = 8,
        out_path: str | None = None, verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig
    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    rng = np.random.default_rng(0)
    base = rng.integers(0, lift, size=(5, 37))  # the bench protograph
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=10)
    qc = build_qc_graph(base, lift)
    qparams = ((3.0, 1.3), (5.0, 1.3), (7.0, 1.3))
    perf = dict(check_every=10, dtype=jnp.bfloat16, unroll=True)

    wrcq = ldpc_tpu.make_decoder(
        code, kind="wrcq", bc=4, sharing_type=2, quantizer_params=qparams,
        max_iterations=10, qc=qc, init="nms", seed=0, qc_options=perf)
    untrained = dict(wrcq.weights)

    tr = PosteriorJointTrainer(
        wrcq, TrainingConfig(batch_size=128, num_epochs=epochs,
                             learning_rate=2e-3, snr_range=(5.5, 7.5),
                             seed=0))
    hist = tr.train(num_samples=1024, verbose=verbose)

    cfg = SimulationConfig(snr_range=(6.0, 7.0), snr_step=0.5,
                           max_frames=frames, max_errors=max(200, frames // 32),
                           min_frames=min(4096, frames), wave_size=4096)
    sim = LDPCSimulator(cfg)
    results = sim.simulate_multiple_decoders({
        "float-MS": ldpc_tpu.make_decoder(code, kind="ms", qc=qc,
                                          max_iterations=10,
                                          qc_options=perf),
        "W-RCQ-bc4-untrained": wrcq.replace_weights(untrained),
        "W-RCQ-bc4-trained": wrcq,
    }, verbose=verbose)

    report = {
        "code": f"QC({code.n},{code.k}) lift={lift}, 10 iters, bc=4",
        "params": wrcq.param_count(),
        "train_epochs": len(hist["training_losses"]),
        "final_train_loss": hist["training_losses"][-1],
        "curves": {k: r.to_dict() for k, r in results.items()},
    }
    if verbose:
        for name, r in results.items():
            fers = ", ".join(f"{f:.4f}" for f in r.frame_error_rates)
            print(f"{name:22s} FER = [{fers}]")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"results -> {out_path}")
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--lift", type=int, default=256)
    ap.add_argument("--frames", type=int, default=16384)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--out",
                    default="experiments/train_wrcq_qc9472_results.json")
    args = ap.parse_args()
    run(args.lift, args.frames, args.epochs, args.out)
