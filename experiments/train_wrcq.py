"""Train W-RCQ through the quantizer (STE) and measure the FER payoff.

The paper's headline capability: a 3-bit weighted-RCQ decoder whose
degree-shared neural weights are trained with the posterior-joint loss —
something the reference never delivered (its trainer crashes and its RCQ
path is inference-only, SURVEY §8.2/§8.4). This experiment trains W-RCQ
type 2 end-to-end through the straight-through estimator and compares FER
against (a) its untrained NMS-equivalent init and (b) float min-sum.

    python experiments/train_wrcq.py [--frames 32768]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(frames: int = 32768, epochs: int = 12, out_path: str | None = None,
        verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import ldpc_tpu
    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig
    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    code = ldpc_tpu.create_peg_code(n=256, m=128, dv=3, seed=0,
                                    max_iterations=10)
    qparams = ((3.0, 1.3), (5.0, 1.3), (7.0, 1.3))

    wrcq = ldpc_tpu.weighted_rcq(code, bc=3, weight_sharing_type=2,
                                 quantizer_params=qparams,
                                 max_iterations=10, init="nms", seed=0)
    untrained_weights = {k: v for k, v in wrcq.weights.items()}

    tr = PosteriorJointTrainer(
        wrcq, TrainingConfig(batch_size=256, num_epochs=epochs,
                             learning_rate=3e-3, snr_range=(1.5, 3.5),
                             use_posterior_training=True, seed=0))
    hist = tr.train(num_samples=4096, verbose=verbose)

    decoders = {
        "float-MS": ldpc_tpu.basic_min_sum(code, factor=0.7,
                                           max_iterations=10),
        "W-RCQ-t2-untrained": wrcq.replace_weights(untrained_weights),
        "W-RCQ-t2-trained": wrcq,
    }
    cfg = SimulationConfig(snr_range=(1.5, 3.5), snr_step=0.5,
                           max_frames=frames, max_errors=max(200, frames // 64),
                           min_frames=min(4096, frames), wave_size=4096)
    sim = LDPCSimulator(cfg)
    results = sim.simulate_multiple_decoders(decoders, verbose=verbose)

    report = {
        "code": f"PEG({code.n},{code.k}) dv=3, 10 iters, bc=3",
        "train_epochs": len(hist["training_losses"]),
        "final_train_loss": hist["training_losses"][-1],
        "final_train_accuracy": hist["training_accuracies"][-1],
        "curves": {k: r.to_dict() for k, r in results.items()},
    }
    if verbose:
        for name, r in results.items():
            fers = ", ".join(f"{f:.4f}" for f in r.frame_error_rates)
            print(f"{name:20s} FER = [{fers}]")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"results -> {out_path}")
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32768)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--out", default="experiments/train_wrcq_results.json")
    args = ap.parse_args()
    run(args.frames, args.epochs, args.out)
