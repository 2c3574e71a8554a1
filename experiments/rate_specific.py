"""Rate-specific W-RCQ training across a PBRL code family.

Paper §VII-C: a k=1032 PBRL family decoded at rates 1/3..8/9, with
*rate-specific* trained weights for a 4-bit W-NMS-RCQ beating a 6-bit OMS
baseline. This experiment reproduces the protocol shape at reduced scale:
train W-RCQ type-2 weights separately for each rate of a rate-compatible
family, then compare each trained decoder's FER against fixed-factor
min-sum at the same rate.

    python experiments/rate_specific.py [--k 96] [--frames 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(k: int = 96, frames: int = 16384, epochs: int = 10,
        out_path: str | None = None, verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import ldpc_tpu
    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig
    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    family = ldpc_tpu.create_pbrl_family(k=k, rates=(1 / 3, 1 / 2, 2 / 3))
    qparams = ((3.0, 1.3), (5.0, 1.3), (7.0, 1.3))
    report = {"k": k, "rates": {}}

    for rate, code in sorted(family.items()):
        code = ldpc_tpu.LDPCCode(n=code.n, k=code.k, H=code.H,
                                 max_iterations=10)
        wrcq = ldpc_tpu.weighted_rcq(code, bc=4, weight_sharing_type=2,
                                     quantizer_params=qparams,
                                     max_iterations=10, init="nms", seed=0)
        # rate-specific training: each rate gets its own SNR operating range
        snr_mid = {1 / 3: 1.0, 1 / 2: 2.0, 2 / 3: 3.0}.get(rate, 2.0)
        tr = PosteriorJointTrainer(
            wrcq, TrainingConfig(batch_size=256, num_epochs=epochs,
                                 learning_rate=3e-3,
                                 snr_range=(snr_mid - 1.0, snr_mid + 1.5),
                                 seed=0))
        hist = tr.train(num_samples=2048, verbose=False)

        cfg = SimulationConfig(snr_range=(snr_mid - 0.5, snr_mid + 1.5),
                               snr_step=0.5, max_frames=frames,
                               max_errors=max(200, frames // 32),
                               min_frames=min(2048, frames), wave_size=2048)
        sim = LDPCSimulator(cfg)
        results = sim.simulate_multiple_decoders({
            "MS": ldpc_tpu.basic_min_sum(code, max_iterations=10),
            "W-RCQ-trained": wrcq,
        }, verbose=False)
        report["rates"][f"{rate:.3f}"] = {
            "n": code.n,
            "final_train_loss": hist["training_losses"][-1],
            "curves": {kk: r.to_dict() for kk, r in results.items()},
        }
        if verbose:
            ms = results["MS"].frame_error_rates
            wr = results["W-RCQ-trained"].frame_error_rates
            print(f"rate {rate:.3f} (n={code.n}): MS FER={ms}  "
                  f"W-RCQ(bc=4,trained) FER={wr}", flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"results -> {out_path}")
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=96)
    ap.add_argument("--frames", type=int, default=16384)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--out", default="experiments/rate_specific_results.json")
    args = ap.parse_args()
    run(args.k, args.frames, args.epochs, args.out)
