"""FER parity: quantized (RCQ) decoding vs float min-sum.

Validates the BASELINE.json accuracy target — the bc=3 RCQ waterfall within
a small dB gap of float min-sum at matched iterations (paper §VII: msRCQ
within ~0.1 dB of its float baseline with well-chosen quantizers).

Measures FER curves by Monte-Carlo on a PEG code, interpolates the SNR
needed for a target FER, and reports the dB gap per decoder.

    python experiments/fer_parity.py [--frames 65536] [--out fer_parity.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def snr_at_fer(snrs, fers, target):
    """Interpolate the SNR where the FER curve crosses ``target``
    (log-linear in FER)."""
    snrs = np.asarray(snrs, float)
    fers = np.asarray(fers, float)
    ok = fers > 0
    snrs, fers = snrs[ok], fers[ok]
    if len(snrs) < 2 or fers.min() > target or fers.max() < target:
        return None
    lf = np.log10(fers)
    # FER decreases with SNR: walk to the crossing segment
    for i in range(len(snrs) - 1):
        if fers[i] >= target >= fers[i + 1]:
            t = (np.log10(target) - lf[i]) / (lf[i + 1] - lf[i])
            return float(snrs[i] + t * (snrs[i + 1] - snrs[i]))
    return None


def run(frames: int, out_path: str, verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import ldpc_tpu
    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig

    code = ldpc_tpu.create_peg_code(n=256, m=128, dv=3, seed=0,
                                    max_iterations=20)
    qparams = ((3.0, 1.3), (5.0, 1.3), (7.0, 1.3))
    decoders = {
        "float-MS": ldpc_tpu.basic_min_sum(code, factor=0.7,
                                           max_iterations=20),
        "RCQ-bc3": ldpc_tpu.rcq_min_sum(code, bc=3, quantizer_params=qparams,
                                        max_iterations=20),
        "RCQ-bc3-bv8": ldpc_tpu.rcq_min_sum(code, bc=3, bv=8,
                                            quantizer_params=qparams,
                                            max_iterations=20),
        "RCQ-bc4": ldpc_tpu.rcq_min_sum(code, bc=4, quantizer_params=qparams,
                                        max_iterations=20),
    }
    cfg = SimulationConfig(snr_range=(1.0, 4.0), snr_step=0.5,
                           max_frames=frames, max_errors=max(200, frames // 64),
                           min_frames=min(8192, frames), wave_size=4096)
    sim = LDPCSimulator(cfg)
    results = sim.simulate_multiple_decoders(decoders, verbose=verbose)

    target = 1e-2 if frames < 100000 else 1e-3
    base_snr = snr_at_fer(results["float-MS"].snr_values,
                          results["float-MS"].frame_error_rates, target)
    report = {"code": f"PEG({code.n},{code.k}) dv=3, 20 iters",
              "frames_per_point": frames, "target_fer": target,
              "float_ms_snr_at_target": base_snr, "gaps_db": {},
              "curves": {k: r.to_dict() for k, r in results.items()}}
    for name, r in results.items():
        s = snr_at_fer(r.snr_values, r.frame_error_rates, target)
        gap = None if (s is None or base_snr is None) else s - base_snr
        report["gaps_db"][name] = gap
        if verbose:
            print(f"{name:12s} SNR@FER{target:g} = "
                  f"{'n/a' if s is None else f'{s:.3f} dB'}"
                  f" (gap {'n/a' if gap is None else f'{gap:+.3f} dB'})")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"results -> {out_path}")
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=65536)
    ap.add_argument("--out", default="fer_parity.json")
    args = ap.parse_args()
    run(args.frames, args.out)
