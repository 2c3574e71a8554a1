"""Falsify the §17 finite-graph diagnosis: PBRL deep floor vs lift.

Proto DE (docs/RESULTS.md §17) says the §16 measured 1e-4 deep-FER cap
on the QC PBRL (3096, 1032) code is NOT an ensemble/quantizer effect —
the ensemble curve for the same bc=4 6-11-16@1.3 ladder sits at 1e-7 —
so it must come from the finite lift-86 graph (cycles/trapping sets on
the degree-1 chains). Prediction: lifting the SAME base shape 3x deeper
(k=3096, lift=258, n=9288) moves the floor down; if the floor stays,
the diagnosis is wrong.

Both codes run the identical decoder config (bc=4, 6-11-16@1.3 CN,
bv=8 uniform, layered T=10, fused kernel, two-checkpoint compaction).

    python experiments/pbrl_lift_floor.py [--frames 20000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QP = ((6.0, 1.3), (11.0, 1.3), (16.0, 1.3))
VQP = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))


def run(frames: int = 2 * 10 ** 7, errors: int = 100,
        snrs=(2.8, 3.2, 3.6, 4.0),
        out_path: str = "experiments/pbrl_lift_floor_results.json",
        verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.sim import SimulationConfig, simulate_single_snr

    arms = {}
    for name, k, lift in (("lift86_n3096", 1032, 86),
                          ("lift258_n9288", 3096, 258)):
        B, L = ldpc_tpu.create_pbrl_qc_protograph(k=k, rate=1 / 3, lift=lift)
        code = ldpc_tpu.create_qc_code(B, lift=L, max_iterations=10)
        qc = build_qc_graph(B, L)
        fused = dict(fused=True, batch_tile=None, dtype=jnp.bfloat16)
        if jax.default_backend() == "cpu":
            fused = dict(fused, interpret=True, dtype=jnp.float32)
        arms[name] = ldpc_tpu.make_decoder(
            code, kind="rcq", bc=4, bv=8, quantizer_params=QP,
            v2c_quantizer_params=VQP, max_iterations=10, qc=qc,
            layered=True, qc_options=fused)
        if verbose:
            print(f"{name}: ({code.n}, {code.k}), base {B.shape}, "
                  f"lift {L}", flush=True)

    cfg = SimulationConfig(
        snr_range=(0, 0), max_frames=frames, max_errors=errors,
        min_frames=0, wave_size=32768, early_exit_iters=2,
        survivor_budget=4096, stage1_batch_tile=None, seed=11)
    results = {}
    for snr in snrs:
        for name, dec in arms.items():
            fer, _, _, nf = simulate_single_snr(dec, snr, cfg)[:4]
            results[f"{name}@{snr}"] = {"fer": float(fer), "frames": int(nf)}
            if verbose:
                print(f"{name} @ {snr} dB: FER {fer:.3e} ({nf} frames)",
                      flush=True)

    report = {"config": "bc=4 6-11-16@1.3, bv=8 uniform, layered T=10, "
                        "fused + two-checkpoint", "results": results}
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"results -> {out_path}", flush=True)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2 * 10 ** 7)
    ap.add_argument("--errors", type=int, default=100)
    ap.add_argument("--out",
                    default="experiments/pbrl_lift_floor_results.json")
    args = ap.parse_args()
    run(frames=args.frames, errors=args.errors, out_path=args.out)
