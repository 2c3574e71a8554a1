"""bc=4 quantizer-ladder selection: resolve the bc4-worse-than-bc3 anomaly.

The deep-FER campaign (docs/RESULTS.md §11) measured layered-T=6 RCQ at
bc=4 LOSING to bc=3 at every deep point (e.g. 1.10e-5 vs 1.85e-6 at
6.6 dB) — with the 2-4-6@1.3 CN ladder that the §9 dev-FER sweep selected
AT bc=3. The paper's §VI design rule picks the quantizer per (bc, code,
iteration); this experiment re-runs the operational form of that rule at
bc=4: sweep candidate (C, gamma) ladders on dev FER at the operating
point, then measure the winner's deep points against the bc=3 curve.

    python experiments/ladder_bc4.py [--frames 131072]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VQP = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))  # uniform bv=8 (RESULTS §7)

# candidate (C1, C2, C3)@gamma ladders: the bc=3 winner, the round-1
# default, wider-range variants (bc=4's extra level halves the step size,
# so larger C keeps the fine steps while extending saturation), and a
# gamma ablation
LADDERS = {
    "2-4-6@1.3": ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
    "3-5-7@1.3": ((3.0, 1.3), (5.0, 1.3), (7.0, 1.3)),
    "3-6-9@1.3": ((3.0, 1.3), (6.0, 1.3), (9.0, 1.3)),
    "4-7-10@1.3": ((4.0, 1.3), (7.0, 1.3), (10.0, 1.3)),
    "2-4-6@1.0": ((2.0, 1.0), (4.0, 1.0), (6.0, 1.0)),
    "3-6-9@1.0": ((3.0, 1.0), (6.0, 1.0), (9.0, 1.0)),
}


def run(frames: int = 131072, lift: int = 256, dev_snr: float = 6.4,
        deep_snrs=(6.5, 6.6), deep_frames: int = 2 * 10 ** 7,
        out_path: str = "experiments/ladder_bc4_results.json",
        verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import logging
    logging.basicConfig(level=logging.INFO, force=True)

    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.sim import SimulationConfig, simulate_single_snr

    rng = np.random.default_rng(0)
    base = rng.integers(0, lift, size=(5, 37))
    qc = build_qc_graph(base, lift)
    fused = dict(fused=True, batch_tile=None, dtype=jnp.bfloat16)
    if jax.default_backend() == "cpu":
        fused = dict(fused, interpret=True, dtype=jnp.float32)
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=6)

    def mk(qp):
        return ldpc_tpu.make_decoder(
            code, kind="rcq", bc=4, bv=8, quantizer_params=qp,
            v2c_quantizer_params=VQP, max_iterations=6, qc=qc,
            layered=True, qc_options=fused)

    cfg = SimulationConfig(snr_range=(0, 0), max_frames=frames,
                           max_errors=10 ** 9, min_frames=0,
                           wave_size=min(16384, frames), seed=7)
    dev = {}
    for name, qp in LADDERS.items():
        fer = simulate_single_snr(mk(qp), dev_snr, cfg)[0]
        dev[name] = fer
        if verbose:
            print(f"ladder {name:10s} dev FER @{dev_snr} dB = {fer:.4e}",
                  flush=True)
    best = min(dev, key=dev.get)
    if verbose:
        print(f"selected bc=4 ladder: {best}", flush=True)

    # deep points for the winner (compare against deep_fer_results.json)
    deep_cfg = SimulationConfig(
        snr_range=(0, 0), max_frames=deep_frames, max_errors=100,
        min_frames=0, wave_size=32768, early_exit_iters=2,
        survivor_budget=2048, stage1_batch_tile=64, seed=13)
    deep = {}
    dec = mk(LADDERS[best])
    for snr in deep_snrs:
        fer, _, _, nf = simulate_single_snr(dec, snr, deep_cfg)[:4]
        deep[str(snr)] = {"fer": float(fer), "frames": int(nf)}
        if verbose:
            print(f"bc=4 {best} @ {snr} dB: FER {fer:.3e} "
                  f"({nf} frames)", flush=True)

    report = {
        "code": f"QC({code.n},{code.k}) lift={lift}, layered T=6, "
                "bv=8 uniform",
        "dev_fers_bc4": dev, "selected": best, "deep": deep,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"results -> {out_path}", flush=True)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=131072)
    ap.add_argument("--deep-frames", type=int, default=2 * 10 ** 7)
    ap.add_argument("--out", default="experiments/ladder_bc4_results.json")
    args = ap.parse_args()
    run(frames=args.frames, deep_frames=args.deep_frames,
        out_path=args.out)
