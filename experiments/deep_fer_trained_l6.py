"""Deep-FER for the TRAINED layered-T=6 W-OMS-RCQ(3,8) decoder.

Companion to ``deep_fer.py`` (which measured plain layered RCQ and a
trained flooding-T=10 decoder): if training helps ~1.4-2x in the
waterfall (RESULTS §13 at T=5/T=4), the trained T=6 decoder should shift
the bc=3 deep curve toward float at IDENTICAL decode cost to the bench
config. Same machinery: fused layered kernel, {2, 6} two-checkpoint
compaction, uniform bv=8, 2-4-6@1.3 ladder, resumable checkpoints.

    python experiments/deep_fer_trained_l6.py [--frames 50000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(frames: int = 5 * 10 ** 7, errors: int = 100, lift: int = 256,
        wave: int = 32768, snrs=(6.4, 6.5, 6.6, 6.7),
        weights_ck: str = "experiments/orcq_layered_t6_ck",
        out_path: str = "experiments/deep_fer_trained_l6_results.json",
        verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import logging
    logging.basicConfig(level=logging.INFO, force=True)

    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig
    from ldpc_tpu.utils.checkpoint import load_checkpoint

    rng = np.random.default_rng(0)
    base = rng.integers(0, lift, size=(5, 37))
    qc = build_qc_graph(base, lift)
    qp = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
    vqp = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
    fused = dict(fused=True, batch_tile=64, dtype=jnp.bfloat16)

    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=6)
    dec = ldpc_tpu.make_decoder(
        code, kind="orcq", bc=3, bv=8, sharing_type=2,
        quantizer_params=qp, v2c_quantizer_params=vqp, max_iterations=6,
        qc=qc, layered=True, qc_options=fused)
    w = load_checkpoint(weights_ck)
    dec.weights = {k: jnp.asarray(v) for k, v in w.items()}

    cfg = SimulationConfig(
        snr_range=(min(snrs), max(snrs)),
        snr_step=round(snrs[1] - snrs[0], 6) if len(snrs) > 1 else 0.1,
        max_frames=frames, max_errors=errors,
        min_frames=min(wave * 4, frames), wave_size=wave,
        early_exit_iters=2, survivor_budget=max(64, wave // 16),
        stage1_batch_tile=64, save_results=False)
    sim = LDPCSimulator(cfg)
    os.makedirs("experiments/deep_fer_ck", exist_ok=True)
    res = sim.simulate_decoder(
        dec, "W-OMS-RCQ-bc3-trained-L6", verbose=verbose,
        checkpoint="experiments/deep_fer_ck/W-OMS-RCQ-bc3-trained-L6.json")

    report = {"curve": res.to_dict(),
              "weights": weights_ck,
              "config": "layered T=6 fused, {2,6} compaction, bc=3 bv=8 "
                        "uniform, 2-4-6@1.3"}
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"results -> {out_path}", flush=True)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5 * 10 ** 7)
    ap.add_argument("--errors", type=int, default=100)
    ap.add_argument("--out",
                    default="experiments/deep_fer_trained_l6_results.json")
    args = ap.parse_args()
    run(frames=args.frames, errors=args.errors, out_path=args.out)
