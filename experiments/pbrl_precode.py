"""Precoded (real-structure) PBRL vs the random variant: does the
punctured high-degree precode node lift the §16 deep-FER floor?

RESULTS §19's trapping-set enumeration predicts it should: the precoded
protograph (``create_pbrl_qc_protograph(precode=True)``) has NO
absorbing sets below b=3 in the greedy search (smallest class (5,3)),
vs the random variant's (8,1)/(6,2) classes, with the min-b fingerprint
rising from all-1 to all-2 (raw: trapping_spectrum_results.json). Both transmit 3096 symbols for 1032 info bits (the
precode column is punctured), so curves compare at equal per-symbol
SNR and equal transmitted rate.

Arms (layered fused kernel, plain RCQ bc=4 with the §16 on-code ladder
— the configuration that floored at ~1e-4):

  random-bc4-T10     — the §16 anchor (re-measured under this harness)
  precoded-bc4-T10   — same decoder on the precoded graph, precode
                       bits punctured via ``punctured_positions``
  precoded-oms6-T10  — unquantized-C2V OMS slope reference on the
                       precoded graph

    python experiments/pbrl_precode.py [--frames 20000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QP = ((6.0, 1.3), (11.0, 1.3), (16.0, 1.3))
VQP8 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
VQP6 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))


def run(frames: int = 2 * 10 ** 7, errors: int = 100,
        snr_lo: float = 2.6, snr_hi: float = 4.0, snr_step: float = 0.2,
        wave_size: int = 32768, survivor_budget: int = 4096,
        out_path: str = "experiments/pbrl_precode_results.json",
        verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import logging
    logging.basicConfig(level=logging.INFO, force=True)

    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig

    T = 10

    def decoder_for(base, lift, kind):
        qc = build_qc_graph(base, lift)
        code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=T)
        fused = dict(fused=True, batch_tile=None, dtype=jnp.bfloat16)
        if jax.default_backend() == "cpu":
            fused = dict(fused, interpret=True, dtype=jnp.float32)
        if kind == "rcq":
            return ldpc_tpu.make_decoder(
                code, kind="rcq", bc=4, bv=8, quantizer_params=QP,
                v2c_quantizer_params=VQP8, max_iterations=T, qc=qc,
                layered=True, qc_options=fused)
        dec = ldpc_tpu.make_decoder(
            code, kind="oms", sharing_type=2, bv=6,
            v2c_quantizer_params=VQP6, max_iterations=T, qc=qc,
            layered=True, qc_options=fused)
        dec.weights = {"beta": jnp.full_like(dec.weights["beta"], 0.5),
                       "alpha": jnp.zeros_like(dec.weights["alpha"])}
        return dec

    b_rand, l_rand = ldpc_tpu.create_pbrl_qc_protograph(k=1032, rate=1 / 3)
    b_pre, l_pre, punct_cols = ldpc_tpu.create_pbrl_qc_protograph(
        k=1032, rate=1 / 3, precode=True)
    # base col 0 -> lifted bit positions [0, lift)
    punct_bits = tuple(range(l_pre * punct_cols[0],
                             l_pre * (punct_cols[0] + 1)))

    arms = [
        ("random-bc4-T10", decoder_for(b_rand, l_rand, "rcq"), None),
        ("precoded-bc4-T10", decoder_for(b_pre, l_pre, "rcq"), punct_bits),
        ("precoded-oms6-T10", decoder_for(b_pre, l_pre, "oms"), punct_bits),
    ]

    os.makedirs("experiments/pbrl_precode_ck", exist_ok=True)
    curves = {}
    for name, dec, punct in arms:
        cfg = SimulationConfig(
            snr_range=(snr_lo, snr_hi), snr_step=snr_step,
            max_frames=frames, max_errors=errors,
            min_frames=min(2 * wave_size, frames), wave_size=wave_size,
            early_exit_iters=5, survivor_budget=survivor_budget,
            stage1_batch_tile=None, punctured_positions=punct,
            save_results=False)
        sim = LDPCSimulator(cfg)
        curves[name] = sim.simulate_decoder(
            dec, name, verbose=verbose,
            checkpoint=f"experiments/pbrl_precode_ck/{name}.json")

    report = {
        "codes": "QC PBRL rate-1/3 k=1032 lift 86: random (3096 tx bits) "
                 "vs precoded (3182 coded, 3096 transmitted, precode col "
                 "punctured)",
        "curves": {k: r.to_dict() for k, r in curves.items()},
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    if verbose:
        for name, r in curves.items():
            fer = ", ".join(f"{s:g}dB:{f:.2e}" for s, f in
                            zip(r.snr_values, r.frame_error_rates))
            print(f"{name}: {fer}", flush=True)
    print(f"results -> {out_path}", flush=True)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2 * 10 ** 7)
    ap.add_argument("--errors", type=int, default=100)
    ap.add_argument("--out", default="experiments/pbrl_precode_results.json")
    args = ap.parse_args()
    run(frames=args.frames, errors=args.errors, out_path=args.out)
