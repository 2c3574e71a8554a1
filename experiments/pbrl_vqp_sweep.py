"""V2C-ladder reach vs resolution on the precoded PBRL graph.

pbrl_wrcq's dev phase found the refined design's V2C ladder
(183-315-394, uniform bv=8) worth 11x FER over the 4-8-12 default —
reach, not CN resolution, was the 4-bit decoder's binding constraint on
this rate-1/3 graph (accumulated posteriors on the high-degree precode
neighborhood blow straight past reach 12, and the §21 saturation
mechanism wants the biggest bounded correction it can get). But a
reach-394 uniform ladder has step 3.1 — likely far past the optimum.
This sweep holds the refined CN ladder (8.5-12.1-12.1 @1.3) and walks
the V2C uniform reach, plus a bc5+best arm to see whether a 5th C2V
bit now crosses the 6-bit OMS anchor.

    python experiments/pbrl_vqp_sweep.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CN_REF3 = ((8.4963, 1.3), (12.108, 1.3), (12.108, 1.3))
VQP_REF3 = ((182.5928, 1.0), (315.3076, 1.0), (394.1345, 1.0))


def main(frames=2 * 10 ** 7, errors=100, snrs=(2.0, 2.4),
         out_path="experiments/pbrl_vqp_sweep_results.json"):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import logging
    logging.basicConfig(level=logging.INFO, force=True)

    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.sim import SimulationConfig, simulate_single_snr

    base, lift, punct_cols = ldpc_tpu.create_pbrl_qc_protograph(
        k=1032, rate=1 / 3, precode=True)
    qc = build_qc_graph(base, lift)
    T = 10
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=T)
    punct_bits = tuple(range(lift * punct_cols[0],
                             lift * (punct_cols[0] + 1)))
    fused = dict(fused=True, batch_tile=None, dtype=jnp.bfloat16)
    if jax.default_backend() == "cpu":
        fused = dict(fused, interpret=True, dtype=jnp.float32)

    def mk(bc, vqp):
        return ldpc_tpu.make_decoder(
            code, kind="rcq", bc=bc, bv=8, quantizer_params=CN_REF3,
            v2c_quantizer_params=vqp, max_iterations=T, qc=qc,
            layered=True, closed_qdq=(bc >= 5), qc_options=dict(fused))

    def ladder(rmax):
        return ((rmax / 3, 1.0), (2 * rmax / 3, 1.0), (rmax, 1.0))

    arms = {f"bc4_vr{r}": mk(4, ladder(r)) for r in (48, 96, 192)}
    arms["bc4_vref3"] = mk(4, VQP_REF3)   # dev-phase anchor (re-run)
    arms["bc5_vr96"] = mk(5, ladder(96))

    results = {}
    for name, dec in arms.items():
        results[name] = {}
        for snr in snrs:
            cfg = SimulationConfig(
                snr_range=(snr, snr), max_frames=frames,
                max_errors=errors, min_frames=65536, wave_size=32768,
                early_exit_iters=5, survivor_budget=4096,
                punctured_positions=punct_bits, save_results=False)
            fer, ber, avg_it, nf, ne = simulate_single_snr(dec, snr, cfg)
            results[name][str(snr)] = {"fer": fer, "frames": nf,
                                       "errors": ne}
            print(f"{name:12s} @ {snr} dB: FER {fer:.3e} "
                  f"({ne} errs / {nf} frames)", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"results -> {out_path}", flush=True)
    return results


if __name__ == "__main__":
    main()
