"""Power-law V2C ladders on the precoded PBRL graph: reach AND
resolution at once.

pbrl_vqp_sweep + the deep campaign showed (a) V2C reach ~300 is
mandatory (the punctured precode column's |v2c|), (b) with the UNIFORM
designed ladder (step 1.4-3.1) every quantized arm shares a shallow
deep-FER slope that the oms6 anchor (continuous C2V, fine 4-8-12 v2c)
does not. The power-function quantizer (tau_j = C (j/(2^(bv-1)-1))^g,
ldpc_tpu.quantizer) buys fine steps near zero and full reach with
gamma > 1 — exactly this trade. Arms: refined CN ladder held fixed,
bc=4, power-law V2C ladders at reach ~300.

    python experiments/pbrl_vqp_gamma.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CN_REF3 = ((8.4963, 1.3), (12.108, 1.3), (12.108, 1.3))
VQP_REF3 = ((182.5928, 1.0), (315.3076, 1.0), (394.1345, 1.0))


def main(frames=2 * 10 ** 7, errors=100, snrs=(2.0, 2.4),
         out_path="experiments/pbrl_vqp_gamma_results.json"):
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

    def mk(vqp, bc=4):
        return ldpc_tpu.make_decoder(
            code, kind="rcq", bc=bc, bv=8, quantizer_params=CN_REF3,
            v2c_quantizer_params=vqp, max_iterations=T, qc=qc,
            layered=True, closed_qdq=(bc >= 5), qc_options=dict(fused))

    arms = {
        # gamma=1.5: tau_1 = 300*(1/127)^1.5 = 0.21 — fine core, reach 300
        "bc4_g1.5_C300": mk(((200.0, 1.5), (300.0, 1.5), (360.0, 1.5))),
        "bc4_g2.0_C300": mk(((200.0, 2.0), (300.0, 2.0), (360.0, 2.0))),
        # reach ~ ref3's but power-law
        "bc4_g1.5_ref3C": mk(((182.6, 1.5), (315.3, 1.5), (394.1, 1.5))),
    }

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
            print(f"{name:16s} @ {snr} dB: FER {fer:.3e} "
                  f"({ne} errs / {nf} frames)", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"results -> {out_path}", flush=True)
    return results


if __name__ == "__main__":
    main()
