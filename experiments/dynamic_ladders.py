"""Per-iteration dynamic CN ladders for the bench code, by DE design.

Applies ``design_dynamic_quantizers`` (paper SS VI dynamic-quantization
rule via layered protograph DE) to the bench (9472, 8192)-class base at
bc=3 and bc=4, seeded from the shipped ladders, and records the DE
error trajectories of seed vs designed. CPU-only (pure numpy DE); the
designed ladders are make_decoder-ready for on-chip FER validation
(quantizer_params=<designed>, everything else the bench config).

Context: RESULTS/ladder_bc4.py found bc=4 trailing bc=3 across 6 hand
ladders under the phase schedule; this is the per-iteration optimizer
that thread proposed.

    python experiments/dynamic_ladders.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_tpu.design import design_dynamic_quantizers
from ldpc_tpu.design.proto_dde import protograph_density_evolution


def main():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(5, 37))
    T = 6
    vqp = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
    # design at the steepest useful point of the bench waterfall: DE
    # thresholds of the shipped config sit near 6.3-6.5 dB
    snr = 6.5
    out = {}
    for bc, seed in ((3, ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))),
                     (4, ((6.0, 1.3), (11.0, 1.3), (16.0, 1.3)))):
        t0 = time.time()
        seed_res = protograph_density_evolution(
            base, snr_db=snr, max_iterations=T, kind="rcq", bc=bc,
            quantizer_params=seed, bv=8, v2c_quantizer_params=vqp,
            schedule="layered", grid_step=1.0 / 32.0)
        ps, res = design_dynamic_quantizers(
            base, snr_db=snr, max_iterations=T, bc=bc, bv=8,
            v2c_quantizer_params=vqp, init_params=seed, passes=2)
        out[f"bc{bc}"] = {
            "seed_params": seed,
            "designed_params": ps,
            "design_snr_db": snr,
            "seed_err": [float(e) for e in seed_res.error_prob],
            "designed_err": [float(e) for e in res.error_prob],
            "seconds": round(time.time() - t0, 1),
        }
        print(f"bc={bc}: seed final {seed_res.error_prob[-1]:.3e} -> "
              f"designed {res.error_prob[-1]:.3e} in "
              f"{out[f'bc{bc}']['seconds']}s", flush=True)
        print(f"  designed: {ps}", flush=True)
    with open("experiments/dynamic_ladders_results.json", "w") as f:
        json.dump(out, f, indent=2)
    print("results -> experiments/dynamic_ladders_results.json", flush=True)


if __name__ == "__main__":
    main()
