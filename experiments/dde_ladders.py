"""DDE-designed quantizer ladders vs the hand-swept ones, on real FER.

The ldpc_tpu.design module predicts decoder behavior on the cycle-free
ensemble and picks per-phase (C, gamma) by coordinate descent (the
paper's §VI design machinery; the reference hard-codes its ladders,
``rcq_decoder.py:124-153``). This experiment closes the loop on real
hardware: design ladders for the bench code at bc=3 and bc=4, then
dev-FER them against the operational sweep winners (2-4-6@1.3 CN,
4-8-12 uniform V2C — docs/RESULTS.md §9, experiments/ladder_bc4.py).

DE models the FLOODING schedule on an ensemble; the bench decoder is
layered T=6 ~ flooding T=10-12 (RESULTS §10), so the design uses
T_eff=10. Expected outcome either way is informative: a win ships a
better ladder; a loss quantifies the ensemble->finite-code gap and
keeps the sweep as the operational rule.

    python experiments/dde_ladders.py [--frames 262144]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HAND_CN = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
HAND_V2C = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))


def run(frames: int = 262144, lift: int = 256, dev_snrs=(6.4, 6.5),
        design_snr: float = 6.3, t_eff: int = 10,
        out_path: str = "experiments/dde_ladders_results.json",
        verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.design import (degree_profile_from_base,
                                 design_rcq_ladders,
                                 refine_ladders_protograph)
    from ldpc_tpu.sim import SimulationConfig, simulate_single_snr

    rng = np.random.default_rng(0)
    base = rng.integers(0, lift, size=(5, 37))
    qc = build_qc_graph(base, lift)
    prof = degree_profile_from_base(base)
    fused = dict(fused=True, batch_tile=None, dtype=jnp.bfloat16)
    if jax.default_backend() == "cpu":
        fused = dict(fused, interpret=True, dtype=jnp.float32)
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=6)

    designs = {}
    refined = {}
    for bc in (3, 4):
        qp, vqp, r = design_rcq_ladders(prof, bc=bc, bv=8,
                                        max_iterations=t_eff,
                                        snr_db=design_snr, phases=3)
        designs[bc] = (qp, vqp)
        if verbose:
            print(f"bc={bc} DDE design: CN {qp} V2C {vqp} "
                  f"(DE threshold {r.threshold_db:.2f} dB)", flush=True)
        # schedule-exact polish: layered protograph DE at T=6 (the
        # decoder actually under test)
        rqp, rvqp, rthr = refine_ladders_protograph(
            base, qp, vqp, bc=bc, bv=8, max_iterations=6,
            snr_db=design_snr, schedule="layered")
        refined[bc] = (rqp, rvqp)
        if verbose:
            print(f"bc={bc} proto-refined: CN {rqp} V2C {rvqp} "
                  f"(layered thr {rthr:.2f} dB)", flush=True)

    def mk(bc, qp, vqp):
        return ldpc_tpu.make_decoder(
            code, kind="rcq", bc=bc, bv=8, quantizer_params=qp,
            v2c_quantizer_params=vqp, max_iterations=6, qc=qc,
            layered=True, qc_options=fused)

    arms = {}
    for bc in (3, 4):
        arms[f"bc{bc}_hand"] = mk(bc, HAND_CN, HAND_V2C)
        arms[f"bc{bc}_dde"] = mk(bc, *designs[bc])
        # decomposition arm: DDE CN ladder with the hand V2C ladder
        arms[f"bc{bc}_dde_cn_only"] = mk(bc, designs[bc][0], HAND_V2C)
        arms[f"bc{bc}_dde_refined"] = mk(bc, *refined[bc])

    # per-iteration dynamic ladders (design_dynamic_quantizers output,
    # experiments/dynamic_ladders.py) if that CPU design has been run
    dyn_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "dynamic_ladders_results.json")
    if os.path.exists(dyn_path):
        dyn = json.load(open(dyn_path))
        for bc in (3, 4):
            d = dyn.get(f"bc{bc}")
            if d:
                qp = tuple(tuple(p) for p in d["designed_params"])
                arms[f"bc{bc}_dyn"] = mk(bc, qp, HAND_V2C)

    cfg = SimulationConfig(snr_range=(0, 0), max_frames=frames,
                           max_errors=10 ** 9, min_frames=0,
                           wave_size=min(16384, frames), seed=7)
    fers = {}
    for snr in dev_snrs:
        for name, dec in arms.items():
            fer = simulate_single_snr(dec, snr, cfg)[0]
            fers[f"{name}@{snr}"] = float(fer)
            if verbose:
                print(f"{name:18s} @ {snr} dB: FER {fer:.4e}", flush=True)

    report = {
        "code": f"QC({code.n},{code.k}) lift={lift}, layered T=6, bv=8",
        "design_snr": design_snr, "t_eff": t_eff,
        "designs": {str(bc): {"cn": designs[bc][0], "v2c": designs[bc][1]}
                    for bc in designs},
        "refined": {str(bc): {"cn": refined[bc][0], "v2c": refined[bc][1]}
                    for bc in refined},
        "fers": fers, "frames": frames,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"results -> {out_path}", flush=True)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=262144)
    ap.add_argument("--out", default="experiments/dde_ladders_results.json")
    args = ap.parse_args()
    run(frames=args.frames, out_path=args.out)
