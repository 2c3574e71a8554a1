"""§VI "add a quantizer", one more step: 5-pair ladders for the rates
still trailing the 6-bit OMS anchor (1/2: +0.21, 2/3: +0.18 measured
with q4). Seeds from the measured-best q4 ladder by splitting its mid
pair; same floor-aware refine + guarded polish as pbrl_rates_q4.py.

    python experiments/pbrl_rates_q5.py --rates 12 23   # CPU
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q5_PATH = "experiments/pbrl_rates_design_{tag}_q5.json"


def design_q5(tag: str, verbose: bool = True):
    from ldpc_tpu.design import estimate_threshold, iterate_refine
    from ldpc_tpu.design.proto_dde import (
        protograph_density_evolution as de, refine_ladders_protograph)

    from pbrl_rates import RATES, T, BC, BV, family  # noqa: E402

    base, lift, punct = family(tag)
    p = json.load(open(f"experiments/pbrl_rates_design_{tag}_q4.json"))
    cn4 = [tuple(x) for x in p["cn"]]
    vqp = tuple(tuple(x) for x in p["v2c"])
    gs = 1 / 8 if tag == "13" else 1 / 16
    kw = dict(bc=BC, bv=BV, max_iterations=T, schedule="layered",
              punctured_cols=punct, grid_step=gs)
    cn5 = (cn4[0], cn4[1], cn4[1], cn4[2], cn4[3])   # split the mid pair
    hist = iterate_refine(base, cn5, vqp, snr_db=None, max_passes=4,
                          min_gain_db=0.01,
                          sweep=(0.6, 0.8, 0.9, 1.1, 1.25, 1.6),
                          gammas=(1.0, 1.15, 1.3, 1.5, 1.8, 2.2),
                          verbose=verbose, **kw)
    b = hist.best
    cur, cur_v, thr = b.cn, b.v2c, b.threshold_db
    probe = []
    for off in (0.5, 1.0, 1.5, 2.0, 3.0):
        r = de(base, snr_db=thr + off, kind="rcq", quantizer_params=cur,
               v2c_quantizer_params=cur_v, **kw)
        probe.append((thr + off, float(r.error_prob[-1])))
        if verbose:
            print(f"  probe {thr + off:.2f}: {r.error_prob[-1]:.3e}",
                  flush=True)
    peak, peak_err = max(probe, key=lambda x: x[1])
    if peak_err >= 1e-12:
        for i in range(2):
            # two-point guard (RESULTS §37): never trade the waterfall
            cur, cur_v, e = refine_ladders_protograph(
                base, cur, cur_v, snr_db=peak, objective="floor",
                guard_snr=thr + 0.25, guard_slack=10.0,
                sweep=(0.6, 0.8, 0.9, 1.1, 1.25, 1.6),
                gammas=(1.0, 1.15, 1.3, 1.5, 1.8, 2.2), **kw)
            if verbose:
                print(f"  polish {i + 1}: err {e:.3e}", flush=True)
        thr = estimate_threshold(base, cur, cur_v, **kw)
        peak_err = e
    out = {"rate": RATES[tag], "threshold_db": float(thr),
           "floor": float(peak_err),
           "cn": [list(x) for x in cur], "v2c": [list(x) for x in cur_v]}
    with open(Q5_PATH.format(tag=tag), "w") as f:
        json.dump(out, f, indent=2)
    print(f"rate {tag} q5: thr {thr:.3f} floor {peak_err:.2e} cn {cur}",
          flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", nargs="+", default=["12", "23"])
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    for tag in args.rates:
        design_q5(tag)
