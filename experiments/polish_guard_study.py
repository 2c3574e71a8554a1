"""Settle the floor-polish objective (VERDICT r4 item 3).

Three polish variants of the same threshold-designed 3-pair ladder are
on record for rate 1/2 (and 1/3):

- UNGUARDED floor polish: floor 5.6e-9 -> 9.7e-16 but the waterfall
  paid ~0.5 dB (measured MC +0.40 dB vs the 6-bit OMS anchor).
- Guard at the threshold, slack 1.5x: rejected EVERY candidate — floor
  unchanged (pbrl_rates_design_12_polish2.json).
- THIS STUDY — the two-point objective: floor descent at the
  post-waterfall peak, with the guard moved to ``threshold + off`` and
  a wide slack (the waterfall there is orders steeper, so a 10x error
  budget costs only ~0.01-0.03 dB of shift): accept the candidate with
  the smallest floor whose waterfall error at thr+off stays within
  ``slack`` of the seed's.

Writes ``pbrl_rates_design_<tag>_polish3.json`` with the resulting
ladder + re-estimated threshold; reports (thr, floor) for seed /
polish / polish3 / q4 side by side.

    python experiments/polish_guard_study.py --rates 12 13   # CPU
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pbrl_rates import BC, BV, RATES, T, family  # noqa: E402

from ldpc_tpu.design import estimate_threshold  # noqa: E402
from ldpc_tpu.design.proto_dde import (  # noqa: E402
    protograph_density_evolution as de, refine_ladders_protograph)

OUT3 = "experiments/pbrl_rates_design_{tag}_polish3.json"


def floor_probe(base, cn, vqp, thr, kw, verbose=True):
    probe = []
    for off in (0.5, 1.0, 1.5, 2.0, 3.0):
        r = de(base, snr_db=thr + off, kind="rcq",
               quantizer_params=tuple(tuple(x) for x in cn),
               v2c_quantizer_params=tuple(tuple(x) for x in vqp), **kw)
        probe.append((thr + off, float(r.error_prob[-1])))
    peak = max(probe, key=lambda p: p[1])
    if verbose:
        for s, e in probe:
            print(f"    probe {s:.2f}: {e:.3e}", flush=True)
    return peak


def study(tag, guard_off=0.25, guard_slack=10.0, verbose=True):
    base, lift, punct = family(tag)
    d = json.load(open(f"experiments/pbrl_rates_design_{tag}.json"))
    bp = d["passes"][d["best_index"]]
    cn = [list(x) for x in bp["cn"]]
    vqp = tuple(tuple(x) for x in bp["v2c"])
    thr0 = bp["threshold_db"]
    gs = d.get("grid_step", 1 / 16)
    kw = dict(max_iterations=T, bc=BC, bv=BV, schedule="layered",
              punctured_cols=punct, grid_step=gs)
    print(f"rate {tag}: seed thr {thr0:.3f}", flush=True)
    peak_snr, peak_err = floor_probe(base, cn, vqp, thr0, kw, verbose)
    print(f"  seed floor {peak_err:.3e} @ {peak_snr:.2f}", flush=True)

    cur, cur_v, e = tuple(tuple(x) for x in cn), vqp, peak_err
    for i in range(2):
        cur, cur_v, e = refine_ladders_protograph(
            base, cur, cur_v, snr_db=peak_snr, objective="floor",
            guard_snr=thr0 + guard_off, guard_slack=guard_slack,
            sweep=(0.6, 0.8, 0.9, 1.1, 1.25, 1.6),
            gammas=(1.0, 1.15, 1.3, 1.5, 1.8, 2.2), **kw)
        print(f"  pass {i + 1}: floor {e:.3e} cn {cur}", flush=True)
    thr3 = float(estimate_threshold(base, cur, cur_v, **kw))
    _, post_floor = floor_probe(base, cur, cur_v, thr3, kw, verbose=False)
    out = {"rate": RATES[tag], "guard_off": guard_off,
           "guard_slack": guard_slack, "seed_thr": thr0,
           "seed_floor": peak_err, "threshold_db": thr3,
           "floor": float(post_floor),
           "cn": [list(x) for x in cur], "v2c": [list(x) for x in cur_v]}
    with open(OUT3.format(tag=tag), "w") as f:
        json.dump(out, f, indent=2)

    # side-by-side report
    rows = [("seed", thr0, peak_err), ("polish3", thr3, float(post_floor))]
    for name, path in (("polish",
                        f"experiments/pbrl_rates_design_{tag}_polish.json"),
                       ("q4",
                        f"experiments/pbrl_rates_design_{tag}_q4.json")):
        if os.path.exists(path):
            p = json.load(open(path))
            pthr = p.get("threshold_db")
            if pthr is None:
                pthr = float(estimate_threshold(
                    base, tuple(tuple(x) for x in p["cn"]),
                    tuple(tuple(x) for x in p["v2c"]), **kw))
            _, pf = floor_probe(base, p["cn"], p["v2c"], pthr, kw,
                                verbose=False)
            rows.append((name, float(pthr), float(pf)))
    print(f"rate {tag} summary:", flush=True)
    for name, t, f_ in rows:
        print(f"  {name:8s} thr {t:7.3f}  floor {f_:.3e}", flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", nargs="+", default=["12", "13"])
    ap.add_argument("--guard-off", type=float, default=0.25)
    ap.add_argument("--guard-slack", type=float, default=10.0)
    args = ap.parse_args()
    for tag in args.rates:
        study(tag, guard_off=args.guard_off, guard_slack=args.guard_slack)
