"""Trapping-set spectra of the measured codes: the finite-graph side of
the RESULTS §16-18 floor story, computed WITHOUT decoding a frame.

§17's protograph DE localized the QC PBRL rate-1/3 floor to the finite
graph (ensemble quantization was exonerated); experiments/pbrl_lift_floor
measures lift-86 vs lift-258 FER directly. This script computes the
structural fingerprint both rest on: the low-(a, b) trapping-set
spectrum of each graph (``ldpc_tpu.design.find_trapping_sets``). The
floor prediction: the graph with more small-(a, b) classes (especially
low-b absorbing sets) floors higher.

Codes profiled:
- QC PBRL (3096, 1032) lift 86 — the §16 floored code;
- same base shape at lift 258 — the pbrl_lift_floor candidate fix;
- the bench-class (9472, 8192) QC code — measured floor-free to 2e-8
  (RESULTS §12 deep-FER campaign), so its spectrum is the healthy
  baseline;
- Tanner (155, 64) — published algebraic code, known to be
  floor-resistant at these sizes.

    python experiments/trapping_spectrum.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ldpc_tpu  # noqa: E402
from ldpc_tpu.design import find_trapping_sets  # noqa: E402


def profile(name, H, a_max=8, b_max=4, restarts=3):
    # ONE unbounded-b search serves both outputs: the displayed b<=b_max
    # spectrum (filtered from class_counts) and the min-b fingerprint
    # (min over all recorded classes) — running trapping_set_profile
    # separately would repeat the whole restarts*a_max matmul search
    dv_max = int(np.asarray(H).sum(axis=0).max())
    rep = find_trapping_sets(H, a_max=a_max, b_max=dv_max * a_max,
                             restarts=restarts, seed=0, max_sets=10000)
    low = {ab: d for ab, d in rep.class_counts().items() if ab[1] <= b_max}
    print(f"== {name} ==", flush=True)
    print(f"trapping-set spectrum (a<={a_max}, b<={b_max} shown) of "
          f"H {list(np.asarray(H).shape)}:", flush=True)
    for (a, b) in sorted(low, key=lambda ab: (ab[1], ab[0])):
        d = low[(a, b)]
        print(f"  ({a:2d},{b:2d}): {d['unique']:5d} unique, "
              f"{d['elementary']:5d} elementary, "
              f"{d['absorbing']:5d} absorbing", flush=True)
    fingerprint = {}
    for (a, b) in rep.class_counts():
        fingerprint[a] = min(fingerprint.get(a, b), b)
    print(f"  min-b fingerprint: "
          f"{ {a: fingerprint[a] for a in sorted(fingerprint)} }", flush=True)
    spec = {f"{a},{b}": d for (a, b), d in sorted(low.items())}
    return dict(spectrum=spec, min_b_fingerprint=dict(sorted(
        fingerprint.items())))


def main(out_path="experiments/trapping_spectrum_results.json"):
    results = {}

    base86, lift86 = ldpc_tpu.create_pbrl_qc_protograph(k=1032, rate=1 / 3,
                                                        lift=86)
    code86 = ldpc_tpu.create_qc_code(base86, lift=lift86, max_iterations=5)
    results["pbrl_qc_lift86"] = profile("QC PBRL (3096,1032) lift 86",
                                        code86.H)

    base258, lift258 = ldpc_tpu.create_pbrl_qc_protograph(
        k=1032, rate=1 / 3, lift=258)
    code258 = ldpc_tpu.create_qc_code(base258, lift=lift258,
                                      max_iterations=5)
    results["pbrl_qc_lift258"] = profile("QC PBRL (3096,1032) lift 258",
                                         code258.H)

    baseP, liftP, _punct = ldpc_tpu.create_pbrl_qc_protograph(
        k=1032, rate=1 / 3, lift=86, precode=True)
    codeP = ldpc_tpu.create_qc_code(baseP, lift=liftP, max_iterations=5)
    results["pbrl_qc_precoded_lift86"] = profile(
        "QC PBRL precoded (punctured high-degree node), lift 86", codeP.H)

    rng = np.random.default_rng(0)      # the bench.py base (5x37, lift 256)
    bench_base = rng.integers(0, 256, size=(5, 37))
    bench = ldpc_tpu.create_qc_code(bench_base, lift=256, max_iterations=5)
    results["bench_qc_9472"] = profile("bench QC (9472,8192) lift 256",
                                       bench.H, restarts=2)

    tanner = ldpc_tpu.load_protograph("codes/tanner_155_64.proto")
    tcode = ldpc_tpu.create_qc_code(tanner[0], lift=tanner[1],
                                    max_iterations=5)
    results["tanner_155_64"] = profile("Tanner (155,64)", tcode.H)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"results -> {out_path}", flush=True)
    return results


if __name__ == "__main__":
    main()
