"""Throughput matrix on real codes (bench-realism evidence).

Measures decode throughput on TPU for:

1. the headline bench QC code (5x37 full base, lift 256) — fused layered
   T=6 and fused flooding T=10 (cross-check of bench.py);
2. the committed DVB-S2-structure (16200, 7200) IRA protograph
   (codes/dvbs2_like_16200_7200.proto): IRREGULAR row degrees (the
   equal-degree row-batched precondition does not hold) and lift 360
   (not a multiple of 128) — the generality quote VERDICT r1 asked for;
3. the Tanner (155, 64) published code (lift 31, sub-lane-width blocks);
4. PBRL-like irregular non-QC code: general gather engine vs the
   degree-bucketed engine (the >=3x claim for bucketed_engine.py).

Timing: warm twice, loop with a device-side reduction, one scalar fetch
(the only reliable harness on the tunneled runtime — CLAUDE.md).

    python experiments/throughput_matrix.py [--reps 10] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QP = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
VQP = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))


def _time(fn, llr, reps):
    import jax
    import jax.numpy as jnp

    s = jnp.sum(fn(llr).posterior)
    s.block_until_ready()
    s = jnp.sum(fn(llr).posterior)
    np.asarray(s)  # settle the tunnel
    # best of 3 trials: the first post-warmup trial on this runtime can
    # still run 1.5-3x slow (bench.py has the same guard)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        acc = jnp.zeros(())
        for _ in range(reps):
            acc = acc + jnp.sum(fn(llr).iterations)
        float(np.asarray(acc))
        best = min(best, time.time() - t0)
    return best


def run(reps: int = 10, out_path: str = "experiments/throughput_matrix.json",
        verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.channel import awgn_llr
    from ldpc_tpu.codes import load_protograph
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    results = {}

    def measure(name, dec, B, snr, reps=reps):
        llr = awgn_llr(jax.random.PRNGKey(0), jnp.zeros((B, dec.code.n)),
                       snr)
        dt = _time(dec, llr, reps)
        cws = reps * B / dt
        results[name] = {"cw_per_sec": round(cws, 1), "batch": B,
                         "n": dec.code.n, "snr_db": snr,
                         "info_bits_per_sec": round(cws * dec.code.k, 1)}
        if verbose:
            print(f"{name}: {cws:,.0f} cw/s  (n={dec.code.n}, B={B})",
                  flush=True)

    fused = dict(fused=True, batch_tile=64, dtype=jnp.bfloat16)

    # 1. bench code
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(5, 37))
    qcg = build_qc_graph(base, 256)
    code6 = ldpc_tpu.create_qc_code(base, lift=256, max_iterations=6)
    dec = ldpc_tpu.make_decoder(code6, kind="rcq", bc=3, bv=8,
                                quantizer_params=QP,
                                v2c_quantizer_params=VQP, max_iterations=6,
                                qc=qcg, layered=True, qc_options=fused)
    measure("bench_qc9472_layered6_fused", dec, 8192, 7.0)

    code10 = ldpc_tpu.create_qc_code(base, lift=256, max_iterations=10)
    dec = ldpc_tpu.make_decoder(code10, kind="rcq", bc=3, bv=8,
                                quantizer_params=QP,
                                v2c_quantizer_params=VQP, max_iterations=10,
                                qc=qcg, qc_options=fused)
    measure("bench_qc9472_flooding10_fused", dec, 8192, 7.0)

    # 2. DVB-S2-structure irregular protograph (committed matrix)
    b2, lift2 = load_protograph("codes/dvbs2_like_16200_7200.proto")
    qc2 = build_qc_graph(b2, lift2)
    c2 = ldpc_tpu.create_qc_code(b2, lift=lift2, max_iterations=6)
    dec = ldpc_tpu.make_decoder(c2, kind="rcq", bc=3, bv=8,
                                quantizer_params=QP,
                                v2c_quantizer_params=VQP, max_iterations=6,
                                qc=qc2, layered=True,
                                qc_options=dict(fused, batch_tile=None))
    # batch_tile=None: lift-360 blocks pad lanes to 384, so the auto-pick
    # drops to 32 to fit scoped VMEM (64 OOMs the v5e compiler at 21.4 MB)
    measure("dvbs2_16200_layered6_fused", dec, 4096, 1.6)

    # 3. Tanner (155, 64): tiny blocks (lift 31)
    b3, lift3 = load_protograph("codes/tanner_155_64.proto")
    qc3 = build_qc_graph(b3, lift3)
    c3 = ldpc_tpu.create_qc_code(b3, lift=lift3, max_iterations=6)
    dec = ldpc_tpu.make_decoder(c3, kind="rcq", bc=3, bv=8,
                                quantizer_params=QP,
                                v2c_quantizer_params=VQP, max_iterations=6,
                                qc=qc3, layered=True,
                                qc_options=dict(fused, batch_tile=512))
    measure("tanner155_layered6_fused", dec, 16384, 4.0)

    # 3b. QC-lifted PBRL (paper §VII-C structure, lift 86): the fused-path
    #     quote for the same irregular family measured flat in 4. below
    b5, lift5 = ldpc_tpu.create_pbrl_qc_protograph(k=1032, rate=1 / 3)
    qc5 = build_qc_graph(b5, lift5)
    c5 = ldpc_tpu.create_qc_code(b5, lift=lift5, max_iterations=10)
    dec = ldpc_tpu.make_decoder(c5, kind="rcq", bc=3, bv=8,
                                quantizer_params=QP,
                                v2c_quantizer_params=VQP, max_iterations=10,
                                qc=qc5, layered=True,
                                qc_options=dict(fused, batch_tile=None))
    measure("pbrl3096_qc_layered10_fused", dec, 8192, 1.2)

    # 4. PBRL-like irregular non-QC: general vs bucketed engine
    c4 = ldpc_tpu.create_pbrl_like_code(k=1032, rate=1 / 3,
                                        max_iterations=10)
    for name, kw in (("pbrl3096_general", {}),
                     ("pbrl3096_bucketed", {"bucketed": True})):
        dec = ldpc_tpu.make_decoder(c4, kind="rcq", bc=3, bv=8,
                                    quantizer_params=QP,
                                    v2c_quantizer_params=VQP,
                                    max_iterations=10, **kw)
        measure(name, dec, 2048, 1.2, reps=max(3, reps // 3))
    if "pbrl3096_general" in results:
        results["bucketed_speedup"] = round(
            results["pbrl3096_bucketed"]["cw_per_sec"]
            / results["pbrl3096_general"]["cw_per_sec"], 2)
        if verbose:
            print(f"bucketed speedup: {results['bucketed_speedup']}x",
                  flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"results -> {out_path}", flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="experiments/throughput_matrix.json")
    args = ap.parse_args()
    run(reps=args.reps, out_path=args.out)
