"""Can trained weights or a bigger batch push the early-exit bench past
572.9k cw/s?

The shipped bench (bench.py) spends its wave almost entirely in the
stage-1 t1=3 fused kernel over all B frames; stage 2 re-decodes <=128
survivors. Two candidate levers, both FER-safe:

- **trained t1=2**: RESULTS §22 rejected plain-RCQ t1=2 (2,910/8,192
  survivors at 7.0 dB). The TRAINED layered W-OMS-RCQ
  (zoo/worcq_bc3_layered_t6, RESULTS §14: 1.5-2.6x better FER than the
  bench decoder everywhere measured) converges faster — if its t1=2
  survivor count fits a modest budget, stage 1 drops a third of its
  iterations for a ~+15% wave saving.
- **B=16384**: halves per-wave dispatch/epilogue overhead per frame.

Every arm asserts bits-parity on converged frames is not required
(different decoders legitimately differ); instead the FER guard is the
§14 measurement — the trained decoder's FER is strictly better at the
operating point, so swapping it into the bench can only improve the
quality side of the quoted rate.

Timing harness = bench.py's (warm twice, device-reduce loop, one scalar
fetch, best-of-3, degraded-window retry).

    python experiments/ee_trained.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QP = ((2.0, 1.3), (4.0, 1.3), (6.0, 1.3))
VQP = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
# DDE-designed CN ladder (experiments/dde_ladders_results.json: FER
# 4.58e-5 vs hand 9.54e-5 at 6.5 dB — 2.1x better, so also a faster
# converger; candidate for fewer early-exit survivors)
QP_DDE = ((2.6474, 1.3), (3.0869, 1.3), (5.3767, 1.3))
T = 6


def main(out_path="experiments/ee_trained_results.json"):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.channel import awgn_llr
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(5, 37))
    code = ldpc_tpu.create_qc_code(base, lift=256, max_iterations=T)
    qc = build_qc_graph(base, 256)
    fused = dict(fused=True, batch_tile=64, dtype=jnp.bfloat16,
                 lean=True, natural=True)

    def mk(qp=QP):
        return ldpc_tpu.make_decoder(
            code, kind="rcq", bc=3, bv=8, quantizer_params=qp,
            v2c_quantizer_params=VQP, max_iterations=T, qc=qc,
            layered=True, qc_options=dict(fused))

    plain, dde = mk(), mk(QP_DDE)
    trained = ldpc_tpu.load_pretrained("worcq_bc3_layered_t6",
                                       qc_options=dict(fused))
    snr_db = 7.0
    key = jax.random.PRNGKey(0)

    def llrs_for(B, k=3):
        return [awgn_llr(kk, jnp.zeros((B, code.n), jnp.float32), snr_db)
                for kk in jax.random.split(key, k)]

    def time_wave(wave, llrs, B, budget, reps=10):
        """bench.py harness: warm x2 + overflow check, best-of-3 with
        degraded-window retry."""
        max_surv = 0
        for w in llrs[:2]:
            bits, n_surv = wave(w)
            max_surv = max(max_surv, int(n_surv))
            if int(n_surv) > budget:
                return None, max_surv   # overflow: arm invalid
            np.asarray(jnp.sum(bits))
        value = 0.0
        for attempt in range(4):
            for _ in range(3):
                t0 = time.time()
                for i in range(reps):
                    s = jnp.sum(wave(llrs[i % len(llrs)])[0])
                np.asarray(s)
                value = max(value, reps * B / (time.time() - t0))
            if value > 120_000.0:
                break
            time.sleep(120)
        return value, max_surv

    def survivors_at(dec, t1, llr, budget=8192):
        two = ldpc_tpu.make_two_checkpoint_decoder(dec, t1=t1,
                                                   survivor_budget=budget)
        return int(two(llr)[1])

    results = {}
    l8k = llrs_for(8192)

    # survivor counts first (cheap, decides which timed arms are valid)
    for name, dec in (("plain", plain), ("trained", trained),
                      ("dde", dde)):
        for t1 in (2, 3):
            ns = survivors_at(dec, t1, l8k[0])
            results[f"survivors_{name}_t1={t1}_B8192"] = ns
            print(f"survivors {name} t1={t1}: {ns}/8192", flush=True)

    arms = [("bench_plain_t1=3_S128_B8192", plain, 3, 128, 8192)]
    for tag, d in (("trained", trained), ("dde", dde)):
        if results[f"survivors_{tag}_t1=2_B8192"] <= 768:
            arms.append((f"{tag}_t1=2_S1024_B8192", d, 2, 1024, 8192))
        if results[f"survivors_{tag}_t1=3_B8192"] <= 96:
            arms.append((f"{tag}_t1=3_S128_B8192", d, 3, 128, 8192))
    arms.append(("bench_plain_t1=3_S256_B16384", plain, 3, 256, 16384))

    for name, dec, t1, S, B in arms:
        two = ldpc_tpu.make_two_checkpoint_decoder(dec, t1=t1,
                                                   survivor_budget=S)

        def wave(llr, two=two):
            out, n_surv = two(llr)
            return out.bits, n_surv

        ll = l8k if B == 8192 else llrs_for(B)
        val, msurv = time_wave(wave, ll, B, S)
        results[name] = {"cw_per_sec": val, "max_survivors": msurv}
        print(f"{name}: {val if val else 'OVERFLOW'} cw/s "
              f"(max_surv {msurv})", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"results -> {out_path}", flush=True)
    return results


if __name__ == "__main__":
    main()
