"""Round-5 bench A/B: wave size + batch tile around the shipped config.

PERFORMANCE.md's roofline puts the kernel at ~60% of the VPU ceiling
with op reduction as the only real lever; the remaining cheap wins are
dispatch amortization. This A/Bs the shipped (B=32768, batch_tile=64,
S=512) against a larger wave (49152 — 65536 exhausted HBM in round 3)
and the auto-picked tile, interleaved trials (the first post-warmup
trial can read 1.5-3x slow — always interleave A/B comparisons).

    python experiments/bench_ab_r5.py          # TPU, one process
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "experiments/bench_ab_r5_results.json"


def main():
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ldpc_tpu
    from ldpc_tpu.channel import awgn_llr
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(5, 37))
    T = 6
    code = ldpc_tpu.create_qc_code(base, lift=256, max_iterations=T)
    qc = build_qc_graph(base, 256)

    def mk(bt):
        return ldpc_tpu.make_decoder(
            code, kind="rcq", bc=3, bv=8,
            quantizer_params=((2.6474, 1.3), (3.0869, 1.3),
                              (5.3767, 1.3)),
            v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)),
            max_iterations=T, qc=qc, layered=True,
            qc_options=dict(fused=True, batch_tile=bt,
                            dtype=jnp.bfloat16, lean=True, natural=True))

    # two configs only, two waves each: holding every config's LLR
    # buffers simultaneously is what interleaved A/B costs in HBM —
    # 3 configs x 3 waves of [B, 9472] f32 RESOURCE_EXHAUSTED the chip
    configs = {
        "ship_b32k_t64": dict(B=32768, bt=64, S=512),
        "b48k_t64": dict(B=49152, bt=64, S=768),
    }
    snr_db = 7.0
    key = jax.random.PRNGKey(0)
    waves = {}
    for name, c in configs.items():
        dec = mk(c["bt"])
        two_ck = ldpc_tpu.make_two_checkpoint_decoder(
            dec, t1=3, survivor_budget=c["S"])
        llrs = [awgn_llr(k, jnp.zeros((c["B"], code.n), jnp.float32),
                         snr_db) for k in jax.random.split(key, 2)]
        waves[name] = (two_ck, llrs, c)

    # warm every config before ANY timing (interleaved trials after)
    for name, (two_ck, llrs, c) in waves.items():
        t0 = time.time()
        for w in llrs[:2]:
            out, n_surv = two_ck(w)
            assert int(n_surv) <= c["S"], (name, int(n_surv))
            np.asarray(jnp.sum(out.bits))
        print(f"warm {name}: {time.time() - t0:.1f} s", flush=True)

    reps = 10
    best = {name: 0.0 for name in configs}
    for trial in range(4):
        for name, (two_ck, llrs, c) in waves.items():
            t0 = time.time()
            for i in range(reps):
                s = jnp.sum(two_ck(llrs[i % len(llrs)])[0].bits)
            np.asarray(s)
            rate = reps * c["B"] / (time.time() - t0)
            best[name] = max(best[name], rate)
            print(f"trial {trial} {name}: {rate:,.0f} cw/s", flush=True)
    out = {n: {"cw_per_sec": round(v, 1), **configs[n]}
           for n, v in best.items()}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
