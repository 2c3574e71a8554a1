"""Bench A/B #2: survivor-budget size at the shipped wave config.

Stage 2 of the two-checkpoint decoder costs one [S, B] x [B, n]
one-hot gather, a full-depth decode of S rows, and the scatter back.
At 7.0 dB the t1=3 survivor count is ~15-20 per 32768 frames, so
S=512 carries ~25x margin — S=256/128 halve/quarter the stage-2 work
while keeping >=6x margin. Interleaved trials as in bench_ab_r5.

    python experiments/bench_ab_s.py     # TPU, one process
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "experiments/bench_ab_s_results.json"


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
    dec = ldpc_tpu.make_decoder(
        code, kind="rcq", bc=3, bv=8,
        quantizer_params=((2.6474, 1.3), (3.0869, 1.3), (5.3767, 1.3)),
        v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)),
        max_iterations=T, qc=qc, layered=True,
        qc_options=dict(fused=True, batch_tile=64, dtype=jnp.bfloat16,
                        lean=True, natural=True))
    B, snr_db = 32768, 7.0
    llrs = [awgn_llr(k, jnp.zeros((B, code.n), jnp.float32), snr_db)
            for k in jax.random.split(jax.random.PRNGKey(0), 2)]
    budgets = (512, 256, 128)
    fns = {S: ldpc_tpu.make_two_checkpoint_decoder(dec, t1=3,
                                                   survivor_budget=S)
           for S in budgets}
    for S, fn in fns.items():
        t0 = time.time()
        for w in llrs:
            out, n_surv = fn(w)
            assert int(n_surv) <= S, (S, int(n_surv))
            np.asarray(jnp.sum(out.bits))
        print(f"warm S={S}: {time.time() - t0:.1f} s (surv "
              f"{int(n_surv)})", flush=True)
    reps = 10
    best = {S: 0.0 for S in budgets}
    for trial in range(4):
        for S, fn in fns.items():
            t0 = time.time()
            for i in range(reps):
                s = jnp.sum(fn(llrs[i % len(llrs)])[0].bits)
            np.asarray(s)
            rate = reps * B / (time.time() - t0)
            best[S] = max(best[S], rate)
            print(f"trial {trial} S={S}: {rate:,.0f} cw/s", flush=True)
    out = {str(S): round(v, 1) for S, v in best.items()}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
