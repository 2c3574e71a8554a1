"""On-chip A/B of fused-kernel epilogue variants for the headline bench.

Arms (all bc=3/bv=8 RCQ, layered T=6, {t1,6} two-checkpoint early exit,
B=8192 on the (9472,8192)-class QC code — identical to bench.py):
  full_block   — shipped program: [B,n] bf16 posterior + int32 bits
  lean_block   — lean=True: int8 bits only, no posterior materialized
  lean_natural — lean=True natural=True: kernel streams llr/posterior in
                 the natural [B, n] layout (no [nb, B, L] transposes)
  lean_nat_t1_2 — lean_natural with t1=2, survivor_budget=1024

Protocol (CLAUDE.md): warm twice per arm, on-device bits-parity vs the
shipped arm, then INTERLEAVED best-of-3 trials (device-reduce timing,
one scalar fetch per trial) so tunnel drift hits all arms equally.

Writes experiments/lean_ab_results.json.
"""

import json
import time

import numpy as np


def main():
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.channel import awgn_llr
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(5, 37))
    T = 6
    code = ldpc_tpu.create_qc_code(base, lift=256, max_iterations=T)
    qc = build_qc_graph(base, 256)

    def make_wave(lean, natural, t1, budget):
        dec = ldpc_tpu.make_decoder(
            code, kind="rcq", bc=3, bv=8,
            quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
            v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)),
            max_iterations=T, qc=qc, layered=True,
            qc_options=dict(fused=True, batch_tile=64, dtype=jnp.bfloat16,
                            lean=lean, natural=natural))
        two_ck = ldpc_tpu.make_two_checkpoint_decoder(
            dec, t1=t1, survivor_budget=budget)

        def wave(llr):
            out, n_surv = two_ck(llr)
            return out.bits, n_surv
        return wave

    arms = [
        ("full_block", make_wave(False, False, 3, 128), 128),
        ("lean_block", make_wave(True, False, 3, 128), 128),
        ("lean_natural", make_wave(True, True, 3, 128), 128),
        # t1=2 measured 2910/8192 survivors at 7.0 dB — the full-depth
        # re-decode of 36% of the batch dominates; not a viable arm.
    ]

    B = 8192
    snr_db = 7.0
    key = jax.random.PRNGKey(0)
    llrs = [awgn_llr(k, jnp.zeros((B, code.n), jnp.float32), snr_db)
            for k in jax.random.split(key, 3)]

    # warm + parity: bits of every arm must match the shipped arm exactly
    ref_bits = None
    for name, wave, budget in arms:
        t0 = time.time()
        bits, n_surv = wave(llrs[0])
        np.asarray(jnp.sum(bits))
        print(f"[{name}] compile+run1 {time.time()-t0:.1f}s "
              f"survivors={int(n_surv)}", flush=True)
        assert int(n_surv) <= budget, f"{name}: survivor overflow"
        bits2, _ = wave(llrs[1])
        np.asarray(jnp.sum(bits2))
        if ref_bits is None:
            ref_bits = (jnp.asarray(bits, jnp.int32),
                        jnp.asarray(bits2, jnp.int32))
        else:
            mism = int(np.asarray(
                jnp.sum(jnp.abs(jnp.asarray(bits, jnp.int32) - ref_bits[0]))
                + jnp.sum(jnp.abs(jnp.asarray(bits2, jnp.int32)
                                  - ref_bits[1]))))
            print(f"[{name}] bit mismatches vs full_block: {mism}",
                  flush=True)
            # t1=2 arm may legitimately differ on frames that converge
            # between iters 2 and 3 only if freezing differs — it must NOT:
            # two-checkpoint is exact for any t1. Hard-assert all arms.
            assert mism == 0, f"{name}: {mism} bit mismatches"

    reps = 10
    best = {name: 0.0 for name, _, _ in arms}
    for trial in range(3):
        for name, wave, _ in arms:
            t0 = time.time()
            for i in range(reps):
                s = jnp.sum(wave(llrs[i % len(llrs)])[0])
            np.asarray(s)
            rate = reps * B / (time.time() - t0)
            best[name] = max(best[name], rate)
            print(f"trial {trial} [{name}] {rate:,.0f} cw/s", flush=True)

    print(json.dumps(best, indent=2), flush=True)
    with open("experiments/lean_ab_results.json", "w") as f:
        json.dump({"arms": best, "B": B, "snr_db": snr_db,
                   "protocol": "best-of-3 interleaved, device-reduce"},
                  f, indent=2)


if __name__ == "__main__":
    main()
