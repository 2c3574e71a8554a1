"""Headline benchmark: decoded codewords/sec at bc=3 RCQ on real hardware.

Decodes batched AWGN frames with the 3-bit RCQ min-sum decoder (the
BASELINE.json metric: "decoded codewords/sec/chip at bc=3 RCQ") on a
QC-lifted code of the paper's (9472, 8192) structural family, through
the whole-decode VMEM-resident Pallas kernel
(``ldpc_tpu/decode/pallas_fused.py``): message state lives in VMEM for
all iterations, HBM traffic is just LLRs in / posteriors out.

Decoder configuration (each choice FER-validated, docs/RESULTS.md):
- LAYERED schedule, 6 iterations — measured STRICTLY BETTER FER than the
  10-iteration flooding baseline at the operating points (0.059 vs 0.151
  at 6.25 dB, 8e-5 vs 5.2e-4 at 6.5 dB, 65k frames each), at 1.4x the
  throughput; this is also the schedule the paper's FPGA uses (SS VII-B);
- CN quantizer ladder 2-4-6 @ gamma 1.3, selected by the dev-FER sweep
  (experiments/accuracy_bc3.py) — ~0.08 dB better than the 3-5-7 default;
- bv=8 internal quantizer on the uniform (gamma=1) ladder — the
  TPU-native form (no transcendentals), +0.001 dB vs power-law.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the reference implementation's RCQ
decode rate — 0.0546 s/frame single-threaded on its (7,4) toy code
(`IMPLEMENTATION_SUMMARY.md:171`), i.e. ~18.3 codewords/sec — the only
throughput number the reference publishes.
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
    from ldpc_tpu.decode.pallas_fused import qc_fused_decode_batch_layered
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    # QC code with the paper's (9472, 8192) dimensions: 5x37 base, lift 256
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(5, 37))
    T = 6
    code = ldpc_tpu.create_qc_code(base, lift=256, max_iterations=T)
    qc = build_qc_graph(base, 256)
    dec = ldpc_tpu.make_decoder(
        code, kind="rcq", bc=3, bv=8,
        quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
        v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)),
        max_iterations=T, qc=qc, layered=True)

    B = 8192
    snr_db = 7.0  # operating point of this (5,37)-regular rate-0.865 code
    key = jax.random.PRNGKey(0)
    # channel LLRs generated once outside the timed region: the metric is
    # DECODE throughput (threefry for B*n=78M samples belongs to the
    # simulator, not the decoder)
    llrs = [awgn_llr(k, jnp.zeros((B, code.n), jnp.float32), snr_db)
            for k in jax.random.split(key, 3)]

    def wave(llr):
        out = qc_fused_decode_batch_layered(
            llr, dec.weights, qc=qc, spec=dec.spec,
            max_iterations=dec.max_iterations,
            dtype=jnp.bfloat16, batch_tile=64)
        return out.bits

    # warmup / compile (twice: first sync after a fresh compile can lie on
    # remote-attached runtimes)
    np.asarray(jnp.sum(wave(llrs[0])))
    np.asarray(jnp.sum(wave(llrs[1])))

    # best of 3 trials: the remote runtime's first post-warmup trial can
    # still run 1.5-3x slow (measured: 165k then 260k steady on identical
    # programs); the steady-state rate is the hardware number
    reps = 10
    value = 0.0
    for _ in range(3):
        t0 = time.time()
        for i in range(reps):
            s = jnp.sum(wave(llrs[i % len(llrs)]))  # device reduce
        np.asarray(s)  # one scalar host fetch closes the timing region
        value = max(value, reps * B / (time.time() - t0))
    ref_rcq_cw_per_sec = 1.0 / 0.0546  # IMPLEMENTATION_SUMMARY.md:171
    print(json.dumps({
        "metric": "decoded_codewords_per_sec_bc3_rcq_n9472_layered6",
        "value": round(value, 1),
        "unit": "codewords/sec/chip",
        "vs_baseline": round(value / ref_rcq_cw_per_sec, 1),
    }))


if __name__ == "__main__":
    main()
