"""Comprehensive decoder comparison — the reference's integration test.

Capability parity with ``comprehensive_test.py`` in the reference: decode a
frame through every decoder variant at SNR 2 dB with timing and parameter
counts (``:26-185``), summary + parameter-reduction analysis (``:187-229``),
weight-pattern analysis (``:231-250``), and the quantizer round-trip golden
vector (``:252-268``).

Unlike the reference (assertion-free prints), failures here raise.

    python comprehensive_test.py [--code peg|test] [--batch N]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def test_all_decoders(code=None, batch: int = 256, snr_db: float = 2.0):
    """One timed batched decode through all 9 decoder variants
    (reference ``comprehensive_test.py:26-185`` does 1 frame; we decode a
    batch and report per-codeword throughput too)."""
    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.sim import create_test_decoders

    if code is None:
        code = ldpc_tpu.create_test_ldpc_code()
    zoo = create_test_decoders(code, max_iterations=10)
    llr = ldpc_tpu.awgn_llr(jax.random.PRNGKey(0),
                            jnp.zeros((batch, code.n)), snr_db)
    results = {}
    for name, dec in zoo.items():
        out = dec(llr)  # compile
        jax.block_until_ready(out.bits)
        t0 = time.time()
        out = dec(llr)
        jax.block_until_ready(out.bits)
        dt = time.time() - t0
        fer = float(jnp.mean(jnp.any(out.bits != 0, axis=1)))
        results[name] = {
            "params": dec.param_count(),
            "success_rate": float(jnp.mean(out.success)),
            "fer": fer,
            "avg_iterations": float(out.iterations.mean()),
            "time_per_codeword": dt / batch,
            "codewords_per_sec": batch / dt,
        }
        print(f"  {name:14s} params={results[name]['params']:4d} "
              f"FER={fer:.3f} iters={results[name]['avg_iterations']:5.2f} "
              f"{results[name]['codewords_per_sec']:10.0f} cw/s")
    return results


def analyze_results(results):
    """Summary table + parameter-reduction ratios
    (reference ``comprehensive_test.py:187-229``)."""
    base = results["N-NMS"]["params"]
    print(f"\n  parameter reduction vs N-NMS ({base} params):")
    for name, r in results.items():
        red = 100.0 * (1 - r["params"] / base) if base else 0.0
        print(f"  {name:14s} {r['params']:4d} params ({red:5.1f}% reduction)")
    # the reference's golden counts on (7,4)@10 iters (SURVEY §2a)
    if base == 130:
        assert results["N-2D-NMS-T1"]["params"] == 40
        assert results["N-2D-NMS-T2"]["params"] == 40
        assert results["N-2D-NMS-T3"]["params"] == 20
        assert results["N-2D-NMS-T4"]["params"] == 20
        print("  golden parameter counts OK (130/40/40/20/20)")


def test_weight_patterns():
    """Reference ``comprehensive_test.py:231-250``."""
    import ldpc_tpu
    from ldpc_tpu.report import analyze_weight_patterns

    code = ldpc_tpu.create_test_ldpc_code()
    dec = ldpc_tpu.neural_min_sum(code, max_iterations=10)
    an = analyze_weight_patterns(dec)
    assert an["total_parameters"] == 130
    assert set(an["mean_weight_by_check_degree"]) == {3, 4}
    print(f"  N-NMS weight stats: mean-by-dc="
          f"{ {k: round(v, 3) for k, v in an['mean_weight_by_check_degree'].items()} }")


def test_quantization():
    """Golden round-trip vector (reference ``comprehensive_test.py:252-268``,
    input from ``rcq_decoder.py:609``)."""
    import jax.numpy as jnp

    from ldpc_tpu.quantizer import NonUniformQuantizer

    q = NonUniformQuantizer(bc=3, C=5.0, gamma=1.5)
    x = jnp.asarray([-3.2, -1.1, 0.5, 2.8, 4.1])
    codes = np.asarray(q.quantize(x))
    np.testing.assert_array_equal(codes, [6, 5, 0, 2, 2])
    recon = np.asarray(q.dequantize(jnp.asarray(codes)))
    thr = q.thresholds
    np.testing.assert_allclose(
        recon, [-thr[2], -thr[1], 0.0, thr[2], thr[2]], rtol=1e-6)
    print(f"  quantizer golden vector OK: {np.round(recon, 3).tolist()}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", choices=["test", "peg"], default="test")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import ldpc_tpu

    code = (ldpc_tpu.create_test_ldpc_code() if args.code == "test" else
            ldpc_tpu.create_peg_code(n=128, m=64, dv=3, seed=0,
                                     max_iterations=10))
    print(f"[1/4] all decoders on ({code.n},{code.k}), batch={args.batch}")
    results = test_all_decoders(code, batch=args.batch)
    print("[2/4] parameter analysis")
    analyze_results(results)
    print("[3/4] weight patterns")
    test_weight_patterns()
    print("[4/4] quantization")
    test_quantization()
    print("\nALL COMPREHENSIVE TESTS PASSED")


if __name__ == "__main__":
    main()
