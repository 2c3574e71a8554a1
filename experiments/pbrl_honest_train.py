"""Honest W-RCQ training on the precoded PBRL (post decision-bias fix).

RESULTS §33a reopened the paper's §VII-C ordering: honestly, the best
designed 4-bit CN ladder (refine pass 1, "ref3": 8.5-12.1-12.1@1.3) is
15x behind the 6-bit OMS anchor at 2.0 dB. The paper's own mechanism
for closing that gap is TRAINED degree-shared weights (W-NMS-RCQ);
round 3 dismissed training based on artifact-inflated designed
baselines, so this is the first honest measurement. Also serves the
round-3 VERDICT item-7 protocol sweep (LR / init-at-design-point /
weight-decay arms) on honest semantics.

Arms (bc=4, layered T=10, ref3 CN ladder, punctured-LLR training;
bv=None — in the layered schedule the bv qdq is decode-neutral
(RESULTS §33) and an unquantized posterior gives the BCE loss full-
resolution logits):

- ``worcq``     W-OMS-RCQ type 2, LR 2e-3 cosine (round-3 protocol)
- ``worcq-low`` init at the design point (zero tables), LR 3e-4
- ``worcq-wd``  LR 2e-3 + weight_decay 1e-3 toward the design point
- ``wrcq``      W-RCQ type 2 (multiplicative beta), LR 2e-3
- ``worcq-pl``  W-OMS-RCQ type 2 per-layer buckets, LR 2e-3

Dev: honest FER at 2.0/2.4 dB, 100 errors, vs {oms6, rcq-ref3}.

    python experiments/pbrl_honest_train.py [--epochs 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CK_DIR = "experiments/pbrl_honest_train_ck"
OUT = "experiments/pbrl_honest_train_results.json"
CN_REF3 = ((8.4963, 1.3), (12.108, 1.3), (12.108, 1.3))
VQP8 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
VQP6 = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
T = 10

ARMS = {
    "worcq": dict(kind="orcq", lr=2e-3, zinit=False, wd=0.0,
                  per_layer=False),
    "worcq-low": dict(kind="orcq", lr=3e-4, zinit=True, wd=0.0,
                      per_layer=False),
    "worcq-wd": dict(kind="orcq", lr=2e-3, zinit=False, wd=1e-3,
                     per_layer=False),
    "wrcq": dict(kind="wrcq", lr=2e-3, zinit=False, wd=0.0,
                 per_layer=False),
    "worcq-pl": dict(kind="orcq", lr=2e-3, zinit=False, wd=0.0,
                     per_layer=True),
}


def _setup():
    import jax
    import jax.numpy as jnp

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    base, lift, punct_cols = ldpc_tpu.create_pbrl_qc_protograph(
        k=1032, rate=1 / 3, precode=True)
    qc = build_qc_graph(base, lift)
    code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=T)
    punct_bits = tuple(range(lift * punct_cols[0],
                             lift * (punct_cols[0] + 1)))
    fused = dict(fused=True, batch_tile=None, dtype=jnp.bfloat16)
    if jax.default_backend() == "cpu":
        fused = dict(fused, interpret=True, dtype=jnp.float32)

    def mk(kind, *, bv=8, vqp=VQP8, per_layer=False, weights=None,
           trainable=False):
        if kind == "oms6":
            dec = ldpc_tpu.make_decoder(
                code, kind="oms", sharing_type=2, bv=6,
                v2c_quantizer_params=VQP6, max_iterations=T, qc=qc,
                layered=True, qc_options=dict(fused))
            dec.weights = {"beta": jnp.full_like(dec.weights["beta"], 0.5),
                           "alpha": jnp.zeros_like(dec.weights["alpha"])}
            return dec
        kw = {} if kind == "rcq" else dict(sharing_type=2,
                                           per_layer=per_layer)
        dec = ldpc_tpu.make_decoder(
            code, kind=kind, bc=4, bv=bv, quantizer_params=CN_REF3,
            v2c_quantizer_params=vqp if bv else None, max_iterations=T,
            qc=qc, layered=True, qc_options=dict(fused), **kw)
        if weights is not None:
            dec.weights = {k: jnp.asarray(v) for k, v in weights.items()}
        return dec

    return mk, punct_bits


def train_arm(name, spec, epochs=30, verbose=True):
    import jax.numpy as jnp

    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig
    from ldpc_tpu.utils.checkpoint import save_checkpoint

    mk, punct_bits = _setup()
    # train with bv=None: decode-neutral in layered, full-resolution
    # posterior logits for the BCE loss
    dec = mk(spec["kind"], bv=None, per_layer=spec["per_layer"])
    if spec["zinit"]:
        # orcq design point: zero offsets == the plain designed decoder
        dec.weights = {k: jnp.zeros_like(v)
                       for k, v in dec.weights.items() if v is not None}
    steps = epochs * (2048 // 128)
    tr = PosteriorJointTrainer(dec, TrainingConfig(
        batch_size=128, num_epochs=epochs, learning_rate=spec["lr"],
        snr_range=(1.5, 3.5), lr_schedule="cosine", warmup_steps=8,
        decay_steps=steps, early_stop_accuracy=2.0, seed=0,
        punctured_positions=punct_bits, weight_decay=spec["wd"]))
    h = tr.train(num_samples=2048, verbose=verbose)
    os.makedirs(CK_DIR, exist_ok=True)
    save_checkpoint(f"{CK_DIR}/{name}",
                    {k: v for k, v in dec.weights.items() if v is not None})
    print(f"trained {name}: loss {h['training_losses'][-1]:.5f}",
          flush=True)
    return h["training_losses"][-1]


def dev(arms, errors=100, frames=5 * 10 ** 7, snrs=(2.0, 2.4),
        verbose=True):
    from ldpc_tpu.sim import SimulationConfig, simulate_single_snr
    from ldpc_tpu.utils.checkpoint import load_checkpoint

    mk, punct_bits = _setup()
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for name in ("oms6", "rcq-ref3") + tuple(arms):
        if name in results:
            continue
        if name == "oms6":
            dec = mk("oms6")
        elif name == "rcq-ref3":
            dec = mk("rcq")
        else:
            spec = ARMS[name]
            dec = mk(spec["kind"], per_layer=spec["per_layer"],
                     weights=load_checkpoint(f"{CK_DIR}/{name}"))
        results[name] = {}
        for snr in snrs:
            cfg = SimulationConfig(
                snr_range=(snr, snr), max_frames=frames,
                max_errors=errors, min_frames=65536, wave_size=32768,
                early_exit_iters=5, survivor_budget=8192,
                punctured_positions=punct_bits, save_results=False)
            fer, ber, avg_it, nf, ne = simulate_single_snr(dec, snr, cfg)
            results[name][str(snr)] = {"fer": fer, "frames": nf,
                                       "errors": ne}
            if verbose:
                print(f"{name:10s} @ {snr} dB: FER {fer:.3e} "
                      f"({ne}/{nf})", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--errors", type=int, default=100)
    ap.add_argument("--arms", nargs="+", default=list(ARMS))
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import logging
    logging.basicConfig(level=logging.INFO, force=True)

    if not args.skip_train:
        for name in args.arms:
            if not os.path.exists(f"{CK_DIR}/{name}"):
                train_arm(name, ARMS[name], epochs=args.epochs)
    dev(args.arms, errors=args.errors)
