"""Pretrained-decoder zoo: save/load round-trips rebuild the exact decoder.

Deployment format for trained weights — a capability the reference lacks
(trained parameters die with the process; ``training_framework.py`` never
persists them)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ldpc_tpu
from ldpc_tpu.channel import awgn_llr
from ldpc_tpu.decode.qc_engine import build_qc_graph


def _trained_like(dec, seed=11):
    """Perturb weights deterministically to simulate training."""
    key = jax.random.PRNGKey(seed)
    w = {}
    for k, v in dec.weights.items():
        if v is None:
            w[k] = None
        else:
            key, sub = jax.random.split(key)
            w[k] = v + 0.05 * jax.random.normal(sub, v.shape)
    dec.weights = w
    return dec


def test_zoo_roundtrip_qc(tmp_path):
    base = np.array([[0, 3, 5, 7], [4, 1, 6, 0], [2, 5, 0, 3]])
    code = ldpc_tpu.create_qc_code(base, lift=16, max_iterations=6)
    qc = build_qc_graph(base, 16)
    dec = _trained_like(ldpc_tpu.make_decoder(
        code, kind="orcq", bc=3, bv=8, sharing_type=2,
        quantizer_params=((2.0, 1.3), (4.0, 1.3), (6.0, 1.3)),
        v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)),
        max_iterations=6, qc=qc))
    meta = {"trained_on": "unit-test", "fer": {"6.5": 1e-3}}
    ldpc_tpu.save_pretrained(str(tmp_path / "e"), dec, meta=meta)

    got = ldpc_tpu.load_pretrained(str(tmp_path / "e"))
    assert got.name == dec.name and got.qc is not None
    assert got.code.n == dec.code.n and got.code.k == dec.code.k
    for k, v in dec.weights.items():
        if v is None:
            assert got.weights[k] is None
        else:
            np.testing.assert_array_equal(np.asarray(got.weights[k]),
                                          np.asarray(v))
    llr = awgn_llr(jax.random.PRNGKey(0), jnp.zeros((32, code.n)), 2.5)
    np.testing.assert_array_equal(np.asarray(got(llr).bits),
                                  np.asarray(dec(llr).bits))
    # listing surfaces the metadata
    entries = ldpc_tpu.list_pretrained(str(tmp_path))
    assert len(entries) == 1 and entries[0][1]["meta"] == meta


def test_zoo_roundtrip_alist_general_engine(tmp_path):
    code = ldpc_tpu.create_peg_code(n=64, m=32, dv=3, seed=2,
                                    max_iterations=5)
    dec = _trained_like(ldpc_tpu.neural_2d_min_sum(code, 2, seed=4))
    ldpc_tpu.save_pretrained(str(tmp_path / "g"), dec)
    got = ldpc_tpu.load_pretrained(str(tmp_path / "g"))
    assert got.qc is None
    np.testing.assert_array_equal(got.code.H, dec.code.H)
    llr = awgn_llr(jax.random.PRNGKey(1), jnp.zeros((16, code.n)), 2.0)
    np.testing.assert_array_equal(np.asarray(got(llr).bits),
                                  np.asarray(dec(llr).bits))


def test_zoo_truncated_load_and_guards(tmp_path):
    base = np.array([[0, 3, 5], [4, 1, 6]])
    code = ldpc_tpu.create_qc_code(base, lift=8, max_iterations=6)
    qc = build_qc_graph(base, 8)
    dec = _trained_like(ldpc_tpu.make_decoder(
        code, kind="wrcq", bc=4, sharing_type=1, max_iterations=6, qc=qc))
    ldpc_tpu.save_pretrained(str(tmp_path / "t"), dec)
    # reduced schedule slices the [T, ...] tables
    short = ldpc_tpu.load_pretrained(str(tmp_path / "t"), max_iterations=4)
    assert short.max_iterations == 4
    np.testing.assert_array_equal(
        np.asarray(short.weights["beta"]),
        np.asarray(dec.weights["beta"][:4]))
    # extending beyond the trained schedule is refused
    with pytest.raises(ValueError):
        ldpc_tpu.load_pretrained(str(tmp_path / "t"), max_iterations=9)
    # qc_options pass through (interpret fused on CPU)
    fdec = ldpc_tpu.load_pretrained(
        str(tmp_path / "t"),
        qc_options={"fused": True, "batch_tile": 8, "interpret": True,
                    "dtype": jnp.float32})
    llr = awgn_llr(jax.random.PRNGKey(2), jnp.zeros((8, code.n)), 2.5)
    assert fdec(llr).bits.shape == (8, code.n)
    # hand-assembled decoders (no recipe) can't be saved
    bare = dataclasses.replace(dec, recipe=None)
    with pytest.raises(ValueError):
        ldpc_tpu.save_pretrained(str(tmp_path / "x"), bare)
