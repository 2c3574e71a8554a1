"""Degree-bucketed engine vs the general gather engine: same semantics on
irregular codes (hard outputs exact; posteriors to ~1 ulp — XLA associates
the padded vs dense column sums differently)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ldpc_tpu
from ldpc_tpu.channel import awgn_llr
from ldpc_tpu.decode.bucketed_engine import (
    build_bucketed_graph,
    bucketed_decode_batch,
)


def _check(dec, llr, bg, **bkw):
    ref = dec(llr)
    out = bucketed_decode_batch(llr, dec.weights, bg=bg, spec=dec.spec,
                                max_iterations=dec.max_iterations, **bkw)
    np.testing.assert_array_equal(np.asarray(out.bits), np.asarray(ref.bits))
    np.testing.assert_array_equal(np.asarray(out.success),
                                  np.asarray(ref.success))
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(out.posterior),
                               np.asarray(ref.posterior),
                               rtol=1e-5, atol=1e-5)
    return out


@pytest.mark.parametrize("kw", [
    dict(kind="ms", factor=0.7),
    dict(kind="nms", sharing_type=0, seed=1),
    dict(kind="nms", sharing_type=2, seed=2, init="nms"),
    dict(kind="oms", sharing_type=1, seed=3),
    dict(kind="rcq", bc=3, bv=8,
         quantizer_params=((3.0, 1.3), (5.0, 1.3), (7.0, 1.3))),
    dict(kind="wrcq", bc=4, sharing_type=2, seed=4, init="nms"),
    dict(kind="orcq", bc=3, sharing_type=3, seed=5),
])
def test_bucketed_matches_general_irregular(mid_code, kw):
    dec = ldpc_tpu.make_decoder(mid_code, max_iterations=8, **kw)
    bg = build_bucketed_graph(dec.graph)
    llr = awgn_llr(jax.random.PRNGKey(11), jnp.zeros((64, mid_code.n)), 2.5)
    _check(dec, llr, bg)


def test_bucketed_pbrl_and_check_every():
    """The PBRL family (degree-1 IR columns, hub columns) is the code class
    this engine exists for; also exercise amortized syndrome checks."""
    code = ldpc_tpu.create_pbrl_like_code(k=96, rate=1 / 3,
                                          max_iterations=8)
    dec = ldpc_tpu.rcq_min_sum(code, bc=4, bv=8, max_iterations=8)
    bg = build_bucketed_graph(dec.graph)
    llr = awgn_llr(jax.random.PRNGKey(5), jnp.zeros((32, code.n)), 3.0)
    _check(dec, llr, bg)
    # check_every=T matches the engine's own check_every semantics: compare
    # against the QC-style contract (iterations round up to the boundary)
    out = bucketed_decode_batch(llr, dec.weights, bg=bg, spec=dec.spec,
                                max_iterations=8, check_every=4)
    assert set(np.asarray(out.iterations).tolist()) <= {4, 8}


def test_bucketed_trajectory_matches(mid_code):
    dec = ldpc_tpu.neural_2d_min_sum(mid_code, weight_sharing_type=2,
                                     max_iterations=6, init="nms")
    bg = build_bucketed_graph(dec.graph)
    llr = awgn_llr(jax.random.PRNGKey(9), jnp.zeros((16, mid_code.n)), 2.0)
    ref = dec(llr, return_trajectory=True)
    out = bucketed_decode_batch(llr, dec.weights, bg=bg, spec=dec.spec,
                                max_iterations=6, return_trajectory=True)
    np.testing.assert_allclose(np.asarray(out.posteriors_all),
                               np.asarray(ref.posteriors_all),
                               rtol=1e-5, atol=1e-5)


def test_decoder_bucketed_option(mid_code):
    dec = ldpc_tpu.make_decoder(mid_code, kind="rcq", bc=4,
                                max_iterations=8, bucketed=True)
    ref = ldpc_tpu.make_decoder(mid_code, kind="rcq", bc=4,
                                max_iterations=8)
    llr = awgn_llr(jax.random.PRNGKey(2), jnp.zeros((32, mid_code.n)), 3.0)
    a, b = dec(llr), ref(llr)
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    with pytest.raises(ValueError):
        ldpc_tpu.make_decoder(mid_code, kind="ms", bucketed=True,
                              layered=True)


def test_bucketed_bf16_message_state():
    """dtype=bfloat16 moves the [E,B] permutations/carry in bf16 with f32
    arithmetic: hard outputs stay sane (success parity within a couple of
    frames of the f32 run at a workable SNR; f32 default is the exact
    contract pinned by the other tests)."""
    import jax

    import ldpc_tpu
    from ldpc_tpu.channel import awgn_llr

    from ldpc_tpu.codes import build_graph
    code = ldpc_tpu.create_pbrl_like_code(k=86, rate=1 / 3, seed=0,
                                          max_iterations=8)
    graph = build_graph(code)
    bg = build_bucketed_graph(graph)
    dec = ldpc_tpu.make_decoder(code, kind="rcq", bc=3, bv=8,
                                max_iterations=8)
    llr = awgn_llr(jax.random.PRNGKey(0), jnp.zeros((64, code.n)), 3.0)
    f32 = bucketed_decode_batch(llr, dec.weights, bg=bg, spec=dec.spec,
                                max_iterations=8)
    b16 = bucketed_decode_batch(llr, dec.weights, bg=bg, spec=dec.spec,
                                max_iterations=8, dtype=jnp.bfloat16)
    ok32 = int(jnp.sum(f32.success))
    ok16 = int(jnp.sum(b16.success))
    assert abs(ok32 - ok16) <= 3
    agree = float(jnp.mean(b16.bits == f32.bits))
    assert agree > 0.99
