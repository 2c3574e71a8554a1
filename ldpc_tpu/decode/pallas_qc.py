"""Pallas fused kernels for the QC decode path.

Why: profiling the XLA QC engine on TPU v5e showed device time dominated by
kernel-launch overhead — ~1400 small fusions per decode at ~50-70us each,
not HBM bandwidth. The fix is fewer, fatter launches: ONE Pallas kernel per
base row fuses that row's entire check-node update (rolled loads, running
min1/min2/argmin tree, leave-one-out sign parity, variant transform, rolled
store), and one per base column fuses the variable-node update (column sum,
leave-one-out v2c, bv-bit posterior quantization). The batch rides the
Pallas grid — one launch pipelines all batch tiles HBM->VMEM->HBM with
double buffering handled by the BlockSpec machinery.

Circulant rolls are static python shifts, so inside the kernel they are
two contiguous VMEM slices — no gathers anywhere (same property the XLA QC
engine exploits, ``qc_engine.py`` module docstring).

Semantics: identical to ``qc_engine.cn_and_vn`` (and therefore to the
general engine / the reference contract, SURVEY §2b) — verified in
``tests/test_pallas_qc.py``. Inference-only (the training path uses the
differentiable XLA engines).

Measured caveat: on backends where every ``pallas_call`` dispatch crosses a
remote tunnel (the dev environment's single-chip proxy), per-call overhead
dominates and the XLA QC engine (one fused scan program) is faster; on a
directly-attached TPU runtime the 42-launches-per-iteration structure is
the intended fast path. ``qc_engine.qc_decode_batch`` remains the default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_tpu.decode.engine import DecodeResult, VariantSpec, _scan_xs
from ldpc_tpu.decode.qc_engine import QCGraph, _per_block_weights
from ldpc_tpu.quantizer import QDQ_SIGN_TINY, power_qdq

__all__ = ["qc_pallas_decode_batch"]


def _roll(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """``jnp.roll(x, s, axis=0)`` with a static shift: two contiguous VMEM
    slices + concat. Normalizes s into [0, L)."""
    L = x.shape[0]
    s = s % L
    if s == 0:
        return x
    return jnp.concatenate([x[L - s:], x[:L - s]], axis=0)


def _kernel_qdq(x, thr_ref, qp_ref, levels: int):
    """Variant-transform quantizer inside a kernel: exact staircase for
    small LUTs, closed-form power law for large ones (same policy as
    ``engine._make_qdq``)."""
    if levels <= 16:
        # staircase with SMEM scalar threshold reads (SMEM loads must be
        # scalars; the j-loop is static so each read is one scalar)
        mag = jnp.abs(x)
        snapped = jnp.zeros_like(mag)
        for j in range(1, levels):
            step = thr_ref[0, j] - thr_ref[0, j - 1]
            snapped = snapped + jnp.where(mag >= thr_ref[0, j], step, 0.0)
        # sign-preserving dead-zone floor (quantizer.QDQ_SIGN_TINY)
        snapped = jnp.maximum(snapped, QDQ_SIGN_TINY)
        return jnp.where(x < 0, -snapped, snapped)
    C = qp_ref[0, 0]
    gamma = qp_ref[0, 1]
    return power_qdq(x, C, gamma, levels)


def _make_cn_kernel(qc: QCGraph, spec: VariantSpec, row: int, L: int,
                    bt: int, dtype):
    """Fused check-node update for one base row.

    refs: v2c_row [dc, L, bt], beta [1, dc] (VMEM), thr [1, Lq], qp [1, 2]
    -> c2v_row [dc, L, bt]
    """
    blocks = qc.row_blocks[row]
    shifts = [int(qc.block_shift[b]) for b in blocks]
    dc = len(blocks)
    INF = float("inf")  # python literal: jnp scalars become captured consts

    def kernel(v2c_ref, beta_ref, alpha_ref, thr_ref, qp_ref, out_ref):
        # streaming two-pass: each pass re-reads + re-rolls one block at a
        # time so only ~5 [L, bt] f32 arrays are live (keeping all dc rolled
        # blocks materialized overflows VMEM at dc~37, L=256)
        def ca_k(k):
            return _roll(v2c_ref[k], -shifts[k]).astype(jnp.float32)

        # pass 1: running (min1, min2, argmin) + negative-count parity
        x0 = ca_k(0)
        min1 = jnp.abs(x0)
        min2 = jnp.full_like(min1, INF)
        argm = jnp.zeros(min1.shape, jnp.int32)
        neg_cnt = (x0 < 0).astype(jnp.int32)
        for k in range(1, dc):
            xk = ca_k(k)
            mk = jnp.abs(xk)
            new_min = mk < min1
            min2 = jnp.where(new_min, min1, jnp.minimum(min2, mk))
            min1 = jnp.where(new_min, mk, min1)
            argm = jnp.where(new_min, k, argm)
            neg_cnt = neg_cnt + (xk < 0).astype(jnp.int32)
        if dc == 1:
            min2 = min1
        # pass 2: leave-one-out outputs, transform, roll back
        for k in range(dc):
            xk = ca_k(k)
            loo_mag = jnp.where(argm == k, min2, min1)
            loo_neg = (neg_cnt - (xk < 0).astype(jnp.int32)) & 1
            loo_sign = 1.0 - 2.0 * loo_neg.astype(jnp.float32)
            bb = beta_ref[0, k]
            if spec.kind == "nms":
                out = bb * loo_sign * loo_mag
            elif spec.kind == "oms":
                off = jnp.maximum(loo_mag - bb, 0.0)
                if spec.alpha_in_cn:
                    off = off - alpha_ref[0, k]
                out = loo_sign * off
            elif spec.kind == "rcq":
                out = _kernel_qdq(loo_sign * loo_mag, thr_ref, qp_ref,
                                  spec.q_levels)
            elif spec.kind == "wrcq":
                out = _kernel_qdq(bb * loo_sign * loo_mag, thr_ref, qp_ref,
                                  spec.q_levels)
            else:  # orcq: W-OMS-RCQ (paper §VII-B)
                off = jnp.maximum(loo_mag - bb, 0.0)
                if spec.alpha_in_cn:
                    off = off - alpha_ref[0, k]
                out = _kernel_qdq(loo_sign * off, thr_ref, qp_ref,
                                  spec.q_levels)
            out_ref[k] = _roll(out.astype(dtype), shifts[k])

    return kernel, dc


def _make_vn_kernel(qc: QCGraph, spec: VariantSpec, col: int, L: int,
                    bt: int, dtype, with_vqdq: bool):
    """Fused variable-node update for one base column.

    refs: c2v_col [t, L, bt], llr [L, bt], alpha [1, t], vthr [1, Lv],
    vqp [1, 2] -> (v2c_col [t, L, bt], post [L, bt])
    """
    blocks = qc.col_blocks[col]
    t = len(blocks)

    def kernel(c2v_ref, llr_ref, alpha_ref, vthr_ref, vqp_ref,
               v2c_ref, post_ref):
        llr = llr_ref[...].astype(jnp.float32)
        c2v = [c2v_ref[k].astype(jnp.float32) for k in range(t)]
        colsum = c2v[0]
        for k in range(1, t):
            colsum = colsum + c2v[k]
        post = llr + colsum
        for k in range(t):
            ext = colsum - c2v[k]
            if spec.alpha_in_cn:
                nv = llr + ext
            else:
                nv = llr + alpha_ref[0, k] * ext
            if with_vqdq:
                nv = _kernel_qdq(nv, vthr_ref, vqp_ref, spec.v2c_levels)
            v2c_ref[k] = nv.astype(dtype)
        if with_vqdq:
            post = _kernel_qdq(post, vthr_ref, vqp_ref, spec.v2c_levels)
        post_ref[...] = post.astype(dtype)

    return kernel, t


def _row_call(qc, spec, row, v2c_rows, beta_b, alpha_b, thr, qp, L, bt,
              dtype, interpret):
    blocks = qc.row_blocks[row]
    kernel, dc = _make_cn_kernel(qc, spec, row, L, bt, dtype)
    B = v2c_rows.shape[-1]
    grid = (B // bt,)
    bspec3 = pl.BlockSpec((dc, L, bt), lambda j: (0, 0, j),
                          memory_space=pltpu.VMEM)
    small = lambda w: pl.BlockSpec((1, w), lambda j: (0, 0),
                                   memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec3, small(dc), small(dc), small(thr.shape[-1]),
                  small(2)],
        out_specs=bspec3,
        out_shape=jax.ShapeDtypeStruct((dc, L, B), dtype),
        interpret=interpret,
    )(v2c_rows, beta_b, alpha_b, thr, qp)


def _col_call(qc, spec, col, c2v_col, llr_col, alpha_b, vthr, vqp, L, bt,
              dtype, with_vqdq, interpret):
    kernel, t = _make_vn_kernel(qc, spec, col, L, bt, dtype, with_vqdq)
    B = c2v_col.shape[-1]
    grid = (B // bt,)
    bspec3 = pl.BlockSpec((t, L, bt), lambda j: (0, 0, j),
                          memory_space=pltpu.VMEM)
    bspec2 = pl.BlockSpec((L, bt), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    small = lambda w: pl.BlockSpec((1, w), lambda j: (0, 0),
                                   memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec3, bspec2, small(t), small(vthr.shape[-1]), small(2)],
        out_specs=(bspec3, bspec2),
        out_shape=(jax.ShapeDtypeStruct((t, L, B), dtype),
                   jax.ShapeDtypeStruct((L, B), dtype)),
        interpret=interpret,
    )(c2v_col, llr_col, alpha_b, vthr, vqp)


@partial(jax.jit, static_argnames=("qc", "spec", "max_iterations",
                                   "check_every", "dtype", "batch_tile",
                                   "interpret", "unroll"))
def qc_pallas_decode_batch(
    llr: jnp.ndarray,            # [B, n]
    weights,
    *,
    qc: QCGraph,
    spec: VariantSpec,
    max_iterations: int,
    check_every: int = 1,
    dtype=jnp.bfloat16,
    batch_tile: int = 128,
    interpret: bool = False,
    unroll: bool = False,
) -> DecodeResult:
    """Pallas-fused flooding QC decode (inference path).

    Contract matches ``qc_decode_batch`` with the same ``check_every``
    freezing granularity. ``batch_tile`` is the per-grid-step batch width
    (lanes); B must be divisible by it.
    """
    T = max_iterations
    if T % check_every:
        raise ValueError(f"check_every={check_every} must divide T={T}")
    Bsz = llr.shape[0]
    if Bsz % batch_tile:
        raise ValueError(f"batch {Bsz} not divisible by tile {batch_tile}")
    L = qc.lift
    NB = qc.num_blocks
    k = check_every

    llr_T = llr.T.astype(dtype).reshape(qc.nb, L, Bsz)
    v2c0 = jnp.stack([llr_T[int(c)] for c in qc.block_col])  # [NB, L, B]

    # static per-row / per-col index tables
    row_slices = []
    off = 0
    for i in range(qc.mb):
        dc = len(qc.row_blocks[i])
        row_slices.append((off, dc))
        off += dc
    col_idx = [np.asarray(qc.col_blocks[j], np.int32) for j in range(qc.nb)]
    with_vqdq = (spec.v2c_qparams is not None or
                 spec.v2c_thresholds is not None)

    def one_iteration(v2c, x):
        beta_b, alpha_b = _per_block_weights(spec, qc, x["beta"], x["alpha"])
        beta_v = (jnp.broadcast_to(beta_b, (NB,)) if jnp.ndim(beta_b) == 0
                  else beta_b).astype(jnp.float32)
        alpha_v = (jnp.broadcast_to(alpha_b, (NB,)) if jnp.ndim(alpha_b) == 0
                   else alpha_b).astype(jnp.float32)
        thr = x["thr"][None, :].astype(jnp.float32)
        qp = x["qp"][None, :].astype(jnp.float32)
        vthr = x["vthr"][None, :].astype(jnp.float32)
        vqp = x["vqp"][None, :].astype(jnp.float32)

        # CN: one fused kernel per base row (blocks are row-contiguous)
        c2v_rows = []
        for i in range(qc.mb):
            o, dc = row_slices[i]
            c2v_rows.append(_row_call(
                qc, spec, i, jax.lax.slice_in_dim(v2c, o, o + dc, axis=0),
                jax.lax.slice_in_dim(beta_v, o, o + dc)[None, :],
                jax.lax.slice_in_dim(alpha_v, o, o + dc)[None, :],
                thr, qp, L, batch_tile, dtype, interpret))
        c2v = jnp.concatenate(c2v_rows, axis=0)  # [NB, L, B] row-major

        # VN: one fused kernel per base column
        v2c_parts = [None] * NB
        posts = []
        for j in range(qc.nb):
            idx = col_idx[j]
            c2v_col = c2v[idx]  # leading-dim gather (block permutation)
            out_v2c, post = _col_call(
                qc, spec, j, c2v_col, llr_T[j],
                alpha_v[idx][None, :], vthr, vqp, L, batch_tile, dtype,
                with_vqdq, interpret)
            posts.append(post)
            for kk, b in enumerate(idx):
                v2c_parts[int(b)] = out_v2c[kk]
        v2c_new = jnp.stack(v2c_parts)  # back to row-major block order
        posterior = jnp.stack(posts)    # [nb, L, B]
        return v2c_new, posterior

    def syndrome_ok(bits_blocks):
        ok = jnp.ones((Bsz,), bool)
        for i in range(qc.mb):
            par = jnp.zeros((L, Bsz), jnp.int32)
            for b in qc.row_blocks[i]:
                par = par ^ jnp.roll(bits_blocks[int(qc.block_col[b])],
                                     -int(qc.block_shift[b]), axis=0)
            ok = ok & ~jnp.any(par > 0, axis=0)
        return ok

    xs = _scan_xs(spec, weights, T)
    if k > 1:
        xs = jax.tree_util.tree_map(
            lambda a: a.reshape((T // k, k) + a.shape[1:]), xs)

    carry0 = dict(v2c=v2c0, post=llr_T, done=jnp.zeros((Bsz,), bool),
                  iters=jnp.zeros((Bsz,), jnp.int32))

    def body(carry, xc):
        def inner(state, x):
            v2c, _ = state
            v2c, post = one_iteration(v2c, x)
            return (v2c, post), None

        xc_stacked = (xc if k > 1 else
                      jax.tree_util.tree_map(lambda a: a[None], xc))
        (v2c, post), _ = jax.lax.scan(
            inner, (carry["v2c"], carry["post"]), xc_stacked,
            unroll=k if unroll else 1)
        t_last = xc["t"] if k == 1 else xc["t"][-1]
        bits = (post < 0).astype(jnp.int32)
        ok = syndrome_ok(bits)
        done_prev = carry["done"]
        post_out = jnp.where(done_prev[None, None, :], carry["post"], post)
        iters = jnp.where(done_prev, carry["iters"], t_last + 1)
        return dict(v2c=v2c, post=post_out, done=done_prev | ok,
                    iters=iters), None

    carry, _ = jax.lax.scan(body, carry0, xs)
    post = carry["post"].reshape(qc.n, Bsz).T
    bits = (post < 0).astype(jnp.int32)
    return DecodeResult(bits=bits, posterior=post, iterations=carry["iters"],
                        success=carry["done"])
