"""Whole-decode VMEM-resident Pallas kernel for QC codes.

The per-row/per-column kernels in ``pallas_qc.py`` cut launch count ~30x
but still round-trip the message state through HBM between every launch —
and profiling showed the XLA QC engine's decode time is dominated by
exactly that state movement (the v2c state for the bench code at B=8192
is ~775 MB in bf16; every CN/VN fusion re-streams it). This kernel keeps
the ENTIRE message state resident in VMEM for the full decode:

- grid = one step per batch tile of ``batch_tile`` codewords;
- per step: the tile's channel LLRs stream in (double-buffered by the
  BlockSpec machinery), the c2v/v2c state lives in a single
  ``[NB, batch_tile, lift]`` VMEM scratch for all ``T`` iterations, and
  only the final posterior streams out. HBM traffic collapses from
  O(state * iterations) to O(llr + posterior).

Layout: blocks are stored ``[batch_tile, lift]`` — batch on sublanes,
lift on LANES — so circulant shifts are lane rolls and a 64-codeword tile
still fills all 128 lanes when lift is a multiple of 128 (the natural QC
lifts: 256 for the paper's (9472, 8192) family, 360 for DVB-S2).

The state buffer is check-aligned and updated in place: the CN update
(running min1/min2/first-argmin tree, negative-count sign parity, variant
transform) reads and writes it roll-free row by row; the VN update
re-aligns per column with two lane rolls per block. Same message
arithmetic, in the same order, as ``qc_engine.cn_and_vn_row_batched`` /
``cn_and_vn`` — bit-exact in float32 (``tests/test_pallas_fused.py``).

Semantics: ``qc_decode_batch(..., check_every=max_iterations)`` — the
syndrome is evaluated once after the final iteration (by a cheap XLA
epilogue on the kernel's posterior output), so ``iterations`` is ``T``
for every frame and ``success`` is the final syndrome. That is the
configuration the headline bench and the simulator's compaction stage
use; finer check granularity stays on the XLA engine. Inference-only
(training uses the differentiable XLA engines). Reference behavioral
contract: SURVEY.md §2b (``ldpc_decoder.py:79-153``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_tpu.decode.engine import DecodeResult, VariantSpec
from ldpc_tpu.decode.qc_engine import QCGraph
from ldpc_tpu.quantizer import QDQ_SIGN_TINY, power_qdq, uniform_qdq

__all__ = ["qc_fused_decode_batch", "qc_fused_decode_batch_layered",
           "max_batch_tile"]

# v5e scoped VMEM is 16 MB/core. The kernel's footprint is the message
# state scratch + the double-buffered llr/posterior IO blocks, plus
# Mosaic's stack (min-tree f32 temporaries, roll concat buffers). The
# stack overhead depends on lane alignment: with lift % 128 == 0 the
# rolls stay register-resident and the bench graph (state+io 12.1 MB at
# batch_tile=64) compiles within the 16 MB budget (overhead <= ~1.3x);
# with an unaligned lift the compiler materializes padded intermediates —
# the DVB-S2 lift-360 graph measured 21.42 MB scoped at batch_tile=64
# (state+io 15.7 MB) and still 16.33 MB at batch_tile=40 (9.8 MB), so the
# unaligned factor is calibrated conservatively at 1.95.
_VMEM_LIMIT = 16 * 2 ** 20


def _fused_vmem_bytes(qc: QCGraph, bt: int, dtype, layered: bool) -> int:
    lanes = -(-qc.lift // 128) * 128  # lane dimension pads to 128
    item = jnp.dtype(dtype).itemsize
    state = (qc.num_blocks + (qc.nb if layered else 0)) * bt * lanes * item
    io = 4 * qc.nb * bt * lanes * item  # llr in + post out, double-buffered
    overhead = 1.31 if qc.lift % 128 == 0 else 1.95
    return int(overhead * (state + io))


def max_batch_tile(qc: QCGraph, *, layered: bool = True,
                   dtype=jnp.bfloat16, batch: int | None = None) -> int:
    """Largest ``batch_tile`` (multiple of 8, <=1024) whose whole-decode
    kernel fits v5e scoped VMEM; if ``batch`` is given, also a divisor of
    it. Pass ``batch_tile=None`` to the decode functions to apply this
    automatically (lift-360 codes need 32, the bench lift-256 graph 64)."""
    best = 8
    for cand in range(8, 1025, 8):
        if _fused_vmem_bytes(qc, cand, dtype, layered) > _VMEM_LIMIT:
            break
        if batch is None or batch % cand == 0:
            best = cand
    return best


def _roll_lanes(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """``jnp.roll(x, s, axis=-1)`` with a static shift: two contiguous
    lane slices + concat (the QC circulant permutation in [bt, L] layout)."""
    L = x.shape[-1]
    s = s % L
    if s == 0:
        return x
    return jnp.concatenate([x[..., L - s:], x[..., :L - s]], axis=-1)


def _qdq_mode(qparams, levels: int, closed: bool = False) -> str:
    """Mirror ``engine._make_qdq``'s static routing: 'uniform' (gamma==1
    closed form, no transcendentals), 'power', or 'staircase'.

    ``closed=True`` (the ``closed_qdq`` kernel option) forces the
    closed-form path for SMALL LUTs too, whenever (C, gamma) params are
    known. The exact unrolled staircase is ``levels-1`` compare+add pairs
    per qdq call, replicated across every block of every unrolled
    iteration — at bc>=5 (16 levels) Mosaic's compile time on the
    remote toolchain goes pathological (>35 min observed); the closed
    form is O(1) ops per call regardless of bc. Reconstruction matches
    the LUT scan's index exactly (power_qdq's boundary-correction
    selects) with <=1 ulp value rounding vs the float64-derived LUT."""
    if qparams is not None and (closed or levels > 16):
        if np.all(np.asarray(qparams)[:, 1] == 1.0):
            return "uniform"
        return "power"
    return "staircase"


def _kernel_qdq(x, t, thr_ref, qp_ref, levels: int, mode: str):
    """This iteration's quantize-dequantize, mirroring ``engine._make_qdq``:
    closed-form power law for big LUTs, exact staircase for small ones.
    ``t`` is the (traced) iteration index; threshold/param reads are SMEM
    scalars.

    Math runs in float32: widening bf16 input is value-exact, and Mosaic
    on v5e rejects bf16 vector compares ("Target does not support this
    comparison") that the power/staircase forms would otherwise emit."""
    x = x.astype(jnp.float32)
    if mode == "uniform":
        return uniform_qdq(x, qp_ref[t, 0], levels)
    if mode == "power":
        return power_qdq(x, qp_ref[t, 0], qp_ref[t, 1], levels)
    mag = jnp.abs(x)
    snapped = jnp.zeros_like(mag)
    for j in range(1, levels):
        step = thr_ref[t, j] - thr_ref[t, j - 1]
        snapped = snapped + jnp.where(mag >= thr_ref[t, j], step, 0.0)
    # sign-preserving dead-zone floor (quantizer.QDQ_SIGN_TINY semantics)
    snapped = jnp.maximum(snapped, QDQ_SIGN_TINY)
    return jnp.where(x < 0, -snapped, snapped)


def _accessors(natural: bool, L: int):
    """Read/write helpers over the llr/posterior refs for the two block
    layouts. Block layout indexes a [nb, bt, L] ref by base column;
    natural layout slices a [bt, n] ref at lane offset j*L (requires
    L % 128 == 0 so every slice is lane-tile-aligned — the case for the
    paper's lift-256 family; lift-360 codes stay on block layout)."""
    if natural:
        def rd(ref, j):
            return ref[:, j * L:(j + 1) * L]

        def wr(ref, j, v):
            ref[:, j * L:(j + 1) * L] = v
    else:
        def rd(ref, j):
            return ref[j]

        def wr(ref, j, v):
            ref[j] = v
    return rd, wr


def _syndrome_epilogue(post_ref, fail_ref, PAR, qc: QCGraph, bt: int, L,
                       dtype, rd):
    """In-kernel syndrome: parity of each base row as a product of
    check-aligned posterior signs, on VMEM-resident tiles (replaces the
    former XLA epilogue's HBM-resident jnp.roll XORs — ~38% of decode
    time by profiling). Signs come from the STORED (dtype-rounded)
    posterior so the result matches an XLA recomputation from post_ref
    exactly. Accumulation goes through the PAR/fail_ref refs rather than
    loop-carried values: Mosaic's scoped-VMEM stack does not recycle
    slots across unrolled iterations of a value chain (a value-carried
    version measured +6.7 MB and OOM'd), while ref stores end liveness
    each step. fail > 0 on a frame lane iff some check fails."""
    cols = [int(c) for c in qc.block_col]
    shifts = [int(s) for s in qc.block_shift]
    fail_ref[0] = jnp.zeros((bt, L), dtype)
    for blocks in qc.row_blocks:
        for k, b in enumerate(blocks):
            b = int(b)
            s = 1.0 - 2.0 * (rd(post_ref, cols[b]).astype(jnp.float32)
                             < 0).astype(jnp.float32)
            s = _roll_lanes(s, -shifts[b])
            PAR[...] = s if k == 0 else PAR[...] * s
        fail_ref[0] = jnp.maximum(
            fail_ref[0][...],
            (PAR[...] < 0).astype(jnp.float32).astype(dtype))


def _make_kernel(qc: QCGraph, spec: VariantSpec, T: int, bt: int, dtype,
                 natural: bool = False, closed_qdq: bool = False):
    NB = qc.num_blocks
    L = qc.lift
    shifts = [int(s) for s in qc.block_shift]
    cols = [int(c) for c in qc.block_col]
    row_blocks = [list(r) for r in qc.row_blocks]
    col_blocks = [list(c) for c in qc.col_blocks]
    INF = float("inf")
    rd, wr = _accessors(natural, L)

    q_mode = _qdq_mode(spec.qparams, spec.q_levels,
                       closed_qdq or spec.closed_qdq)
    with_vqdq = (spec.v2c_qparams is not None or
                 spec.v2c_thresholds is not None)
    v_mode = _qdq_mode(spec.v2c_qparams, spec.v2c_levels,
                       closed_qdq or spec.closed_qdq)

    def kernel(llr_ref, beta_ref, alpha_ref, thr_ref, qp_ref, vthr_ref,
               vqp_ref, post_ref, fail_ref, S, PAR):
        # init: check-aligned v2c = rolled channel LLRs (SURVEY §2b step 2)
        for b in range(NB):
            S[b] = _roll_lanes(rd(llr_ref, cols[b]), -shifts[b])

        def body(t, carry):
            # ---- check-node update, row by row, in place ----
            for blocks in row_blocks:
                dc = len(blocks)
                # pass 1: running (min1, min2, first-argmin) + sign parity
                x0 = S[blocks[0]][...].astype(jnp.float32)
                min1 = jnp.abs(x0)
                min2 = jnp.full_like(min1, INF)
                argm = jnp.zeros(min1.shape, jnp.int32)
                neg_cnt = (x0 < 0).astype(jnp.int32)
                for k in range(1, dc):
                    xk = S[blocks[k]][...].astype(jnp.float32)
                    mk = jnp.abs(xk)
                    new_min = mk < min1
                    min2 = jnp.where(new_min, min1, jnp.minimum(min2, mk))
                    min1 = jnp.where(new_min, mk, min1)
                    argm = jnp.where(new_min, k, argm)
                    neg_cnt = neg_cnt + (xk < 0).astype(jnp.int32)
                if dc == 1:
                    min2 = min1  # degree-1 checks (ldpc_decoder.py:112-115)
                # pass 2: leave-one-out + variant transform, write back
                for k in range(dc):
                    b = blocks[k]
                    xk = S[b][...].astype(jnp.float32)
                    loo_mag = jnp.where(argm == k, min2, min1)
                    loo_neg = (neg_cnt - (xk < 0).astype(jnp.int32)) & 1
                    loo_sign = 1.0 - 2.0 * loo_neg.astype(jnp.float32)
                    bb = beta_ref[t, b]
                    ab = alpha_ref[t, b]
                    if spec.kind == "nms":
                        out = bb * loo_sign * loo_mag
                    elif spec.kind == "oms":
                        off = jnp.maximum(loo_mag - bb, 0.0)
                        if spec.alpha_in_cn:
                            off = off - ab
                        out = loo_sign * off
                    elif spec.kind == "rcq":
                        out = _kernel_qdq(loo_sign * loo_mag, t, thr_ref,
                                          qp_ref, spec.q_levels, q_mode)
                    elif spec.kind == "wrcq":
                        out = _kernel_qdq(bb * loo_sign * loo_mag, t,
                                          thr_ref, qp_ref, spec.q_levels,
                                          q_mode)
                    else:  # orcq: W-OMS-RCQ (paper §VII-B)
                        off = jnp.maximum(loo_mag - bb, 0.0)
                        if spec.alpha_in_cn:
                            off = off - ab
                        out = _kernel_qdq(loo_sign * off, t, thr_ref,
                                          qp_ref, spec.q_levels, q_mode)
                    S[b] = out.astype(dtype)

            # ---- variable-node update, column by column, in place ----
            # arithmetic runs in the storage dtype in the same order as
            # qc_engine.cn_and_vn (colsum over the column's blocks in
            # order) so the two paths agree bit-for-bit in float32
            for j, blocks in enumerate(col_blocks):
                ca = [_roll_lanes(S[b][...], shifts[b]) for b in blocks]
                colsum = ca[0]
                for k in range(1, len(blocks)):
                    colsum = colsum + ca[k]
                llr_j = rd(llr_ref, j)
                for k, b in enumerate(blocks):
                    ext = colsum - ca[k]
                    if spec.alpha_in_cn:
                        nv = llr_j + ext
                    else:
                        ab = alpha_ref[t, b]
                        nv = llr_j + ab * ext
                    if with_vqdq:
                        nv = _kernel_qdq(nv, t, vthr_ref, vqp_ref,
                                         spec.v2c_levels, v_mode)
                    S[b] = _roll_lanes(nv.astype(dtype), -shifts[b])

                # the posterior is only observed after the final iteration
                # (check-at-the-end contract) — skip the qdq+store earlier
                @pl.when(t == T - 1)
                def _store_post(j=j, llr_j=llr_j, colsum=colsum):
                    post = llr_j + colsum
                    if with_vqdq:
                        post = _kernel_qdq(post, t, vthr_ref, vqp_ref,
                                           spec.v2c_levels, v_mode)
                    wr(post_ref, j, post.astype(dtype))
            return carry

        jax.lax.fori_loop(0, T, body, 0)
        _syndrome_epilogue(post_ref, fail_ref, PAR, qc, bt, L, dtype, rd)

    return kernel


def _pad_batch(llr, bt):
    """Pad the batch up to a multiple of the tile with zero-LLR frames
    (decoded as garbage, sliced away by ``_result_epilogue``) so callers
    can pass ANY batch size to the fused kernels."""
    B = llr.shape[0]
    pad = (-B) % bt
    if pad:
        llr = jnp.concatenate(
            [llr, jnp.zeros((pad, llr.shape[1]), llr.dtype)], axis=0)
    return llr, B


def _result_epilogue(post_out, fail, Bsz, n, T, lean, natural, true_B):
    """Shared XLA epilogue over the kernel's posterior/fail outputs.

    ``natural=True`` means the kernel already wrote the posterior in
    [B, n] layout (lane-aligned lifts take this path) — no XLA transpose
    at all; otherwise ``post_out`` is the [nb, B, L] block layout and is
    transposed here. ``lean=False``: the full :class:`DecodeResult`
    contract — [B, n] posterior (bf16) and int32 bits. ``lean=True``: the
    decode-rate path — bits only, as int8 straight off the sign compare,
    ``posterior=None``. At B=8192 on the bench code the full epilogue
    writes ~465 MB of HBM (posterior + int32 bits) against the lean
    path's ~78 MB; the simulator and the headline bench only ever consume
    bits/success/iterations."""
    ok = ~jnp.any(fail[0] > 0, axis=-1)  # in-kernel syndrome
    iters = jnp.full((true_B,), T, jnp.int32)
    if natural:
        post = post_out                                   # already [B, n]
    else:
        post = post_out.transpose(1, 0, 2).reshape(Bsz, n)
    if true_B != Bsz:  # drop the zero-LLR padding frames
        post = post[:true_B]
        ok = ok[:true_B]
    if lean:
        bits = (post < 0).astype(jnp.int8)
        return DecodeResult(bits=bits, posterior=None,
                            iterations=iters, success=ok)
    bits = (post < 0).astype(jnp.int32)
    return DecodeResult(bits=bits, posterior=post, iterations=iters,
                        success=ok)


@partial(jax.jit, static_argnames=("qc", "spec", "max_iterations", "dtype",
                                   "batch_tile", "interpret", "lean",
                                   "natural", "closed_qdq"))
def qc_fused_decode_batch(
    llr: jnp.ndarray,            # [B, n]
    weights,                     # {'beta': [T, n_beta], 'alpha': [T, n_alpha]}
    *,
    qc: QCGraph,
    spec: VariantSpec,
    max_iterations: int,
    dtype=jnp.bfloat16,
    batch_tile: int | None = 64,
    interpret: bool = False,
    lean: bool = False,
    natural: bool | None = None,
    closed_qdq: bool = False,
) -> DecodeResult:
    """Flooding QC decode in ONE whole-decode Pallas kernel.

    Contract == ``qc_decode_batch(..., check_every=max_iterations)``:
    bits/posterior from the final iteration, ``success`` = final syndrome,
    ``iterations`` = T for every frame. ``batch_tile`` codewords are
    decoded per grid step with the full message state VMEM-resident;
    batches that do not divide are zero-padded up and sliced back. ``lean=True`` skips the [B, n] posterior
    materialization and returns int8 bits (see ``_result_epilogue``).
    ``natural=True`` (requires ``lift % 128 == 0``) streams llr/posterior in
    their [B, n] layout — no XLA-side layout transposes at either end.
    """
    T = max_iterations
    true_B, n = llr.shape
    if batch_tile is None:
        # cap the auto tile at the (8-rounded) batch: a 8-frame call must
        # not pad up to the max VMEM-fitting tile and decode garbage
        batch_tile = min(max_batch_tile(qc, layered=False, dtype=dtype),
                         -(-true_B // 8) * 8)
    llr, true_B = _pad_batch(llr, batch_tile)
    Bsz = llr.shape[0]
    L = qc.lift
    NB = qc.num_blocks
    bt = batch_tile
    est = _fused_vmem_bytes(qc, bt, dtype, layered=False)
    if est > _VMEM_LIMIT:
        raise ValueError(
            f"estimated kernel VMEM {est / 2**20:.1f} MB for "
            f"batch_tile={bt} exceeds the 16 MB scoped budget; use "
            f"batch_tile<={max_batch_tile(qc, layered=False, dtype=dtype)} "
            f"(or batch_tile=None to auto-pick)")

    if natural is None:
        # AUTO since measured on-chip (2026-08-19, experiments/
        # lean_ab_results.json): bit-exact vs the block layout on 16384
        # frames and ~16% faster end-to-end (575.6k vs 495.8k cw/s with
        # the lean epilogue) — the [nb, B, L] transposes it removes were
        # pure overhead. Falls back to the block layout when the lift
        # does not fill the 128 lanes.
        natural = L % 128 == 0
    if natural and L % 128:
        raise ValueError(f"natural layout needs lift % 128 == 0, got {L}")
    if natural:
        llr_in = llr.astype(dtype)          # [B, n], no layout change
    else:
        # [nb, B, L]: per-base-column tiles, batch on sublanes, lift lanes
        llr_in = llr.astype(dtype).reshape(Bsz, qc.nb, L).transpose(1, 0, 2)

    # per-(iteration, block) weight tables for SMEM scalar reads
    if spec.beta_idx is not None:
        beta_tab = weights["beta"][:, jnp.asarray(spec.beta_idx)]
    else:
        beta_tab = jnp.full((T, NB), spec.fixed_beta, jnp.float32)
    if spec.alpha_idx is not None:
        alpha_tab = weights["alpha"][:, jnp.asarray(spec.alpha_idx)]
    else:
        alpha_tab = jnp.full((T, NB), spec.fixed_alpha, jnp.float32)

    def tab(a, w):
        return (jnp.asarray(a, jnp.float32) if a is not None
                else jnp.zeros((T, w), jnp.float32))

    thr = tab(spec.thresholds, 1)
    qp = tab(spec.qparams, 2)
    vthr = tab(spec.v2c_thresholds, 1)
    vqp = tab(spec.v2c_qparams, 2)

    kernel = _make_kernel(qc, spec, T, bt, dtype, natural, closed_qdq)
    grid = (Bsz // bt,)
    if natural:
        blk = pl.BlockSpec((bt, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        post_shape = jax.ShapeDtypeStruct((Bsz, n), dtype)
    else:
        blk = pl.BlockSpec((qc.nb, bt, L), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
        post_shape = jax.ShapeDtypeStruct((qc.nb, Bsz, L), dtype)
    fail_blk = pl.BlockSpec((1, bt, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
    post_out, fail = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk, smem(beta_tab), smem(alpha_tab), smem(thr),
                  smem(qp), smem(vthr), smem(vqp)],
        out_specs=[blk, fail_blk],
        out_shape=[post_shape,
                   jax.ShapeDtypeStruct((1, Bsz, L), dtype)],
        scratch_shapes=[pltpu.VMEM((NB, bt, L), dtype),
                        pltpu.VMEM((bt, L), jnp.float32)],
        interpret=interpret,
    )(llr_in, beta_tab.astype(jnp.float32),
      alpha_tab.astype(jnp.float32), thr, qp, vthr, vqp)

    return _result_epilogue(post_out, fail, Bsz, n, T, lean, natural,
                            true_B)


def _make_layered_kernel(qc: QCGraph, spec: VariantSpec, T: int, bt: int,
                         dtype, natural: bool = False,
                         closed_qdq: bool = False):
    NB = qc.num_blocks
    L = qc.lift
    shifts = [int(s) for s in qc.block_shift]
    cols = [int(c) for c in qc.block_col]
    row_blocks = [list(r) for r in qc.row_blocks]
    INF = float("inf")
    rd, wr = _accessors(natural, L)

    q_mode = _qdq_mode(spec.qparams, spec.q_levels,
                       closed_qdq or spec.closed_qdq)
    with_vqdq = (spec.v2c_qparams is not None or
                 spec.v2c_thresholds is not None)
    v_mode = _qdq_mode(spec.v2c_qparams, spec.v2c_levels,
                       closed_qdq or spec.closed_qdq)

    def kernel(llr_ref, beta_ref, alpha_ref, thr_ref, qp_ref, vthr_ref,
               vqp_ref, post_ref, fail_ref, C, colsum, PAR):
        # layered state: per-block c2v memory (VAR-aligned, like
        # qc_engine.qc_decode_batch_layered) + per-column running sum
        for b in range(NB):
            C[b] = jnp.zeros((bt, L), dtype)
        for j in range(qc.nb):
            colsum[j] = jnp.zeros((bt, L), dtype)

        def body(t, carry):
            for blocks in row_blocks:
                dc = len(blocks)

                # pass 1: fresh check-aligned v2c per block (from the
                # CURRENT posterior state — layered semantics) feeds the
                # running (min1, min2, first-argmin) + sign parity. Pass 2
                # re-needs only each block's SIGN, so pass 1 stashes it
                # IN PLACE of the old c2v: the old c2v is subtracted from
                # colsum here (each base-row column appears once per row,
                # so later blocks of this row are unaffected) and C[b]
                # holds sign_k (+-1) until pass 2 overwrites it with the
                # new c2v. No extra VMEM, and the ~7-op ca_k recompute per
                # block (~20% of the iteration) is gone.
                min1 = min2 = argm = neg_cnt = None
                for k in range(dc):
                    b = blocks[k]
                    j = cols[b]
                    old = C[b][...]
                    ext = colsum[j][...] - old
                    if spec.alpha_in_cn:
                        nv = rd(llr_ref, j) + ext
                    else:
                        ab = alpha_ref[t, b]
                        nv = rd(llr_ref, j) + ab * ext
                    xk = _roll_lanes(nv.astype(jnp.float32), -shifts[b])
                    colsum[j] = ext.astype(dtype)  # old c2v removed
                    negk = (xk < 0).astype(jnp.int32)
                    C[b] = (1.0 - 2.0 * negk.astype(jnp.float32)
                            ).astype(dtype)        # stash sign_k
                    mk = jnp.abs(xk)
                    if k == 0:
                        min1 = mk
                        min2 = jnp.full_like(min1, INF)
                        argm = jnp.zeros(min1.shape, jnp.int32)
                        neg_cnt = negk
                    else:
                        new_min = mk < min1
                        min2 = jnp.where(new_min, min1,
                                         jnp.minimum(min2, mk))
                        min1 = jnp.where(new_min, mk, min1)
                        argm = jnp.where(new_min, k, argm)
                        neg_cnt = neg_cnt + negk
                if dc == 1:
                    min2 = min1
                # sign parity of the whole row; leave-one-out divides by
                # (= multiplies by) the left-out block's stashed sign
                row_sign = 1.0 - 2.0 * (neg_cnt & 1).astype(jnp.float32)
                for k in range(dc):
                    b = blocks[k]
                    loo_mag = jnp.where(argm == k, min2, min1)
                    loo_sign = row_sign * C[b][...].astype(jnp.float32)
                    bb = beta_ref[t, b]
                    ab = alpha_ref[t, b]
                    if spec.kind == "nms":
                        out = bb * loo_sign * loo_mag
                    elif spec.kind == "oms":
                        off = jnp.maximum(loo_mag - bb, 0.0)
                        if spec.alpha_in_cn:
                            off = off - ab
                        out = loo_sign * off
                    elif spec.kind == "rcq":
                        out = _kernel_qdq(loo_sign * loo_mag, t, thr_ref,
                                          qp_ref, spec.q_levels, q_mode)
                    elif spec.kind == "wrcq":
                        out = _kernel_qdq(bb * loo_sign * loo_mag, t,
                                          thr_ref, qp_ref, spec.q_levels,
                                          q_mode)
                    else:  # orcq: W-OMS-RCQ (paper §VII-B)
                        off = jnp.maximum(loo_mag - bb, 0.0)
                        if spec.alpha_in_cn:
                            off = off - ab
                        out = _kernel_qdq(loo_sign * off, t, thr_ref,
                                          qp_ref, spec.q_levels, q_mode)
                    new = _roll_lanes(out, shifts[b]).astype(dtype)
                    j = cols[b]
                    colsum[j] = colsum[j][...] + new  # old removed in pass 1
                    C[b] = new
            return carry

        jax.lax.fori_loop(0, T, body, 0)

        # final posterior epilogue (bv quantization applies here, as in
        # qc_decode_batch_layered). The per-iteration posteriors are never
        # observed under the check-at-the-end contract, so only iteration
        # T's is materialized.
        for j in range(qc.nb):
            post = rd(llr_ref, j) + colsum[j][...]
            if with_vqdq:
                post = _kernel_qdq(post, T - 1, vthr_ref, vqp_ref,
                                   spec.v2c_levels, v_mode)
            wr(post_ref, j, post.astype(dtype))

        _syndrome_epilogue(post_ref, fail_ref, PAR, qc, bt, L, dtype, rd)

    return kernel


@partial(jax.jit, static_argnames=("qc", "spec", "max_iterations", "dtype",
                                   "batch_tile", "interpret", "lean",
                                   "natural", "closed_qdq"))
def qc_fused_decode_batch_layered(
    llr: jnp.ndarray,            # [B, n]
    weights,
    *,
    qc: QCGraph,
    spec: VariantSpec,
    max_iterations: int,
    dtype=jnp.bfloat16,
    batch_tile: int | None = 64,
    interpret: bool = False,
    lean: bool = False,
    natural: bool | None = None,
    closed_qdq: bool = False,
) -> DecodeResult:
    """Layered-schedule whole-decode Pallas kernel.

    Same layered semantics as ``qc_decode_batch_layered`` (persistent
    per-block c2v memory, incrementally-maintained column sums, fresh v2c
    from the current posterior state row by row — the schedule the paper's
    FPGA uses, §VII-B), with the fused kernel's check-at-the-end contract:
    the returned posterior is iteration T's, ``success`` is its syndrome,
    ``iterations`` is T for every frame. Layered converges in roughly
    0.5-0.6x the flooding iterations at equal FER, so a T=6 layered decode
    replaces a T=10 flooding one.
    """
    T = max_iterations
    true_B, n = llr.shape
    if batch_tile is None:
        # cap the auto tile at the (8-rounded) batch: a 8-frame call must
        # not pad up to the max VMEM-fitting tile and decode garbage
        batch_tile = min(max_batch_tile(qc, layered=True, dtype=dtype),
                         -(-true_B // 8) * 8)
    llr, true_B = _pad_batch(llr, batch_tile)
    Bsz = llr.shape[0]
    L = qc.lift
    NB = qc.num_blocks
    bt = batch_tile
    est = _fused_vmem_bytes(qc, bt, dtype, layered=True)
    if est > _VMEM_LIMIT:
        raise ValueError(
            f"estimated kernel VMEM {est / 2**20:.1f} MB for "
            f"batch_tile={bt} exceeds the 16 MB scoped budget; use "
            f"batch_tile<={max_batch_tile(qc, layered=True, dtype=dtype)} "
            f"(or batch_tile=None to auto-pick)")

    if natural is None:
        # AUTO since measured on-chip (2026-08-19, experiments/
        # lean_ab_results.json): bit-exact vs the block layout on 16384
        # frames and ~16% faster end-to-end (575.6k vs 495.8k cw/s with
        # the lean epilogue) — the [nb, B, L] transposes it removes were
        # pure overhead. Falls back to the block layout when the lift
        # does not fill the 128 lanes.
        natural = L % 128 == 0
    if natural and L % 128:
        raise ValueError(f"natural layout needs lift % 128 == 0, got {L}")
    if natural:
        llr_in = llr.astype(dtype)
    else:
        llr_in = llr.astype(dtype).reshape(Bsz, qc.nb, L).transpose(1, 0, 2)

    if spec.beta_idx is not None:
        beta_tab = weights["beta"][:, jnp.asarray(spec.beta_idx)]
    else:
        beta_tab = jnp.full((T, NB), spec.fixed_beta, jnp.float32)
    if spec.alpha_idx is not None:
        alpha_tab = weights["alpha"][:, jnp.asarray(spec.alpha_idx)]
    else:
        alpha_tab = jnp.full((T, NB), spec.fixed_alpha, jnp.float32)

    def tab(a, w):
        return (jnp.asarray(a, jnp.float32) if a is not None
                else jnp.zeros((T, w), jnp.float32))

    thr, qp = tab(spec.thresholds, 1), tab(spec.qparams, 2)
    vthr, vqp = tab(spec.v2c_thresholds, 1), tab(spec.v2c_qparams, 2)

    kernel = _make_layered_kernel(qc, spec, T, bt, dtype, natural,
                                  closed_qdq)
    if natural:
        blk = pl.BlockSpec((bt, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        post_shape = jax.ShapeDtypeStruct((Bsz, n), dtype)
    else:
        blk = pl.BlockSpec((qc.nb, bt, L), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
        post_shape = jax.ShapeDtypeStruct((qc.nb, Bsz, L), dtype)
    fail_blk = pl.BlockSpec((1, bt, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
    post_out, fail = pl.pallas_call(
        kernel,
        grid=(Bsz // bt,),
        in_specs=[blk, smem(beta_tab), smem(alpha_tab), smem(thr),
                  smem(qp), smem(vthr), smem(vqp)],
        out_specs=[blk, fail_blk],
        out_shape=[post_shape,
                   jax.ShapeDtypeStruct((1, Bsz, L), dtype)],
        scratch_shapes=[pltpu.VMEM((NB, bt, L), dtype),
                        pltpu.VMEM((qc.nb, bt, L), dtype),
                        pltpu.VMEM((bt, L), jnp.float32)],
        interpret=interpret,
    )(llr_in, beta_tab.astype(jnp.float32),
      alpha_tab.astype(jnp.float32), thr, qp, vthr, vqp)

    return _result_epilogue(post_out, fail, Bsz, n, T, lean, natural,
                            true_B)
