"""Protograph (multi-edge-type) density evolution, layered-aware.

``dde.density_evolution`` models the unstructured ensemble of a degree
profile under FLOODING — good for fast ladder ranking, but the shipped
bench decoder is a *protograph* code decoded with the *layered* schedule
(qc_engine.qc_decode_batch_layered / pallas_fused layered kernel). This
module tracks one message density PER PROTOGRAPH EDGE, so it captures:

- the exact base-matrix structure (degree assignments per edge, not an
  averaged mixture) — lifting to any circulant size leaves protograph DE
  unchanged (cycles excepted, as always for DE);
- PUNCTURED columns (PBRL rate-compatible codes transmit the degree-1 IR
  bits but puncture the high-degree precode bits — ``codes.py``
  ``create_pbrl_qc_protograph``): a punctured column's channel pmf is a
  delta at LLR 0;
- the LAYERED schedule exactly: rows are processed in order within an
  iteration, each row's fresh v2c densities formed from the CURRENT
  c2v state of the other rows (mirroring ``qc_engine.py``'s persistent
  c2v memory + incremental column sums; v2c is NOT bv-quantized
  mid-iteration — only the posterior is, matching the engines).

All pmf machinery (grid, tie-aware min/sign combine, sparse/FFT signed
convolution, snap-down qdq index maps) is shared with ``dde``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

from ldpc_tpu.quantizer import phase_schedule, power_thresholds

from ldpc_tpu.design.dde import (
    DEResult,
    _cn_combine,
    _cn_transform_index_map,
    _conv_signed,
    _qdq_index_map,
    _quantile_mag,
    _remap_mag,
    _signed,
    _unsigned,
)

__all__ = ["protograph_density_evolution"]


def _loo_folds(pmfs):
    """Leave-one-out (sign, min)-folds of a list of magnitude pmfs via
    prefix/suffix combines: out[k] = fold of all pmfs except k."""
    d = len(pmfs)
    if d == 1:
        # degree-1 check reflects the input (engine min2=min1 behavior)
        return [pmfs[0]]
    pre = [None] * d
    suf = [None] * d
    pre[0] = pmfs[0]
    for k in range(1, d):
        pre[k] = _cn_combine(*pre[k - 1], *pmfs[k])
    suf[d - 1] = pmfs[d - 1]
    for k in range(d - 2, -1, -1):
        suf[k] = _cn_combine(*pmfs[k], *suf[k + 1])
    out = [None] * d
    out[0] = suf[1]
    out[d - 1] = pre[d - 2]
    for k in range(1, d - 1):
        out[k] = _cn_combine(*pre[k - 1], *suf[k + 1])
    return out


def protograph_density_evolution(
    base: np.ndarray,
    *,
    snr_db: float,
    max_iterations: int,
    kind: str = "rcq",
    beta: float = 0.0,
    alpha: float = 1.0,
    bc: Optional[int] = None,
    quantizer_params: Optional[Sequence[Tuple[float, float]]] = None,
    bv: Optional[int] = None,
    v2c_quantizer_params: Optional[Sequence[Tuple[float, float]]] = None,
    schedule: str = "layered",
    punctured_cols: Sequence[int] = (),
    grid_step: float = 1.0 / 64.0,
    grid_max: Optional[float] = None,
    quantile: float = 0.995,
) -> DEResult:
    """Per-edge DE on a protograph ``base`` (entries < 0 = empty block).

    ``schedule``: 'flooding' or 'layered' (base rows in order — the
    engines' layer order). ``punctured_cols``: base columns transmitted
    with no channel observation (LLR 0). ``error_prob[t]`` averages the
    posterior bit-error over ALL base columns (punctured included — they
    are decoded bits), matching the engines' bit counting.
    """
    base = np.asarray(base)
    mb, nb = base.shape
    T = max_iterations
    sigma2 = 10.0 ** (-snr_db / 10.0)
    mu = 2.0 / sigma2
    sd = 2.0 / math.sqrt(sigma2)

    edges = [(r, c) for r in range(mb) for c in range(nb) if base[r, c] >= 0]
    eidx = {e: i for i, e in enumerate(edges)}
    row_edges = [[eidx[(r, c)] for c in range(nb) if base[r, c] >= 0]
                 for r in range(mb)]
    col_edges = [[eidx[(r, c)] for r in range(mb) if base[r, c] >= 0]
                 for c in range(nb)]
    for c, es in enumerate(col_edges):
        if not es:
            raise ValueError(f"base column {c} has no checks")
    punct = set(int(c) for c in punctured_cols)

    def sched_luts(params, bits):
        if params is None or bits is None:
            return None
        s = phase_schedule(T, len(params))
        return [power_thresholds(bits, *params[p]) for p in s]

    c_luts = sched_luts(quantizer_params, bc) if kind in (
        "rcq", "wrcq", "orcq") else None
    v_luts = sched_luts(v2c_quantizer_params, bv)

    if grid_max is None:
        if c_luts is not None:
            reach = max(float(l[-1]) for l in c_luts)
        else:
            reach = (mu + 8 * sd) * max(beta, 1.0)
        dv_max = max(len(es) for es in col_edges)
        grid_max = mu + 8.0 * sd + dv_max * reach
    K = int(math.ceil(grid_max / grid_step)) + 1
    values = np.arange(K) * grid_step

    from math import erf

    def phi(x):
        return 0.5 * (1.0 + erf(x / math.sqrt(2.0)))

    edges_grid = (np.arange(-(K - 1), K + 1) - 0.5) * grid_step
    cdf = np.array([phi((e - mu) / sd) for e in edges_grid])
    chan = np.diff(cdf)
    chan[0] += cdf[0]
    chan[-1] += 1.0 - cdf[-1]
    zero = np.zeros(2 * K - 1)
    zero[K - 1] = 1.0
    chan_col = [zero if c in punct else chan for c in range(nb)]

    def alpha_scale(full):
        if alpha == 1.0:
            return full
        p, n_ = _unsigned(full, K)
        amap = np.clip(np.round(values * alpha / grid_step), 0,
                       K - 1).astype(np.int64)
        p, n_ = _remap_mag(p, n_, amap)
        return _signed(p, n_)

    def renorm(full):
        return full / full.sum()

    # state: per-edge signed pmfs. flooding tracks v2c; layered tracks
    # c2v (init delta at 0, the engines' zero message memory)
    if schedule == "flooding":
        v2c = [chan_col[c].copy() for (r, c) in edges]
    elif schedule == "layered":
        c2v = [zero.copy() for _ in edges]
    else:
        raise ValueError(f"unknown schedule {schedule!r}")

    err = np.zeros(T)
    cn_q = np.zeros(T)
    vn_q = np.zeros(T)

    for t in range(T):
        tmap = _cn_transform_index_map(
            values, K, grid_step, kind, beta,
            c_luts[t] if c_luts is not None else None)
        v_map = (_qdq_index_map(values, v_luts[t], grid_step, K)
                 if v_luts is not None else None)
        pre_p = np.zeros(K)
        pre_n = np.zeros(K)
        pre_vp = np.zeros(K)
        pre_vn = np.zeros(K)

        if schedule == "flooding":
            c2v = [None] * len(edges)
            for r in range(mb):
                mags = [_unsigned(v2c[e], K) for e in row_edges[r]]
                loo = _loo_folds(mags)
                for k, e in enumerate(row_edges[r]):
                    lp, ln = loo[k]
                    pre_p += lp
                    pre_n += ln
                    qp2, qn2 = _remap_mag(lp, ln, tmap)
                    c2v[e] = _signed(qp2, qn2)
            new_v2c = [None] * len(edges)
            for c in range(nb):
                es = col_edges[c]
                for k, e in enumerate(es):
                    s = zero
                    for k2, e2 in enumerate(es):
                        if k2 != k:
                            s = _conv_signed(s, c2v[e2], K)
                    pre = _conv_signed(alpha_scale(s), chan_col[c], K)
                    pp, pn = _unsigned(pre, K)
                    pre_vp += pp
                    pre_vn += pn
                    if v_map is not None:
                        pp, pn = _remap_mag(pp, pn, v_map)
                    new_v2c[e] = renorm(_signed(pp, pn))
            v2c = new_v2c
        else:  # layered: rows in order, fresh v2c from current state
            for r in range(mb):
                row_v2c = []
                for e in row_edges[r]:
                    c = edges[e][1]
                    s = zero
                    for e2 in col_edges[c]:
                        if e2 != e:
                            s = _conv_signed(s, c2v[e2], K)
                    pre = _conv_signed(alpha_scale(s), chan_col[c], K)
                    pp, pn = _unsigned(renorm(pre), K)
                    pre_vp += pp
                    pre_vn += pn
                    row_v2c.append((pp, pn))
                loo = _loo_folds(row_v2c)
                for k, e in enumerate(row_edges[r]):
                    lp, ln = loo[k]
                    pre_p += lp
                    pre_n += ln
                    qp2, qn2 = _remap_mag(lp, ln, tmap)
                    c2v[e] = renorm(_signed(qp2, qn2))

        cn_q[t] = _quantile_mag(pre_p / len(edges), pre_n / len(edges),
                                values, quantile)
        vn_q[t] = _quantile_mag(pre_vp / len(edges), pre_vn / len(edges),
                                values, quantile)

        # posterior error per column (bit = engine's posterior < 0 after
        # the bv qdq: snap-down keeps sign, so error mass is the strictly
        # sub(-tau1) tail when bv is active)
        e_sum = 0.0
        # bit error iff qdq_v(post) < 0 iff post <= -tau1 (snap-down maps
        # |post| < tau1 to +-0, and the engine decides bit = post < 0
        # with -0.0 < 0 false); without bv it is simply post < 0
        if v_map is not None and len(v_luts[t]) > 1:
            tau1 = float(v_luts[t][1])
            neg_cut = int(math.floor((K - 1) - tau1 / grid_step + 1e-9)) + 1
        else:
            neg_cut = K - 1  # strictly negative values
        for c in range(nb):
            s = zero
            for e2 in col_edges[c]:
                s = _conv_signed(s, c2v[e2], K)
            post = _conv_signed(alpha_scale(s), chan_col[c], K)
            post = post / post.sum()
            e_sum += post[:neg_cut].sum()
        err[t] = e_sum / nb

    return DEResult(error_prob=err, cn_pre_q=cn_q, vn_pre_q=vn_q,
                    quantile=quantile)
