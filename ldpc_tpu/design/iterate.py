"""Iterated ladder refinement with a stopping rule (paper §VI loop).

Round 3 established (RESULTS §31) that REPEATED coordinate-descent
passes of :func:`refine_ladders_protograph` keep paying on measured FER
(pass 1 9.7e-6 -> pass 2 5.3e-6 -> pass 3 2.3e-6 at 2.0 dB on the
precoded PBRL code), and the guide now recommends "refine first, train
only if a gap remains". That loop was driven by scratch scripts; this
module is the supported API: run refine passes until the DE threshold
(or an optional measured dev probe) stops improving, and return the full
ladder history so the caller can pick any pass.

Reference capability mapped: the W-RCQ paper's §VI quantizer design loop
(the reference repo approximates it with a fixed hand ladder,
``rcq_decoder.py:66-71``); this is the framework's design-time
replacement for hand tuning.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ldpc_tpu.design.proto_dde import (protograph_density_evolution,
                                       refine_ladders_protograph)

__all__ = ["RefinePass", "RefineHistory", "estimate_threshold",
           "iterate_refine"]


@dataclass
class RefinePass:
    """One entry in the refine history (pass 0 = the initial ladder)."""

    index: int
    cn: Tuple[Tuple[float, float], ...]
    v2c: Optional[Tuple[Tuple[float, float], ...]]
    threshold_db: float
    probe: Optional[float] = None

    def to_dict(self):
        return {"index": self.index,
                "cn": [list(p) for p in self.cn],
                "v2c": ([list(p) for p in self.v2c]
                        if self.v2c is not None else None),
                "threshold_db": self.threshold_db,
                "probe": self.probe}


@dataclass
class RefineHistory:
    """Full trajectory of :func:`iterate_refine`.

    ``best`` is the pass with the lowest ``probe`` value when a
    ``dev_probe`` was supplied (measured evidence wins), else the lowest
    DE threshold. ``stopped_by`` records which rule ended the loop:
    ``"threshold"`` (gain < min_gain_db), ``"probe"`` (dev probe got
    worse), ``"fixed_point"`` (a pass changed nothing), or
    ``"max_passes"``.
    """

    passes: List[RefinePass] = field(default_factory=list)
    stopped_by: str = "max_passes"

    @property
    def best(self) -> RefinePass:
        have_probe = [p for p in self.passes if p.probe is not None]
        if have_probe:
            return min(have_probe, key=lambda p: p.probe)
        return min(self.passes, key=lambda p: p.threshold_db)

    def to_dict(self):
        return {"passes": [p.to_dict() for p in self.passes],
                "stopped_by": self.stopped_by,
                "best_index": self.best.index}


def estimate_threshold(
    base: np.ndarray,
    quantizer_params,
    v2c_quantizer_params,
    *,
    bc: int,
    bv: Optional[int],
    max_iterations: int,
    schedule: str = "layered",
    punctured_cols: Sequence[int] = (),
    grid_step: float = 1.0 / 32.0,
    eps: float = 1e-7,
    snr_lo: float = -2.0,
    snr_hi: float = 12.0,
    coarse_step: float = 1.0,
    bisections: int = 7,
) -> float:
    """DE threshold of a fixed ladder with an ADAPTIVE bracket.

    :func:`refine_ladders_protograph` bisects inside ``snr_db +- 3`` —
    fine when the caller knows the operating point, wrong for a new
    rate/code. This scans ``[snr_lo, snr_hi]`` coarsely for the first
    converging SNR, then bisects. Returns ``snr_hi + 1`` if nothing in
    the range converges (caller should widen or fix the ladder).
    """
    kw = dict(schedule=schedule, max_iterations=max_iterations,
              kind="rcq", bc=bc,
              quantizer_params=tuple(tuple(p) for p in quantizer_params),
              bv=bv,
              v2c_quantizer_params=(
                  tuple(tuple(p) for p in v2c_quantizer_params)
                  if v2c_quantizer_params is not None else None),
              punctured_cols=tuple(punctured_cols), grid_step=grid_step)

    def fails(snr):
        return protograph_density_evolution(
            base, snr_db=snr, **kw).error_prob[-1] > eps

    hi = None
    s = snr_lo
    while s <= snr_hi + 1e-9:
        if not fails(s):
            hi = s
            break
        s += coarse_step
    if hi is None:
        return snr_hi + 1.0
    lo = hi - coarse_step
    for _ in range(bisections):
        mid = 0.5 * (lo + hi)
        if fails(mid):
            lo = mid
        else:
            hi = mid
    return float(hi)


def iterate_refine(
    base: np.ndarray,
    quantizer_params,
    v2c_quantizer_params,
    *,
    bc: int,
    bv: Optional[int],
    max_iterations: int,
    snr_db: Optional[float] = None,
    schedule: str = "layered",
    punctured_cols: Sequence[int] = (),
    max_passes: int = 6,
    min_gain_db: float = 0.01,
    dev_probe: Optional[Callable[[Tuple, Optional[Tuple]], float]] = None,
    grid_step: float = 1.0 / 32.0,
    sweep: Sequence[float] = (0.8, 0.9, 1.1, 1.25),
    eps: float = 1e-7,
    verbose: bool = False,
) -> RefineHistory:
    """Run :func:`refine_ladders_protograph` passes until they stop paying.

    Parameters beyond the single-pass refiner's:

    - ``snr_db``: design/bracket SNR. ``None`` auto-estimates the initial
      ladder's DE threshold (:func:`estimate_threshold`) and designs
      there — the round-3 protocol (design AT the threshold, RESULTS
      §31) without hand-picking the operating point per rate.
    - ``max_passes`` / ``min_gain_db``: threshold-based stopping — stop
      when a pass improves the DE threshold by less than ``min_gain_db``
      (or changes nothing: fixed point).
    - ``dev_probe``: optional ``f(cn, v2c) -> float`` (lower is better;
      typically a measured dev-FER). Evaluated on the initial ladder and
      after every pass; the loop stops when the probe degrades, and
      ``history.best`` switches from lowest-threshold to lowest-probe.
      This encodes the guide rule that DE-threshold descent can overfit
      (RESULTS §23 dynamic ladders): measured evidence overrides DE.

    Returns a :class:`RefineHistory`; ``history.best.cn`` /
    ``history.best.v2c`` feed straight into ``make_decoder``'s
    ``quantizer_params`` / ``v2c_quantizer_params``.
    """
    cn = tuple(tuple(p) for p in quantizer_params)
    v2c = (tuple(tuple(p) for p in v2c_quantizer_params)
           if v2c_quantizer_params is not None else None)
    common = dict(bc=bc, bv=bv, max_iterations=max_iterations,
                  schedule=schedule, punctured_cols=tuple(punctured_cols),
                  grid_step=grid_step, eps=eps)

    if snr_db is None:
        snr_db = estimate_threshold(base, cn, v2c, **common)
        if verbose:
            print(f"iterate_refine: auto design SNR = {snr_db:.3f} dB "
                  f"(initial-ladder DE threshold)", flush=True)

    # threshold of the initial ladder inside the refiner's bracket, so
    # pass-over-pass gains are measured on one consistent scale
    thr0 = estimate_threshold(base, cn, v2c, snr_lo=snr_db - 3.0,
                              snr_hi=snr_db + 3.0, coarse_step=6.0,
                              **common)
    hist = RefineHistory()
    p0 = RefinePass(0, cn, v2c, float(thr0))
    if dev_probe is not None:
        p0.probe = float(dev_probe(cn, v2c))
    hist.passes.append(p0)
    if verbose:
        print(f"pass 0: thr {thr0:.4f} dB probe {p0.probe}", flush=True)

    for i in range(1, max_passes + 1):
        prev = hist.passes[-1]
        cn_i, v2c_i, thr_i = refine_ladders_protograph(
            base, prev.cn, prev.v2c, snr_db=snr_db, sweep=sweep, **common)
        cur = RefinePass(i, cn_i, v2c_i, float(thr_i))
        if dev_probe is not None:
            cur.probe = float(dev_probe(cn_i, v2c_i))
        hist.passes.append(cur)
        if verbose:
            print(f"pass {i}: thr {thr_i:.4f} dB probe {cur.probe}",
                  flush=True)
        if cn_i == prev.cn and v2c_i == prev.v2c:
            hist.stopped_by = "fixed_point"
            break
        if (cur.probe is not None and prev.probe is not None
                and cur.probe > prev.probe):
            hist.stopped_by = "probe"
            break
        if prev.threshold_db - cur.threshold_db < min_gain_db:
            hist.stopped_by = "threshold"
            break
    return hist
