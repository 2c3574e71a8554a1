"""Mean-shift importance sampling for error-floor estimation.

Plain Monte-Carlo needs ~100/FER frames per point — 1e10 frames at a
1e-8 floor. The floor, though, is dominated by a handful of small
trapping-set classes (``design.trapping_sets``), and the failure events
that matter live in a known corner of noise space: the channel pushing
exactly those variables toward the wrong symbol. Mean-translation
importance sampling samples THERE and reweights:

- transmit the all-zero codeword (BPSK +1, the simulator's convention);
- bias the noise mean by ``-shift`` on the target set's variables
  (toward the decision boundary);
- weight each frame by the Gaussian likelihood ratio
  ``w = exp((2 d.n - |d|^2) / (2 sigma^2))`` (``d`` the shift vector,
  ``n`` the drawn noise), which makes the estimator exactly unbiased
  for the original channel: ``E_biased[1{event} w] = P_unbiased[event]``.

Per trapping-set class, the floor contribution is
``multiplicity x P[decoder fails localized on the set]``; circulant
(QC) orbits share one probability by symmetry, so one exemplar per
class suffices. Summing classes gives a union-bound-style floor
estimate — the standard semi-analytic method (Richardson, "Error
floors of LDPC codes", Allerton 2003) the reference has no counterpart
for.

Exactness anchors (tests/test_importance.py): with ``shift=0`` the
weights are identically 1 (plain MC); the IS estimate of the analytic
event ``P[r_i < 0 for i in S] = Q(1/sigma)^|S|`` matches the closed
form; decoder-level IS matches plain MC at an SNR where both resolve.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["biased_awgn_llr", "estimate_event_probability",
           "estimate_trapping_floor", "FloorEstimate"]


def biased_awgn_llr(key: jax.Array, batch: int, n: int, snr_db: float,
                    positions, shift: float, punctured=None,
                    dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-zero-codeword AWGN LLRs with the noise mean shifted by
    ``-shift`` at ``positions``; returns ``(llr [B, n], log_w [B])``.

    ``exp(log_w)`` is the per-frame likelihood ratio of the TRUE channel
    to the biased one — multiply any event indicator by it before
    averaging. Bit/LLR conventions match ``channel.awgn_llr`` (bit 0 ->
    +1, ``llr = 2 r / sigma^2``). ``punctured``: bit positions that are
    never transmitted — their LLRs are zeroed AFTER weight computation
    (the weight covers only transmitted coordinates; shifting a
    punctured position is rejected, it has no noise to bias).
    """
    if punctured is not None and np.intersect1d(
            np.asarray(positions), np.asarray(punctured)).size:
        raise ValueError("cannot shift punctured (untransmitted) positions")
    sigma2 = 10.0 ** (-float(snr_db) / 10.0)
    pos = jnp.asarray(np.asarray(positions, dtype=np.int64))
    noise = jax.random.normal(key, (batch, n), jnp.float32) * jnp.sqrt(
        jnp.float32(sigma2))
    recv = 1.0 + noise
    recv = recv.at[:, pos].add(-float(shift))
    # d.n over the shifted coordinates, |d|^2 = a * shift^2
    dn = float(shift) * jnp.sum(noise[:, pos], axis=1)
    log_w = (2.0 * dn - len(np.asarray(positions)) * float(shift) ** 2) / (
        2.0 * sigma2)
    llr = (2.0 * recv / sigma2).astype(dtype)
    if punctured is not None:
        from ldpc_tpu.channel import puncture_llr
        llr = puncture_llr(llr, punctured)
    return llr, log_w


def estimate_event_probability(
    event_fn: Callable[[jnp.ndarray], jnp.ndarray],
    *,
    n: int,
    snr_db: float,
    positions,
    shift: float,
    n_samples: int = 2 ** 16,
    batch: int = 2 ** 12,
    key: Optional[jax.Array] = None,
    punctured=None,
) -> Tuple[float, float]:
    """IS estimate of ``P[event]`` under the true channel.

    ``event_fn(llr [B, n]) -> bool [B]`` defines the event (decode and
    test, or test the LLRs directly). Returns ``(p_hat, rel_std)`` —
    the estimate and its relative standard error (std of the weighted
    indicator / (p_hat sqrt(N))); a rel_std near 1/sqrt(hits) means the
    shift missed the event region.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    total = 0.0
    total_sq = 0.0
    count = 0
    while count < n_samples:
        b = min(batch, n_samples - count)
        key, sub = jax.random.split(key)
        llr, log_w = biased_awgn_llr(sub, b, n, snr_db, positions, shift,
                                     punctured=punctured)
        ind = event_fn(llr)
        vals = np.asarray(jnp.where(ind, jnp.exp(log_w), 0.0), np.float64)
        total += float(vals.sum())
        total_sq += float((vals ** 2).sum())
        count += b
    p = total / count
    var = max(total_sq / count - p ** 2, 0.0)
    rel = float(np.sqrt(var / count) / p) if p > 0 else float("inf")
    return p, rel


@dataclasses.dataclass
class FloorEstimate:
    """Union-bound floor estimate: sum over classes of
    multiplicity x P[localized failure on the class exemplar]."""

    fer_floor: float
    per_class: dict          # {(a, b): (multiplicity, p_hat, rel_std)}
    snr_db: float

    def summary(self) -> str:
        lines = [f"IS floor estimate @ {self.snr_db} dB: "
                 f"FER ~ {self.fer_floor:.3e}"]
        for (a, b), (m, p, rel) in sorted(self.per_class.items(),
                                          key=lambda kv: -kv[1][0] * kv[1][1]):
            lines.append(f"  ({a},{b}) x{m}: p={p:.3e} (rel_std {rel:.2f})"
                         f" -> {m * p:.3e}")
        return "\n".join(lines)


def estimate_trapping_floor(
    decoder,
    classes: Sequence[Tuple[Tuple[int, int], int, Sequence[int]]],
    *,
    snr_db: float,
    shift: float = 2.0,
    n_samples: int = 2 ** 15,
    batch: int = 2 ** 11,
    localized: bool = True,
    key: Optional[jax.Array] = None,
    punctured=None,
) -> FloorEstimate:
    """Floor contribution of the given trapping-set classes.

    ``classes``: [((a, b), multiplicity, exemplar_variables), ...] — e.g.
    built from a ``TrappingSetReport``'s ``class_counts()`` and one
    exemplar per class (QC orbits share one probability by symmetry, so
    multiplicity = the class's unique-set count). ``localized=True``
    counts a frame only when the decoder FAILS with every residual bit
    error inside the exemplar set (the event the union bound wants —
    errors elsewhere belong to other classes/the waterfall);
    ``localized=False`` counts any frame error (an upper-bound
    diagnostic, double-counts across classes).

    ``shift`` ~ 2/sigma-ish pushes the exemplar's bits to the wrong side
    of the decision boundary; tune until ``rel_std`` is small (<0.1 is
    excellent, >1 means the bias missed the failure region).
    """
    key = jax.random.PRNGKey(1) if key is None else key
    n = decoder.code.n
    per_class = {}
    fer = 0.0
    for (ab, mult, members) in classes:
        members = np.asarray(sorted(int(v) for v in members), np.int64)
        inside = np.zeros(n, bool)
        inside[members] = True
        outside = jnp.asarray(~inside)

        def event(llr, outside=outside):
            out = decoder(llr)
            wrong = out.bits.astype(jnp.int32)
            any_wrong = jnp.sum(wrong, axis=1) > 0
            if not localized:
                return any_wrong
            stray = jnp.sum(jnp.where(outside[None, :], wrong, 0), axis=1)
            return any_wrong & (stray == 0)

        key, sub = jax.random.split(key)
        p, rel = estimate_event_probability(
            event, n=n, snr_db=snr_db, positions=members, shift=shift,
            n_samples=n_samples, batch=batch, key=sub, punctured=punctured)
        per_class[tuple(ab)] = (int(mult), p, rel)
        fer += mult * p
    return FloorEstimate(fer_floor=fer, per_class=per_class, snr_db=snr_db)
