"""AWGN/BPSK channel with a *consistent* sign convention.

Capability parity with the reference's ``simulate_awgn_channel``
(``ldpc_decoder.py:286-302``) but with the sign bug fixed: the reference maps
bit b -> symbol ``2b-1`` (0 -> -1) while computing ``llr = +2r/sigma^2`` and
deciding ``bit = posterior < 0`` — an inconsistent triple that drives FER to
1.0 at high SNR (SURVEY §8.1, verified empirically). Here bit 0 -> +1, so
``llr = 2r/sigma^2`` and ``bit = llr < 0`` agree: all-zero codewords yield
positive LLRs.

Batched and jittable; uses JAX threefry RNG keys (no global state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bpsk_modulate", "awgn_llr", "simulate_awgn_channel",
           "puncture_llr"]


def bpsk_modulate(bits: jnp.ndarray) -> jnp.ndarray:
    """Map bit 0 -> +1, bit 1 -> -1 (the convention consistent with
    ``decision = llr < 0``)."""
    return 1.0 - 2.0 * bits.astype(jnp.float32)


def awgn_llr(
    key: jax.Array,
    codewords: jnp.ndarray,
    snr_db: jnp.ndarray | float,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Transmit ``codewords`` [..., n] over AWGN at ``snr_db`` and return
    channel LLRs.

    ``snr_db`` may be a scalar or broadcastable to the leading batch dims
    (e.g. shape [B] for a per-sample SNR sweep, as the reference trainer's
    ``linspace`` data generator does at ``training_framework.py:73-83``).

    SNR convention matches the reference (``ldpc_decoder.py:291-293``):
    ``sigma^2 = 1 / 10^(snr/10)``, ``llr = 2 r / sigma^2``.
    """
    codewords = jnp.asarray(codewords)
    snr_db = jnp.asarray(snr_db, dtype=jnp.float32)
    noise_power = 10.0 ** (-snr_db / 10.0)
    if noise_power.ndim:  # broadcast per-sample SNR over the bit axis
        noise_power = noise_power[..., None]
    symbols = bpsk_modulate(codewords)
    noise = jax.random.normal(key, codewords.shape, dtype=jnp.float32)
    received = symbols + jnp.sqrt(noise_power) * noise
    return (2.0 * received / noise_power).astype(dtype)


def simulate_awgn_channel(
    key: jax.Array, codeword: jnp.ndarray, snr_db: float
) -> jnp.ndarray:
    """Reference-named convenience wrapper (``ldpc_decoder.py:286``), single
    codeword, explicit RNG key."""
    return awgn_llr(key, codeword, snr_db)


def puncture_llr(llr: jnp.ndarray, positions) -> jnp.ndarray:
    """Zero the channel LLRs at punctured bit POSITIONS (not transmitted;
    the decoder recovers them from the code structure alone — standard
    rate-compatible/PBRL practice). The effective transmitted rate is
    ``k / (n - len(positions))``."""
    import numpy as np
    positions = np.asarray(positions, dtype=np.int32)
    if positions.size == 0:
        return llr
    mask = jnp.ones((llr.shape[-1],), llr.dtype).at[
        jnp.asarray(positions)].set(0.0)
    return llr * mask
