"""SPMD Monte-Carlo: shard_map waves with per-device RNG and psum'd stats.

The mesh path used by ``ldpc_tpu.sim`` when a mesh is supplied: every
device draws its own noise (key folded with its mesh index — no cross-chip
RNG traffic), decodes its local shard of the wave, and the four error
counters cross the interconnect as one fused ``psum``. Weight tables ride
replicated. This is the scaling-book recipe: shard the batch, replicate the
tiny model, let XLA place the collectives on ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ldpc_tpu.channel import awgn_llr
from ldpc_tpu.decode.engine import decode_batch, decode_batch_layered
from ldpc_tpu.decode.qc_engine import qc_decode_batch
from ldpc_tpu.decode.variants import Decoder

__all__ = ["make_spmd_wave_fn"]


def make_spmd_wave_fn(decoder: Decoder, wave_size: int, mesh: Mesh,
                      axis_name: str = "batch") -> Callable:
    """Build the jitted SPMD wave kernel:
    (key, snr_db, weights) -> (frame_errors, bit_errors, iter_sum,
    success_count) — replicated scalars summed across the mesh.

    ``wave_size`` is the GLOBAL wave; each device decodes
    ``wave_size // mesh.size`` frames. All-zero codewords (the simulator's
    ground truth, ``simulation_framework.py:107``).
    """
    n_dev = mesh.size
    if wave_size % n_dev:
        raise ValueError(f"wave_size {wave_size} not divisible by "
                         f"{n_dev} devices")
    per_dev = wave_size // n_dev
    n = decoder.code.n
    graph, spec, T = decoder.graph, decoder.spec, decoder.max_iterations
    qc, layered, layer_checks = decoder.qc, decoder.layered, decoder.layer_checks

    def device_wave(key, snr_db, weights):
        # independent noise per device: fold the mesh position into the key
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        llr = awgn_llr(key, jnp.zeros((per_dev, n), jnp.float32), snr_db)
        if layered:
            out = decode_batch_layered(llr, weights, layer_checks,
                                       graph=graph, spec=spec,
                                       max_iterations=T)
        elif qc is not None:
            out = qc_decode_batch(llr, weights, qc=qc, spec=spec,
                                  max_iterations=T,
                                  **(decoder.qc_options or {}))
        else:
            out = decode_batch(llr, weights, graph=graph, spec=spec,
                               max_iterations=T)
        wrong = jnp.sum(out.bits, axis=-1)
        local = (jnp.sum(wrong > 0), jnp.sum(wrong),
                 jnp.sum(out.iterations), jnp.sum(out.success))
        return tuple(jax.lax.psum(s, axis_name) for s in local)

    sharded = shard_map(
        device_wave, mesh=mesh,
        in_specs=(P(), P(), P()),       # key, snr, weights all replicated
        out_specs=(P(), P(), P(), P()),  # psum'd scalars, replicated
        check_vma=False,
    )
    return jax.jit(sharded)
