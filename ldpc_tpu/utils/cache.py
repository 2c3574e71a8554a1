"""Persistent XLA compilation cache setup.

The decode engines compile large programs (the unrolled QC chunk is tens of
thousands of HLO ops); on remote-compile backends a cold compile takes
minutes. Enabling JAX's persistent cache makes that a one-time cost per
(program, config) across processes.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.expanduser("~/.cache/ldpc_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (idempotent;
    safe to call before or after backend init)."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
