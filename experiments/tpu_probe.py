"""Strong tunnel-health probe: a real 8192-frame T=10 fused decode.

Tiny probes (``jnp.ones`` round-trips) LIE during partial tunnel
degradation — they pass while big programs stall (CLAUDE.md round-4).
This probe compiles+runs a bench-class fused layered decode and fetches
one scalar, which discriminates the degraded-window state reliably.

Exit 0 = healthy. Run under ``timeout`` (the runner uses 240 s).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ldpc_tpu  # noqa: E402
from ldpc_tpu.decode.qc_engine import build_qc_graph  # noqa: E402
from ldpc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
t0 = time.time()
base = np.random.default_rng(0).integers(0, 43, (4, 12))
code = ldpc_tpu.create_qc_code(base, lift=43, max_iterations=10)
qc = build_qc_graph(base, 43)
dec = ldpc_tpu.make_decoder(
    code, kind="rcq", bc=4, bv=8,
    quantizer_params=((3, 1.3), (5, 1.3), (7, 1.3)),
    v2c_quantizer_params=((4, 1), (8, 1), (12, 1)), max_iterations=10,
    qc=qc, layered=True,
    qc_options=dict(fused=True, batch_tile=None, dtype=jnp.bfloat16))
llr = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (8192, code.n))) + 1.0
out = dec(llr)
s = int(jnp.sum(out.bits))   # force a real device->host scalar fetch
print("probe decode ok", out.bits.shape, s, round(time.time() - t0, 1), "s")
