import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
QP_DDE = ((2.6474, 1.3), (3.0869, 1.3), (5.3767, 1.3))
VQP = ((4.0, 1.0), (8.0, 1.0), (12.0, 1.0))
T = 6
from ldpc_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import ldpc_tpu
from ldpc_tpu.channel import awgn_llr
from ldpc_tpu.decode.qc_engine import build_qc_graph
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(5, 37))
code = ldpc_tpu.create_qc_code(base, lift=256, max_iterations=T)
qc = build_qc_graph(base, 256)
fused = dict(fused=True, batch_tile=64, dtype=jnp.bfloat16, lean=True, natural=True)
dde = ldpc_tpu.make_decoder(code, kind="rcq", bc=3, bv=8, quantizer_params=QP_DDE,
    v2c_quantizer_params=VQP, max_iterations=T, qc=qc, layered=True, qc_options=dict(fused))
key = jax.random.PRNGKey(0)
def llrs_for(B, k=3):
    return [awgn_llr(kk, jnp.zeros((B, code.n), jnp.float32), snr_db=7.0)
            for kk in jax.random.split(key, k)]
results = {}
for B, S in ((16384, 256), (32768, 512), (65536, 1024)):
    two = ldpc_tpu.make_two_checkpoint_decoder(dde, t1=3, survivor_budget=S)
    def wave(llr, two=two):
        out, ns = two(llr)
        return out.bits, ns
    ll = llrs_for(B)
    ok = True
    for w in ll[:2]:
        bits, ns = wave(w)
        if int(ns) > S:
            ok = False; break
        np.asarray(jnp.sum(bits))
    if not ok:
        print(f"B={B}: overflow {int(ns)}", flush=True); continue
    reps = 10
    val = 0.0
    for attempt in range(4):
        for _ in range(3):
            t0 = time.time()
            for i in range(reps):
                s = jnp.sum(wave(ll[i % 3])[0])
            np.asarray(s)
            val = max(val, reps * B / (time.time() - t0))
        if val > 120_000.0:
            break
        time.sleep(120)
    results[f"dde_t1=3_B{B}"] = val
    print(f"dde t1=3 B={B} S={S}: {val:.0f} cw/s", flush=True)
json.dump(results, open("experiments/ee_batch_results.json", "w"), indent=2)
