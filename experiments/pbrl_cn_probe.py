import json, os, sys
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
from ldpc_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import logging; logging.basicConfig(level=logging.WARNING, force=True)
import jax, jax.numpy as jnp
import ldpc_tpu
from ldpc_tpu.decode.qc_engine import build_qc_graph
from ldpc_tpu.sim import SimulationConfig, simulate_single_snr

base, lift, pc = ldpc_tpu.create_pbrl_qc_protograph(k=1032, rate=1/3, precode=True)
qc = build_qc_graph(base, lift); T = 10
code = ldpc_tpu.create_qc_code(base, lift=lift, max_iterations=T)
punct = tuple(range(lift*pc[0], lift*(pc[0]+1)))
fused = dict(fused=True, batch_tile=None, dtype=jnp.bfloat16)
VREF3 = ((182.5928, 1.0), (315.3076, 1.0), (394.1345, 1.0))
def mk(cn):
    return ldpc_tpu.make_decoder(code, kind="rcq", bc=4, bv=8,
        quantizer_params=cn, v2c_quantizer_params=VREF3, max_iterations=T,
        qc=qc, layered=True, qc_options=dict(fused))
arms = {
    "cn_8.5-16-16": mk(((8.4963,1.3),(16.0,1.3),(16.0,1.3))),
    "cn_6-12-12":   mk(((6.0,1.3),(12.108,1.3),(12.108,1.3))),
    "cn_8.5-12-16": mk(((8.4963,1.3),(12.108,1.3),(16.0,1.3))),
}
res = {}
for name, dec in arms.items():
    res[name] = {}
    for snr in (2.0, 2.4):
        cfg = SimulationConfig(snr_range=(snr,snr), max_frames=2*10**7,
            max_errors=100, min_frames=65536, wave_size=32768,
            early_exit_iters=5, survivor_budget=4096,
            punctured_positions=punct, save_results=False)
        fer, ber, it, nf, ne = simulate_single_snr(dec, snr, cfg)
        res[name][str(snr)] = {"fer": fer, "frames": nf, "errors": ne}
        print(f"{name:14s} @ {snr}: FER {fer:.3e} ({ne}/{nf})", flush=True)
json.dump(res, open("experiments/pbrl_cn_probe_results.json","w"), indent=2)
print("done", flush=True)
