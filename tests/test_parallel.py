"""Multi-device (8 virtual CPU) tests for the parallel package."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ldpc_tpu
from ldpc_tpu.parallel import make_mesh, make_spmd_wave_fn
from ldpc_tpu.sim import LDPCSimulator, SimulationConfig


def test_make_mesh():
    mesh = make_mesh(8)
    assert mesh.size == 8 and mesh.axis_names == ("batch",)
    with pytest.raises(ValueError):
        make_mesh(10**6)


def test_spmd_wave_counts(test_code):
    mesh = make_mesh(8)
    dec = ldpc_tpu.basic_min_sum(test_code, max_iterations=8)
    wave = make_spmd_wave_fn(dec, wave_size=1024, mesh=mesh)
    fe, be, it, ok = wave(jax.random.PRNGKey(0), jnp.float32(8.0),
                          dec.weights)
    # every unconverged frame is a frame error (the all-zero word always
    # satisfies the syndrome); converged-but-wrong = undetected error
    assert int(fe) >= 1024 - int(ok)
    assert 0 <= int(be) <= int(fe) * test_code.n
    assert 1024 <= int(it) <= 1024 * 8


def test_spmd_wave_rejects_indivisible(test_code):
    mesh = make_mesh(8)
    dec = ldpc_tpu.basic_min_sum(test_code)
    with pytest.raises(ValueError):
        make_spmd_wave_fn(dec, wave_size=1023, mesh=mesh)


def test_spmd_statistics_match_single_device(mid_code):
    """Pooled FER from an 8-device mesh must statistically match the
    single-device simulator (same decoder, same stopping rules) — the
    1-vs-N-device equivalence contract (SURVEY §4)."""
    dec = ldpc_tpu.basic_min_sum(mid_code, max_iterations=15)
    cfg = SimulationConfig(snr_range=(2.0, 2.0), snr_step=1.0,
                           max_frames=4096, max_errors=10**9, min_frames=0,
                           wave_size=2048)
    fer_1 = LDPCSimulator(cfg).simulate_decoder(
        dec, verbose=False).frame_error_rates[0]
    fer_8 = LDPCSimulator(cfg, mesh=make_mesh(8)).simulate_decoder(
        dec, verbose=False).frame_error_rates[0]
    assert fer_1 > 0 and fer_8 > 0
    # same decoder/stopping, independent noise: agree within MC error
    se = (fer_1 * (1 - fer_1) / 4096) ** 0.5
    assert abs(fer_1 - fer_8) < 6 * se + 0.02


def test_spmd_wave_qc_decoder():
    """shard_map wave through the QC fast path."""
    from ldpc_tpu.decode.qc_engine import build_qc_graph

    rng = np.random.default_rng(0)
    base = rng.integers(0, 16, size=(2, 6))
    code = ldpc_tpu.create_qc_code(base, lift=16, max_iterations=6)
    qc = build_qc_graph(base, 16)
    dec = ldpc_tpu.make_decoder(code, kind="rcq", bc=3, qc=qc,
                                max_iterations=6)
    mesh = make_mesh(8)
    wave = make_spmd_wave_fn(dec, wave_size=256, mesh=mesh)
    fe, be, it, ok = wave(jax.random.PRNGKey(1), jnp.float32(6.0),
                          dec.weights)
    assert int(fe) >= 256 - int(ok)  # unconverged => frame error


def test_wrcq_qc_mesh_simulation_and_training():
    """BASELINE config 5 shape: weighted RCQ on a QC-lifted code with
    mesh-sharded Monte-Carlo AND data-parallel posterior-joint training
    (8 virtual devices standing in for the pod slice)."""
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig
    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    rng = np.random.default_rng(0)
    base = rng.integers(0, 24, size=(3, 10))
    code = ldpc_tpu.create_qc_code(base, lift=24, max_iterations=6)
    qc = build_qc_graph(base, 24)
    dec = ldpc_tpu.make_decoder(code, kind="wrcq", bc=3, sharing_type=2,
                                max_iterations=6, qc=qc, init="nms")
    mesh = make_mesh(8)

    tr = PosteriorJointTrainer(
        dec, TrainingConfig(batch_size=64, num_epochs=2, snr_range=(2, 5),
                            learning_rate=3e-3), mesh=mesh)
    hist = tr.train(num_samples=128, verbose=False)
    assert np.isfinite(hist["training_losses"]).all()

    cfg = SimulationConfig(snr_range=(4.0, 5.0), snr_step=1.0,
                           max_frames=512, max_errors=10**9, min_frames=0,
                           wave_size=256)
    res = LDPCSimulator(cfg, mesh=mesh).simulate_decoder(dec, verbose=False)
    assert res.total_frames == [512, 512]
    assert all(0.0 <= f <= 1.0 for f in res.frame_error_rates)


def test_spmd_compacting_wave_matches_plain(mid_code):
    """Per-device compaction over an 8-device mesh: pooled stats equal the
    plain SPMD wave bit-for-bit (same keys -> same per-device noise)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ldpc_tpu.parallel.montecarlo import (make_spmd_compacting_wave_fn,
                                              make_spmd_wave_fn)

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    dec = ldpc_tpu.basic_min_sum(mid_code, max_iterations=15)
    plain = make_spmd_wave_fn(dec, 512, mesh)
    comp = make_spmd_compacting_wave_fn(dec, 512, early_iters=3,
                                        survivor_budget=256, mesh=mesh)
    key = jax.random.PRNGKey(21)
    for snr in (2.0, 0.0):  # 0 dB exercises the per-device cond fallback
        a = tuple(int(v) for v in plain(key, jnp.float32(snr), dec.weights))
        b = tuple(int(v) for v in comp(key, jnp.float32(snr), dec.weights))
        assert a == b, f"snr={snr}: {a} != {b}"


def test_spmd_compaction_through_simulator(test_code):
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    dec = ldpc_tpu.basic_min_sum(test_code, max_iterations=10)
    cfg = SimulationConfig(snr_range=(4.0, 4.0), snr_step=1.0,
                           max_frames=1024, max_errors=10**9, min_frames=0,
                           wave_size=512, early_exit_iters=2,
                           survivor_budget=256, save_results=False)
    res = LDPCSimulator(cfg, mesh=mesh).simulate_decoder(dec, verbose=False)
    assert res.total_frames[0] == 1024
    assert 0.0 <= res.frame_error_rates[0] < 0.2


def test_spmd_wave_with_puncturing():
    """Punctured positions flow through the shard_map wave: FER rises vs
    the unpunctured mesh run on the same keys."""
    import jax

    import ldpc_tpu

    code = ldpc_tpu.create_peg_code(n=128, m=64, dv=3, seed=1,
                                    max_iterations=10)
    dec = ldpc_tpu.basic_min_sum(code)
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(5)
    plain = make_spmd_wave_fn(dec, wave_size=1024, mesh=mesh)
    punct = make_spmd_wave_fn(dec, wave_size=1024, mesh=mesh,
                              punctured=tuple(range(8)))
    fe0 = int(plain(key, 3.0, dec.weights)[0])
    fe1 = int(punct(key, 3.0, dec.weights)[0])
    assert fe1 > fe0


def test_spmd_compacting_wave_with_puncturing(mid_code):
    """Puncturing + mesh compaction (the combination _build_wave used to
    reject): pooled stats equal the punctured plain SPMD wave bit-for-bit
    on the same keys."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ldpc_tpu.parallel.montecarlo import (make_spmd_compacting_wave_fn,
                                              make_spmd_wave_fn)

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    dec = ldpc_tpu.basic_min_sum(mid_code, max_iterations=15)
    punct = tuple(range(6))
    plain = make_spmd_wave_fn(dec, 512, mesh, punctured=punct)
    comp = make_spmd_compacting_wave_fn(dec, 512, early_iters=3,
                                        survivor_budget=256, mesh=mesh,
                                        punctured=punct)
    key = jax.random.PRNGKey(31)
    a = tuple(int(v) for v in plain(key, jnp.float32(2.5), dec.weights))
    b = tuple(int(v) for v in comp(key, jnp.float32(2.5), dec.weights))
    assert a == b, f"{a} != {b}"

    # and through the simulator config that used to raise
    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig
    cfg = SimulationConfig(snr_range=(3.0, 3.0), snr_step=1.0,
                           max_frames=512, max_errors=10**9, min_frames=0,
                           wave_size=512, early_exit_iters=3,
                           survivor_budget=256, punctured_positions=punct,
                           save_results=False)
    res = LDPCSimulator(cfg, mesh=mesh).simulate_decoder(dec, verbose=False)
    assert res.total_frames[0] == 512


def test_spmd_wave_fused_kernel_decoder():
    """The SPMD wave dispatches through Decoder.__call__, so a fused-
    Pallas-kernel decoder (interpret mode on CPU) runs under shard_map
    and matches the XLA QC engine's counters on the same keys."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ldpc_tpu
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from jax.sharding import Mesh

    rng = np.random.default_rng(4)
    base = rng.integers(0, 16, size=(3, 8))
    code = ldpc_tpu.create_qc_code(base, lift=16, max_iterations=6)
    qc = build_qc_graph(base, 16)
    dec = ldpc_tpu.make_decoder(code, max_iterations=6, qc=qc, kind="rcq",
                                bc=3, bv=8)
    ref = _dc.replace(dec, qc_options=dict(check_every=6))
    fused = _dc.replace(dec, qc_options=dict(
        fused=True, interpret=True, batch_tile=16, dtype=jnp.float32))

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    key = jax.random.PRNGKey(11)
    a = tuple(int(v) for v in make_spmd_wave_fn(ref, 256, mesh)(
        key, jnp.float32(2.0), dec.weights))
    b = tuple(int(v) for v in make_spmd_wave_fn(fused, 256, mesh)(
        key, jnp.float32(2.0), dec.weights))
    assert a == b, f"{a} != {b}"


def test_spmd_two_checkpoint_matches_single_device():
    """The SHIPPED BENCH CONFIGURATION on the mesh: a LAYERED fused
    (lean) kernel wrapped in the {t1, T} two-checkpoint compaction
    (bench.py's exact construction) dispatched per device under
    shard_map over a batch-sharded llr — pooled stats bit-equal to the
    single-device two-checkpoint decode of the same batch."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ldpc_tpu
    from jax.sharding import Mesh
    from ldpc_tpu.channel import awgn_llr
    from ldpc_tpu.decode.early_exit import make_two_checkpoint_decoder
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.parallel import make_spmd_two_checkpoint_stats_fn

    rng = np.random.default_rng(7)
    base = rng.integers(0, 16, size=(3, 8))
    T = 6
    code = ldpc_tpu.create_qc_code(base, lift=16, max_iterations=T)
    dec = ldpc_tpu.make_decoder(
        code, kind="rcq", bc=3, bv=8,
        quantizer_params=((2.6, 1.3), (3.1, 1.3), (5.4, 1.3)),
        v2c_quantizer_params=((4.0, 1.0), (8.0, 1.0), (12.0, 1.0)),
        max_iterations=T, qc=build_qc_graph(base, 16), layered=True,
        qc_options=dict(fused=True, interpret=True, batch_tile=16,
                        dtype=jnp.float32, lean=True))

    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("batch",))
    B, S = 16 * n_dev, 16   # per-device budget covers a whole shard
    llr = awgn_llr(jax.random.PRNGKey(3),
                   jnp.zeros((B, code.n), jnp.float32), 1.5)

    fn = make_spmd_two_checkpoint_stats_fn(dec, t1=3, survivor_budget=S,
                                           mesh=mesh)
    pooled = tuple(int(v) for v in fn(llr, dec.weights))

    out, n_surv = make_two_checkpoint_decoder(dec, t1=3,
                                              survivor_budget=B)(llr)
    wrong = jnp.sum(out.bits.astype(jnp.int32), axis=-1)
    single = (int(jnp.sum(wrong > 0)), int(jnp.sum(wrong)),
              int(jnp.sum(out.iterations)), int(jnp.sum(out.success)),
              int(n_surv))
    assert pooled == single, f"{pooled} != {single}"
    assert 0 < single[3] < B    # the point is exercised both ways
