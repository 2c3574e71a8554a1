"""Training framework tests (reference training_framework.py parity —
fixed so batched training actually runs, SURVEY §8.2/§8.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ldpc_tpu
from ldpc_tpu.train import (
    GradientExplosionAnalyzer,
    PosteriorJointTrainer,
    TrainingConfig,
)


def _cfg(**kw):
    base = dict(batch_size=64, num_epochs=5, learning_rate=5e-3,
                snr_range=(1.0, 5.0), seed=0)
    base.update(kw)
    return TrainingConfig(**base)


def test_train_improves_nnms(test_code):
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=3)
    tr = PosteriorJointTrainer(dec, _cfg())
    hist = tr.train(num_samples=640, val_samples=256, verbose=False)
    assert len(hist["training_losses"]) >= 1
    assert hist["training_losses"][-1] <= hist["training_losses"][0] + 1e-3
    assert hist["training_accuracies"][-1] > 0.9
    assert all(np.isfinite(hist["gradient_norms"]))


def test_train_2d_type2_weights_move(mid_code):
    dec = ldpc_tpu.neural_2d_min_sum(mid_code, weight_sharing_type=2,
                                     max_iterations=8, seed=0)
    w0 = jax.tree_util.tree_map(lambda x: np.asarray(x), dict(dec.weights))
    tr = PosteriorJointTrainer(dec, _cfg(num_epochs=2, batch_size=32))
    tr.train(num_samples=128, verbose=False)
    moved = np.abs(np.asarray(dec.weights["beta"]) - w0["beta"]).max()
    assert moved > 1e-4
    # untrained 2D weights start near zero (reference init 0.1*randn);
    # after training on real noise they should move toward useful values
    assert np.isfinite(np.asarray(dec.weights["beta"])).all()


def test_wrcq_ste_training_gradients_flow(test_code):
    """W-RCQ trains through the quantizer via STE — the capability the
    reference never delivered (its RCQ path is inference-only)."""
    dec = ldpc_tpu.weighted_rcq(test_code, bc=3, weight_sharing_type=2,
                                max_iterations=6, seed=1)
    tr = PosteriorJointTrainer(dec, _cfg(num_epochs=1, batch_size=32))
    loss0, acc0 = tr.validate()
    hist = tr.train(num_samples=256, verbose=False)
    assert np.isfinite(hist["training_losses"]).all()
    assert all(g > 0 for g in hist["gradient_norms"])


def test_final_only_vs_joint_loss_modes(test_code):
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=0)
    for joint in (True, False):
        tr = PosteriorJointTrainer(
            dec, _cfg(num_epochs=1, use_posterior_training=joint))
        llr, tgt = tr.generate_training_data(64)
        loss = tr.compute_loss(llr, tgt)
        assert np.isfinite(loss) and loss > 0


def test_gradient_clipping_bounds_updates(test_code):
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=0)
    tr = PosteriorJointTrainer(
        dec, _cfg(num_epochs=1, use_gradient_clipping=True,
                  clip_threshold=1e-3))
    hist = tr.train(num_samples=128, verbose=False)
    assert np.isfinite(hist["training_losses"]).all()


def test_untrainable_decoder_rejected(test_code):
    dec = ldpc_tpu.basic_min_sum(test_code)
    with pytest.raises(ValueError):
        PosteriorJointTrainer(dec, _cfg())


def test_generate_training_data_shapes(test_code):
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=5)
    tr = PosteriorJointTrainer(dec, _cfg())
    llr, tgt = tr.generate_training_data(100)
    assert llr.shape == (100, 7) and tgt.shape == (100, 7)
    # all-zero codewords at positive SNR: LLRs mostly positive
    assert float(jnp.mean((llr > 0).astype(jnp.float32))) > 0.7


def test_punctured_training_data_and_step(test_code):
    """punctured_positions zeroes those LLR columns in both the sampler
    and the materialized dataset, and a train step still runs (the
    precoded-PBRL / rate-compatible training path)."""
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=1)
    cfg = _cfg(num_epochs=1, punctured_positions=(0, 3))
    tr = PosteriorJointTrainer(dec, cfg)
    llr, _ = tr.generate_training_data(64)
    assert float(jnp.abs(llr[:, 0]).max()) == 0.0
    assert float(jnp.abs(llr[:, 3]).max()) == 0.0
    assert float(jnp.abs(llr[:, 1]).max()) > 0.0
    sllr, _ = tr._sample(jax.random.PRNGKey(0))
    assert float(jnp.abs(sllr[:, 0]).max()) == 0.0
    assert float(jnp.abs(sllr[:, 2]).max()) > 0.0
    hist = tr.train(num_samples=64, val_samples=32, verbose=False)
    assert np.isfinite(hist["training_losses"][-1])


def test_gradient_explosion_analyzer(test_code):
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=0)
    an = GradientExplosionAnalyzer(dec)
    res = an.analyze(num_samples=16, snr_db=2.0)
    assert set(res) == {"posterior_joint", "final_only"}
    for st in res.values():
        assert st["max"] >= st["mean"] >= 0
        assert len(st["norms"]) == 16


def test_data_parallel_training_step(mid_code):
    """Data-parallel training over an 8-device mesh compiles and runs
    (multi-chip path)."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    dec = ldpc_tpu.neural_2d_min_sum(mid_code, weight_sharing_type=2,
                                     max_iterations=4, seed=0)
    tr = PosteriorJointTrainer(dec, _cfg(num_epochs=1, batch_size=64),
                               mesh=mesh)
    hist = tr.train(num_samples=128, verbose=False)
    assert np.isfinite(hist["training_losses"]).all()


def test_training_history_plot(test_code, tmp_path):
    import os

    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=4, seed=0)
    tr = PosteriorJointTrainer(dec, _cfg(num_epochs=2))
    tr.train(num_samples=64, verbose=False)
    p = tr.plot_training_history(str(tmp_path / "hist.png"))
    assert os.path.getsize(p) > 1000


def test_gradient_analysis_plot(test_code, tmp_path):
    import os

    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=4, seed=0)
    an = GradientExplosionAnalyzer(dec)
    res = an.analyze(num_samples=8)
    p = an.plot_gradient_analysis(res, str(tmp_path / "ga.png"))
    assert os.path.getsize(p) > 1000


def test_compute_loss_and_validate_paths(test_code):
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=4, seed=0)
    tr = PosteriorJointTrainer(dec, _cfg(num_epochs=1))
    llr, tgt = tr.generate_training_data(32)
    assert np.isfinite(tr.compute_loss(llr, tgt))
    loss, acc = tr.validate()
    assert 0.0 <= acc <= 1.0 and np.isfinite(loss)


def test_layered_joint_training(test_code):
    """Layered decoders expose per-iteration posteriors, so posterior-joint
    training works on them (previously a silent final-only fallback)."""
    from ldpc_tpu.decode.qc_engine import build_qc_graph
    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    base = np.array([[0, 1, 2, 3], [3, 2, 1, 0]])
    code = ldpc_tpu.create_qc_code(base, lift=8, max_iterations=6)
    qc = build_qc_graph(base, 8)
    for dec in (
        ldpc_tpu.neural_2d_min_sum(code, weight_sharing_type=2, layered=True,
                                   max_iterations=6, init="nms"),
        ldpc_tpu.make_decoder(code, kind="nms", sharing_type=2, qc=qc,
                              layered=True, max_iterations=6, init="nms"),
    ):
        out = dec(ldpc_tpu.awgn_llr(jax.random.PRNGKey(0),
                                    jnp.zeros((8, code.n)), 2.0),
                  return_trajectory=True)
        assert out.posteriors_all is not None
        assert out.posteriors_all.shape == (6, 8, code.n)
        # last trajectory entry == (unfrozen) per-iteration posterior; for a
        # frame not converged before T they agree with the final posterior
        unconv = ~np.asarray(out.success)
        cfg = TrainingConfig(batch_size=32, num_epochs=1,
                             use_posterior_training=True)
        tr = PosteriorJointTrainer(dec, cfg)
        tr.train(num_samples=64, verbose=False)
        assert len(tr.training_losses) == 1
        assert np.isfinite(tr.training_losses[0])
