"""Tests for report (plots/analysis) and utils (checkpoint) subsystems."""

import os

import jax
import numpy as np
import pytest

import ldpc_tpu
from ldpc_tpu.report import (
    analyze_weight_patterns,
    parameter_reduction_report,
    plot_comparison_grid,
    plot_fer_curves,
    plot_weight_patterns,
)
from ldpc_tpu.sim import SimulationResult, create_test_decoders
from ldpc_tpu.utils import (
    load_checkpoint,
    load_trainer_checkpoint,
    save_checkpoint,
    save_trainer_checkpoint,
)


def _fake_results():
    r = SimulationResult("MS", [1.0, 2.0, 3.0])
    for i, (fer, ber) in enumerate([(0.5, 0.1), (0.1, 0.01), (0.01, 1e-3)]):
        r.add_result(i, fer, ber, 5.0 - i, 1.0, 1000, int(fer * 1000))
    return {"MS": r}


def test_plots_write_files(tmp_path):
    p1 = plot_fer_curves(_fake_results(), str(tmp_path / "fer.png"))
    p2 = plot_comparison_grid(_fake_results(), str(tmp_path / "grid.png"))
    assert os.path.getsize(p1) > 1000
    assert os.path.getsize(p2) > 1000


def test_weight_pattern_analysis(test_code):
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=10, seed=0)
    an = analyze_weight_patterns(dec)
    assert an["total_parameters"] == 130
    assert len(an["per_iteration"]) == 10
    # (7,4) code has check degrees {3, 4} (ldpc_decoder.py:274-284)
    assert set(an["mean_weight_by_check_degree"]) == {3, 4}
    # N-NMS init is 0.7 + 0.1*randn -> means near 0.7
    for v in an["mean_weight_by_check_degree"].values():
        assert 0.4 < v < 1.0


def test_weight_analysis_rejects_weightless(test_code):
    with pytest.raises(ValueError):
        analyze_weight_patterns(ldpc_tpu.basic_min_sum(test_code))


def test_param_reduction_report(test_code):
    zoo = create_test_decoders(test_code, max_iterations=10)
    rep = parameter_reduction_report(zoo, baseline="N-NMS")
    assert rep["baseline_params"] == 130
    # golden counts from the reference ((7,4)@10 iters):
    # types 1/2 -> 40, types 3/4 -> 20 (SURVEY §2a table)
    assert rep["decoders"]["N-2D-NMS-T1"]["params"] == 40
    assert rep["decoders"]["N-2D-NMS-T3"]["params"] == 20
    assert rep["decoders"]["N-2D-NMS-T2"]["reduction_pct"] == pytest.approx(
        100 * (1 - 40 / 130))


def test_plot_weight_patterns(test_code, tmp_path):
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=0)
    p = plot_weight_patterns(analyze_weight_patterns(dec),
                             str(tmp_path / "wp.png"))
    assert os.path.getsize(p) > 1000


def test_checkpoint_roundtrip(tmp_path):
    tree = {"beta": np.arange(6, dtype=np.float32).reshape(2, 3),
            "alpha": None,
            "counters": {"frames": np.int64(123)}}
    path = save_checkpoint(str(tmp_path / "ck"), tree)
    back = load_checkpoint(path)
    np.testing.assert_array_equal(back["beta"], tree["beta"])
    assert int(back["counters"]["frames"]) == 123
    assert "alpha" not in back  # None entries stripped


def test_trainer_checkpoint_roundtrip(test_code, tmp_path):
    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    cfg = TrainingConfig(batch_size=32, num_epochs=1)
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=0)
    tr = PosteriorJointTrainer(dec, cfg)
    tr.train(num_samples=64, verbose=False)
    path = save_trainer_checkpoint(str(tmp_path / "ck"), tr, epoch=1)

    dec2 = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=42)
    tr2 = PosteriorJointTrainer(dec2, cfg)
    epoch = load_trainer_checkpoint(path, tr2)
    assert epoch == 1
    np.testing.assert_allclose(np.asarray(dec2.weights["beta"]),
                               np.asarray(dec.weights["beta"]))
    assert tr2.training_losses == tr.training_losses


def test_snr_at_fer_interpolation():
    import sys
    sys.path.insert(0, ".")
    from experiments.fer_parity import snr_at_fer

    snrs = [1.0, 2.0, 3.0, 4.0]
    fers = [0.5, 0.1, 0.01, 0.001]
    # exact point
    assert snr_at_fer(snrs, fers, 0.1) == pytest.approx(2.0)
    # log-linear midpoint between 0.1 and 0.01 -> ~2.5
    assert snr_at_fer(snrs, fers, 10 ** -1.5) == pytest.approx(2.5, abs=0.01)
    # out of range
    assert snr_at_fer(snrs, fers, 1e-6) is None
    assert snr_at_fer([1.0], [0.1], 0.1) is None


def test_trainer_checkpoint_restores_adam_moments(test_code, tmp_path):
    """Resume must restore the optimizer's moments exactly — not silently
    reinitialize them (VERDICT r1 weak #6)."""
    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    cfg = TrainingConfig(batch_size=32, num_epochs=1)
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=0)
    tr = PosteriorJointTrainer(dec, cfg)
    tr.train(num_samples=64, verbose=False)
    path = save_trainer_checkpoint(str(tmp_path / "ck"), tr, epoch=2)

    dec2 = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=42)
    tr2 = PosteriorJointTrainer(dec2, cfg)
    assert load_trainer_checkpoint(path, tr2) == 2
    a = jax.tree_util.tree_leaves(tr.opt_state)
    b = jax.tree_util.tree_leaves(tr2.opt_state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    # trained moments are non-trivial, so equality above is meaningful
    assert any(np.any(np.asarray(x) != 0) for x in a)


def test_trainer_checkpoint_structure_mismatch_raises(test_code, tmp_path):
    """Restoring into a trainer with different weight structure must raise,
    never silently reset Adam state."""
    import pytest

    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    cfg = TrainingConfig(batch_size=32, num_epochs=1)
    dec = ldpc_tpu.neural_min_sum(test_code, max_iterations=5, seed=0)
    tr = PosteriorJointTrainer(dec, cfg)
    tr.train(num_samples=64, verbose=False)
    path = save_trainer_checkpoint(str(tmp_path / "ck"), tr, epoch=1)

    # different T -> different weight shapes -> must refuse
    dec2 = ldpc_tpu.neural_min_sum(test_code, max_iterations=7, seed=0)
    tr2 = PosteriorJointTrainer(dec2, cfg)
    with pytest.raises(ValueError):
        load_trainer_checkpoint(path, tr2)
