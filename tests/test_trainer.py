

def test_cosine_lr_schedule_trains():
    """lr_schedule='cosine' wires warmup_cosine_decay into the Adam
    chain; loss decreases over a short run and the misconfigured case
    (no decay_steps) raises."""
    import pytest

    import ldpc_tpu
    from ldpc_tpu.train import PosteriorJointTrainer, TrainingConfig

    code = ldpc_tpu.create_test_ldpc_code()
    dec = ldpc_tpu.neural_min_sum(code, max_iterations=5)
    cfg = TrainingConfig(batch_size=32, num_epochs=4, learning_rate=5e-3,
                         snr_range=(1.0, 5.0), lr_schedule="cosine",
                         warmup_steps=2, decay_steps=16,
                         early_stop_accuracy=2.0, seed=0)
    tr = PosteriorJointTrainer(dec, cfg)
    hist = tr.train(num_samples=128, verbose=False)
    assert hist["training_losses"][-1] <= hist["training_losses"][0]

    with pytest.raises(ValueError, match="decay_steps"):
        PosteriorJointTrainer(dec, TrainingConfig(lr_schedule="cosine"))
    with pytest.raises(ValueError, match="lr_schedule"):
        PosteriorJointTrainer(dec, TrainingConfig(lr_schedule="nope"))
