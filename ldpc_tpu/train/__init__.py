from ldpc_tpu.train.trainer import (
    PosteriorJointTrainer,
    TrainingConfig,
    posterior_joint_loss,
)
from ldpc_tpu.train.gradient_analysis import GradientExplosionAnalyzer
