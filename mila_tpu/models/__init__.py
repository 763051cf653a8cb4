"""Models and training engine (reference layers 6+11, SURVEY.md §2.8–2.9)."""

from mila_tpu.models.mlp_classifier import MLPClassifier, MLPClassifierConfig, accuracy
from mila_tpu.models.model import Model, ModelConfig, TrainingHistory

__all__ = [
    "MLPClassifier",
    "MLPClassifierConfig",
    "accuracy",
    "Model",
    "ModelConfig",
    "TrainingHistory",
]
