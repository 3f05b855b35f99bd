"""Training engine: optax SGD + StepLR, InfoNCE, checkpoint latest/best.

Replaces the reference's train.py:39-210 epoch loop and main.py:440-483
optimizer/checkpoint plumbing.
"""

from .loop import TrainConfigError, make_train_step, train_video
from .checkpoint import save_checkpoint, restore_checkpoint

__all__ = ["make_train_step", "train_video", "TrainConfigError",
           "save_checkpoint", "restore_checkpoint"]
