"""Neural encoders (flax.linen, NDHWC layouts, bfloat16 compute).

The reference's model zoo (SURVEY.md §2.1): 3D ResNet/ResNeXt/DenseNet
(reference: models/video_models/), external SlowFast-R50
(reference: models/models.py:565-580), VGGish audio CNN
(reference: models/audio_models/vggish.py), SuperSloMo UNet
(reference: models/slowmo.py). All re-implemented TPU-first: channels-last,
static shapes, fused BN-free GroupNorm where the reference used BatchNorm in
eval-only paths, and a uniform ``(module, feat_dim)`` builder contract that
fixes the reference's fc_dim=128-for-everything bug
(reference: models/models.py:584, SURVEY.md §"Known reference bugs").
"""

from .encoders import build_encoder, ENCODER_REGISTRY
from .vggish import VGGish
from .resnet3d import ResNet3D, resnet3d10, resnet3d18, resnet3d34, resnet3d50
from .resnext3d import ResNeXt3D, resnext3d50, resnext3d101, resnext3d152
from .densenet3d import DenseNet3D, densenet3d121
from .slowfast import SlowFastR50, slowfast_pathways

__all__ = [
    "build_encoder", "ENCODER_REGISTRY", "VGGish",
    "ResNet3D", "resnet3d10", "resnet3d18", "resnet3d34", "resnet3d50",
    "ResNeXt3D", "resnext3d50", "resnext3d101", "resnext3d152",
    "DenseNet3D", "densenet3d121", "SlowFastR50", "slowfast_pathways",
]
