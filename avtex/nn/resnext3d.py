"""3D ResNeXt video encoders (flax, NDHWC).

Grouped-convolution bottlenecks with cardinality 32, mid-width 2×
(reference: models/video_models/resnext3d.py:83-115). The reference exports
these under ``resnet50/101/152`` names making arch flag ``resnext50`` a
latent KeyError (reference: resnext3d.py:7, SURVEY.md §"Known reference
bugs"); here they are registered under their correct names.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

from .resnet3d import Bottleneck3D, ResNet3D


class ResNeXtBottleneck3D(Bottleneck3D):
    """Bottleneck with cardinality-32 grouped 3×3×3 and 2× mid width."""

    expansion = 2


class ResNeXt3D(ResNet3D):
    block: Any = ResNeXtBottleneck3D
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 32
    width: int = 128

    @property
    def feat_dim(self) -> int:
        return self.width * 8 * ResNeXtBottleneck3D.expansion


resnext3d50 = functools.partial(ResNeXt3D, layers=(3, 4, 6, 3))
resnext3d101 = functools.partial(ResNeXt3D, layers=(3, 4, 23, 3))
resnext3d152 = functools.partial(ResNeXt3D, layers=(3, 8, 36, 3))
