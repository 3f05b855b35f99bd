"""Single dataclass config for the whole framework.

Mirrors the reference's argparse surface (reference:
contrastive_video_textures/main.py:41-296) so every flag a user of the
reference knows (-m, -w, -stride, -temp, -th, -alpha, -e, -da, ...) has a
field here with the same default. Derived-config rules are preserved:
``window = ceil(fps/2)`` and ``stride = ceil(fps/5)`` silently override the
user's -w/-stride exactly as the reference does
(reference: dataset/dataset.py:79-80, main.py:515-516).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import List, Optional, Sequence


@dataclasses.dataclass
class Config:
    """Experiment configuration. Field names follow the reference flags."""

    # --- model / encoder ------------------------------------------------- #
    enc_arch: str = "resnet18"          # -ea: resnet10/18/34/50, resnext50/101/152, densenet121, slowfast
    model_type: int = 1                 # -m: (1) video textures (2) audio+video textures
    emb_dim: int = 128                  # embedding dim of every encoder head (our clean contract)
    temp: float = 0.1                   # -temp: softmax temperature
    threshold: float = 0.0              # -th: survivor threshold (max - th*max)
    l2: bool = True                     # -l2: L2-normalize embeddings
    img_size: int = 224                 # -size: input resolution
    dropout: float = 0.5

    # --- data ------------------------------------------------------------ #
    vdata: Optional[str] = None         # -vdata: video dataset dir of <name>.mp4
    adata: Optional[str] = None         # -adata: audio dataset dir of <name>.wav
    dadata: str = "audio/target"        # -dadata: driving-audio dir
    video_list: Optional[List[str]] = None  # -vl
    fps: float = 30.0                   # (overwritten from container metadata at eval)
    fps_override: Optional[float] = None  # -fps: user override of container fps
    subsample_rate: int = 1             # -subsample
    window: int = 20                    # -w  (auto-derived: ceil(fps/2))
    stride: int = 4                     # -stride (auto-derived: ceil(fps/5))
    train_stride: Optional[int] = None  # -train_stride (None => derived stride;
                                        # the reference's dataset always uses the
                                        # fps-derived stride for training too,
                                        # dataset/dataset.py:79-80)
    n_negs: int = 20                    # -negs: negatives per query at train time

    # --- synthesis ------------------------------------------------------- #
    new_video_length: int = 30          # -nvl: seconds of texture to synthesize
    alpha: float = 0.5                  # -alpha: video-vs-audio blend weight
    interpolation: bool = True          # -nintp stores False
    # Training augmentation (scale-jitter crop + h-flip + color jitter) is
    # an avtex ADDITION: the reference's live training path preprocesses
    # with resize+normalize only (dataset.py:43-58; its ColorJitter is
    # commented out and transform.py is dead code). -noaug trains with the
    # reference's exact preprocessing instead.
    augment: bool = True                # -noaug stores False
    SF: int = 5                         # -SF: SuperSloMo factor at jumps
    frames_bar: bool = False            # -fb: burn red position bar into frames
    norm: str = "group"                 # -norm: encoder norm ("group" for
                                        # training; "affine" = folded
                                        # frozen-BN for pretrained imports,
                                        # avtex extension)
    vcam: bool = False                  # -vcam: CAM overlay videos (the
                                        # reference reads args.vcam but never
                                        # defines the flag — validate.py:299
                                        # crashes as shipped; defined here)
    driving_audio: Optional[List[str]] = None  # -da: list of driving audio names
    da_feats: str = "VGG"               # -daf: VGG | Contrastive | Mel
    daf_resume: Optional[List[str]] = None     # -daf_resume
    seed: int = 0                       # RNG seed (counter-based jax.random; the
                                        # reference used unseeded np.random)
    start_segment: int = 10             # reference seeds synthesis at segment 10
                                        # (reference: validate.py:219)

    # --- training -------------------------------------------------------- #
    epochs: int = 60
    start_epoch: Optional[int] = None
    batch_size: int = 32                # -bs
    mini_batchsize: int = 150           # -mbs: target chunk size when scoring
    lr: float = 1e-2                    # reference default 10e-3 (main.py:186)
    lr_steps: int = 30                  # StepLR decay epoch
    momentum: float = 0.9
    weight_decay: float = 1e-4
    early_stop_loss: float = 0.07       # reference: main.py:475
    workers: int = 0                    # -j: prefetch queue depth (min 2 used)

    # --- bookkeeping ------------------------------------------------------ #
    print_freq: int = 5
    log_freq: int = 10
    val_freq: int = 5
    resume: str = ""
    evaluate: bool = False              # -e
    # The reference hard-asserts when the auto-derived eval checkpoint is
    # missing (reference: main.py:536); set this to synthesize with
    # random-init params anyway (demos / smoke tests).
    allow_random_init: bool = False     # -allow_random_init
    visualize_evaluate: bool = False    # -ve
    logdir: str = "./logs"
    logname: str = "exp"
    results_folder: str = "results"
    ckpt: str = "./ckpt"

    # --- TPU-specific ----------------------------------------------------- #
    mesh_shape: Optional[Sequence[int]] = None  # None => all local devices on 'data'
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"

    # ---------------------------------------------------------------------- #

    def derive_geometry(self, fps: float) -> "Config":
        """Apply the reference's fps -> (window, stride) rule.

        The reference silently overwrites -w/-stride from video fps
        (reference: dataset/dataset.py:79-80), and uses the same derived
        stride for training segmentation (its -train_stride flag is dead);
        an explicit -fps flag overrides the container fps (main.py:76).
        Returns a new Config.
        """
        if self.fps_override is not None:
            fps = self.fps_override
        stride = math.ceil(fps / 5)
        return dataclasses.replace(
            self,
            fps=fps,
            window=math.ceil(fps / 2),
            stride=stride,
            train_stride=(self.train_stride if self.train_stride is not None
                          else stride),
        )

    def train_logname(self, video_name: str) -> str:
        """Experiment-identity string for train runs (reference: main.py:398-415)."""
        vd = os.path.split(self.vdata)[-1] if self.vdata else "none"
        return (
            f"{self.logname}_model_{self.model_type}_vd_{vd}_vn_{video_name}"
            f"_bs_{self.batch_size}_negs_{self.n_negs}_w_{self.window}"
            f"_stride_{self.stride}_temp_{self.temp}_th_{self.threshold}"
            f"_enca_{self.enc_arch}_subr_{self.subsample_rate}_eval_False"
        )

    def eval_logname(self, video_name: str) -> str:
        """Experiment-identity string for eval runs (reference: main.py:378-396)."""
        vd = os.path.split(self.vdata)[-1] if self.vdata else "none"
        name = (
            f"{self.logname}_model_{self.model_type}_vd_{vd}_vn_{video_name}"
            f"_bs_{self.batch_size}_w_{self.window}"
            f"_stride_{self.stride}_temp_{self.temp}_th_{self.threshold}"
            f"_enca_{self.enc_arch}_subr_{self.subsample_rate}_eval_True"
        )
        if self.driving_audio is not None:
            name += f"alpha_{self.alpha}_daf_{self.da_feats}"
        return name

    def default_ckpt_path(self, video_name: str) -> str:
        """Auto-derived best-checkpoint path used when --resume is empty
        (reference: main.py:520-534)."""
        vd = os.path.split(self.vdata)[-1] if self.vdata else "none"
        return os.path.join(
            self.ckpt,
            f"exp_model_{self.model_type}_vd_{vd}_vn_{video_name}"
            f"_bs_{self.batch_size}_negs_{self.n_negs}_w_{self.window}"
            f"_stride_{self.stride}_temp_0.1_th_0.0_enca_{self.enc_arch}"
            f"_subr_{self.subsample_rate}_eval_False_best",
        )


@dataclasses.dataclass
class ClassicConfig:
    """Config for the classic Schödl baseline
    (reference: baselines/classic_video_textures/video_textures.py:457-565)."""

    model_type: int = 1                 # -m: (1) Classic (2) Classic+ (3) Classic++
    vdata: Optional[str] = None
    adata: Optional[str] = None
    video_list: Optional[List[str]] = None
    feats: str = "RGB"                  # -f: RGB | ResNet | ResNet_VGGish
    slow: bool = False                  # -s: tile the O(N^2) matrix (memory cap)
    fps: float = 30.0
    sr: int = 22050
    filter_size: int = 40               # -fs: diagonal binomial filter size
    batch_size: int = 64                # -bs: tile size in slow mode
    stride: int = 4
    new_video_length: int = 30          # -nvl (seconds)
    interpolation: bool = True          # -nintp
    SF: int = 3
    sigma: float = 0.5
    threshold: float = 0.08             # -t
    sigmas: Sequence[float] = (4.45, 4.5, 4.52, 4.55, 4.58)  # sweep (video_textures.py:250)
    q_alpha: float = 0.997              # value-iteration discount (q_learning.py:31)
    q_p: float = 0.7                    # future-cost exponent (q_learning.py:34)
    q_eps: float = 1e-2                 # convergence epsilon (q_learning.py:39)
    start_frame: int = 100              # sampler seed frame (video_textures.py:43)
    seed: int = 0
    results_folder: str = "results_classic"
    logdir: str = "./logs"
    logname: str = "exp_classic"
