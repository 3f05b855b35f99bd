"""InfoNCE training loop (optax SGD + momentum, StepLR, early stop).

One jitted step does everything the reference spread across DataLoader
workers and per-batch .cuda() calls (reference: train.py:39-210): uint8
batch in, augment + normalize on device, dual-tower forward, InfoNCE
against column 0, SGD update. StepLR ÷10 at ``lr_steps`` epochs and early
stop at epoch loss < 0.07 match main.py:185-203,475-477.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from avtex.config import Config
from avtex.contrastive.infonce import info_nce_from_logits
from avtex.contrastive.model import ContrastiveTextures
from avtex.data.pipeline import SegmentBatches, prefetch
from avtex.data.preprocess import augment_and_preprocess, preprocess_clip
from avtex.nn.slowfast import slowfast_pathways
from avtex.obs import AverageMeter


class TrainConfigError(ValueError):
    pass


def _prep_pathways(frames: jnp.ndarray, rng, size: int, slowfast: bool,
                   train: bool):
    """uint8 windows -> encoder input (clip tensor or slowfast tuple)."""
    if train:
        x = augment_and_preprocess(frames, rng, size=size, slowfast=slowfast)
    else:
        x = preprocess_clip(frames, size=size, slowfast=slowfast)
    if slowfast:
        return slowfast_pathways(x)
    return x


def make_train_step(model: ContrastiveTextures, size: int,
                    slowfast: bool, augment: bool = True) -> Callable:
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    The optimizer lives in the TrainState (state.apply_gradients uses
    state.tx), so the step depends only on the model and geometry.
    ``augment=False`` trains with the reference's exact preprocessing
    (resize+normalize only — its live path never augments, dataset.py:
    43-58); the default adds scale-jitter crop + h-flip + color jitter."""

    def loss_fn(params, batch, rng):
        kq, kt = jax.random.split(rng)
        q_in = _prep_pathways(batch["q_frames"], kq, size, slowfast,
                              augment)
        tf = batch["t_frames"]
        b, n = tf.shape[:2]
        t_flat = _prep_pathways(tf.reshape((-1,) + tf.shape[2:]), kt, size,
                                slowfast, augment)
        if slowfast:
            t_in = tuple(p.reshape((b, n) + p.shape[1:]) for p in t_flat)
        else:
            t_in = t_flat.reshape((b, n) + t_flat.shape[1:])
        logits = model.apply(params, q_in, t_in,
                             batch.get("q_audio"), batch.get("t_audio"))
        loss = info_nce_from_logits(logits)
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == 0)
        return loss, acc

    @jax.jit
    def step(state: train_state.TrainState, batch: Dict, rng: jax.Array):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, "acc": acc}

    return step


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """StepLR(step_size=lr_steps, gamma=0.1) decays EVERY lr_steps epochs
    (main.py:446,474) — staircase exponential decay is exactly that; a
    single-boundary schedule would run epochs past 2*lr_steps at 10x the
    reference's LR."""
    return optax.exponential_decay(
        cfg.lr, transition_steps=steps_per_epoch * cfg.lr_steps,
        decay_rate=0.1, staircase=True)


def create_state(model: ContrastiveTextures, cfg: Config,
                 sample_batch: Dict, steps_per_epoch: int,
                 slowfast: bool) -> train_state.TrainState:
    """Initialize params + SGD/StepLR optimizer (reference: main.py:440-446).

    The optimizer is embedded in the returned TrainState (state.tx)."""
    rng = jax.random.key(cfg.seed)
    q_in = _prep_pathways(jnp.asarray(sample_batch["q_frames"][:1]), rng,
                          cfg.img_size, slowfast, False)
    tf = sample_batch["t_frames"][:1, :2]
    t_flat = _prep_pathways(jnp.asarray(tf.reshape((-1,) + tf.shape[2:])),
                            rng, cfg.img_size, slowfast, False)
    if slowfast:
        t_in = tuple(p.reshape((1, 2) + p.shape[1:]) for p in t_flat)
    else:
        t_in = t_flat.reshape((1, 2) + t_flat.shape[1:])
    q_audio = (jnp.asarray(sample_batch["q_audio"][:1])
               if "q_audio" in sample_batch else None)
    t_audio = (jnp.asarray(sample_batch["t_audio"][:1, :2])
               if "t_audio" in sample_batch else None)
    params = jax.jit(model.init)(rng, q_in, t_in, q_audio, t_audio)
    if cfg.model_type == 2:
        # reference starts the audio tower from pretrained VGGish
        # (main.py:338); warns loudly when the checkpoint is absent.
        from avtex.utils.convert import maybe_load_vggish_into_model
        params, _ = maybe_load_vggish_into_model(
            params, context="model_type=2 training init")

    schedule = make_lr_schedule(cfg, steps_per_epoch)
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(schedule, momentum=cfg.momentum),
    )
    state = train_state.TrainState.create(
        apply_fn=model.apply, params=params, tx=tx)
    return state


def train_video(cfg: Config, frames: np.ndarray,
                audio_examples: Optional[np.ndarray] = None,
                logger=None, epochs: Optional[int] = None,
                log_every: Optional[int] = None,
                resume: Optional[str] = None,
                ckpt_dir: Optional[str] = None,
                ckpt_name: Optional[str] = None
                ) -> Tuple[train_state.TrainState, List[float]]:
    """Train the contrastive model on one video (reference: main.py:450-477).

    Returns (final state, per-epoch mean losses). Early-stops when epoch
    loss < cfg.early_stop_loss. ``resume``: checkpoint path to restore
    params/opt-state/epoch/best-loss from before continuing (reference:
    main.py:356-370 — plus opt state, which the reference drops). When
    ``ckpt_dir``/``ckpt_name`` are given, saves ``_latest`` every epoch and
    copies to ``_best`` on improvement (reference: main.py:461-483).
    """
    if cfg.model_type == 2 and audio_examples is None:
        raise TrainConfigError("model_type=2 requires audio examples")
    # remat: checkpoint encoder blocks during training — the SlowFast@224
    # grad step OOMs a 16 GB chip at 20 clips without it, and remat costs
    # nothing on inference-only jits (no backward to rematerialize for).
    model = ContrastiveTextures(arch=cfg.enc_arch, model_type=cfg.model_type,
                                temp=cfg.temp, remat=True)
    slowfast = cfg.enc_arch == "slowfast"
    train_stride = (cfg.train_stride if cfg.train_stride is not None
                    else cfg.stride)
    data = SegmentBatches(frames, cfg.window, train_stride,
                          n_negs=cfg.n_negs, batch_size=cfg.batch_size,
                          audio_examples=(audio_examples
                                          if cfg.model_type == 2 else None),
                          seed=cfg.seed)
    # A ragged tail batch would trigger a full recompile of the train step;
    # drop it whenever at least one full batch remains (static shapes rule).
    data.drop_last = data.n_train >= data.batch_size
    sample = next(data.epoch())
    state = create_state(model, cfg, sample, len(data), slowfast)

    start_epoch = cfg.start_epoch or 0
    best = float("inf")
    if resume:
        from .checkpoint import restore_checkpoint
        payload = restore_checkpoint(resume, state.params, state.opt_state)
        if payload is None:
            # the reference asserts the file exists (main.py:357) — a
            # typoed --resume must not silently retrain from scratch and
            # overwrite the existing checkpoints
            raise FileNotFoundError(f"No checkpoint found at '{resume}'")
        state = state.replace(params=payload["state"])
        if "opt_state" in payload:
            state = state.replace(opt_state=payload["opt_state"],
                                  step=int(payload["step"]))
        if cfg.start_epoch is None:
            # an explicit --start_epoch wins over the checkpoint's
            # (reference: main.py:362-363)
            start_epoch = int(payload["epoch"])
        best = float(payload["best_loss"])

    if ckpt_dir and ckpt_name is None:
        raise TrainConfigError("ckpt_dir requires ckpt_name")
    step_fn = make_train_step(model, cfg.img_size, slowfast,
                              augment=cfg.augment)
    rng_base = jax.random.key(cfg.seed + 1)
    if log_every is None:
        log_every = cfg.log_freq  # -lf (reference: train.py:166)

    history: List[float] = []
    n_epochs = epochs if epochs is not None else cfg.epochs
    global_step = start_epoch * len(data)
    for epoch in range(start_epoch, n_epochs):
        meter = AverageMeter()
        batch_meter = AverageMeter()
        t0 = time.perf_counter()
        t_step = t0
        epoch_i = 0
        # Counter-based RNG (fold_in per step) + epoch-seeded data order: a
        # resumed run replays the exact uninterrupted stream.
        # cfg.workers (-j) sets prefetch depth; 0 keeps double-buffering.
        for batch in prefetch(data.epoch(epoch), depth=max(2, cfg.workers)):
            krng = jax.random.fold_in(rng_base, global_step)
            state, metrics = step_fn(state, batch, krng)
            loss = float(metrics["loss"])
            meter.update(loss, len(batch["q_ids"]))
            batch_meter.update(time.perf_counter() - t_step)
            t_step = time.perf_counter()
            if epoch_i % cfg.print_freq == 0:  # reference: train.py:150-163
                print(f"Epoch: [{epoch}][{epoch_i}/{len(data)}]\t"
                      f"Time {batch_meter.val:.3f} ({batch_meter.avg:.3f})\t"
                      f"Loss {loss:.4f} ({meter.avg:.4f})")
            epoch_i += 1
            if logger is not None and global_step % log_every == 0:
                logger.log_scalar(loss, "train/iter_loss", global_step)
                logger.log_scalar(float(metrics["acc"]), "train/iter_acc",
                                  global_step)
                # query/positive frame strips (reference: train.py:166-200)
                logger.log_video(batch["q_frames"][0], "train/query",
                                 global_step)
                logger.log_video(batch["t_frames"][0, 0], "train/positive",
                                 global_step)
            global_step += 1
        history.append(meter.avg)
        is_best = meter.avg < best
        best = min(best, meter.avg)
        if ckpt_dir:  # latest every epoch, best on improvement (main.py:461-483)
            from .checkpoint import save_checkpoint
            save_checkpoint(ckpt_dir, ckpt_name, state.params, epoch + 1,
                            cfg.enc_arch, best, is_best=is_best,
                            opt_state=state.opt_state, step=int(state.step))
        if logger is not None:
            logger.log_scalar(meter.avg, "train/epoch_loss", epoch)
            logger.log_scalar(time.perf_counter() - t0, "train/epoch_time_s",
                              epoch)
        if meter.avg < cfg.early_stop_loss:  # reference: main.py:475-477
            break
    return state, history
