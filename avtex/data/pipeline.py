"""Host-side training data pipeline.

Replaces the reference's ``AudioVideoSegments`` Dataset + DataLoader worker
processes (reference: dataset/dataset.py:24-253, main.py:317-323) with a
zero-copy windowing sampler and a prefetch thread. The host only slices
uint8 windows out of the decoded video (stride-tricks view -> one gather per
batch); all float work happens on device (avtex/data/preprocess.py).

Batch contract (numpy, uint8 frames):
  q_frames  [B, W, H, W_px, 3]        query windows
  t_frames  [B, 1+negs, W, H, W_px, 3] positive at index 0, then negatives
  q_audio   [B, mel_frames, 64]        query segment's log-mel example
  t_audio   [B, 1+negs, mel_frames, 64]
  q_ids     [B] int
Matching reference semantics: positive = idx+1, hard negatives overwrite the
head of the random draw (dataset.py:183-190), one audio example per segment
clipped to the last available (validate.py:345).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from avtex.contrastive.segments import gather_windows, sample_negatives


class SegmentBatches:
    """Iterable over epochs of contrastive training batches."""

    def __init__(self, frames: np.ndarray, window: int, stride: int,
                 n_negs: int = 20, batch_size: int = 8,
                 audio_examples: Optional[np.ndarray] = None,
                 seed: int = 0, drop_last: bool = False) -> None:
        # Contiguous copy once so the stride-tricks window view (and the
        # per-batch gathers off it) never alias a strided source like a
        # subsampled frames[::k].
        self.frames = np.ascontiguousarray(frames)
        self.window = window
        self.stride = stride
        self.n_negs = n_negs
        self.batch_size = batch_size
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        # Windows view covers ids [0, n_train] (the last id appears only as
        # positive/negative, matching reference __len__ semantics).
        from avtex.contrastive.segments import require_segments
        self.n_train = require_segments(len(self.frames), window, stride,
                                        "train")
        self.windows = gather_windows(self.frames, window, stride, "val")
        self.audio = audio_examples
        self.max_audio_id = (len(audio_examples) - 1
                             if audio_examples is not None else 0)
        self.drop_last = drop_last

    def __len__(self) -> int:
        if self.drop_last:
            return self.n_train // self.batch_size
        return -(-self.n_train // self.batch_size)

    def _audio_for(self, seg_ids: np.ndarray) -> np.ndarray:
        ids = np.minimum(seg_ids, self.max_audio_id)
        return self.audio[ids]

    def epoch(self, epoch: Optional[int] = None) -> Iterator[dict]:
        """One epoch of batches. With ``epoch`` given, ordering/negatives
        come from a counter-based rng seeded (seed, epoch) — a resumed run
        replays the identical stream (checkpoint/resume exactness); without
        it the stateful rng keeps legacy behavior."""
        rng = (self.rng if epoch is None
               else np.random.default_rng((self.seed, epoch)))
        order = rng.permutation(self.n_train)
        for b0 in range(0, self.n_train, self.batch_size):
            ids = order[b0:b0 + self.batch_size]
            if self.drop_last and len(ids) < self.batch_size:
                break
            t_ids = np.stack([
                np.concatenate((
                    [i + 1],
                    sample_negatives(i, self.n_train, self.n_negs, rng)))
                for i in ids])
            batch = {
                "q_frames": self.windows[ids],
                "t_frames": self.windows[t_ids],
                "q_ids": ids.astype(np.int64),
            }
            if self.audio is not None:
                batch["q_audio"] = self._audio_for(ids)
                batch["t_audio"] = self._audio_for(t_ids)
            yield batch


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator in a daemon thread with a bounded queue
    (TPU equivalent of DataLoader workers — SURVEY.md §2.5 item 3).

    An exception in the wrapped iterator is re-raised in the CONSUMER —
    a failing epoch must not look like a short successful one (a
    swallowed first-batch failure would leave the epoch meter at 0.0,
    "beating" the early-stop threshold and checkpointing broken state
    as best)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    failure = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - relayed to consumer
            failure.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if failure:
                raise failure[0]
            return
        yield item
