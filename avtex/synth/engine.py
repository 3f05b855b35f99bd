"""Device-side synthesis: the transition walk as one ``lax.scan``.

Per-step semantics reproduce reference validate.py exactly:

1. candidates = [pos] + all segments except {q_id, pos}, pos = min(q_id+1,
   L-1) (validate.py:369-377) — as a mask over all L ids (when pos == q_id,
   i.e. q_id == L-1, every id is a candidate, including q_id — the
   reference's mask removes the same row twice).
2. raw scores = cosine/temp logits; output /= output.sum() over candidates
   (validate.py:524 — sum-normalize, NOT softmax).
3. driving audio: output = alpha * P_video + (1-alpha) * P_audio, with
   P_audio sum-normalized the same way (validate.py:524-527).
4. zero entries below max - threshold*max; uniform sample over survivors
   (validate.py:554-571).
5. jump iff chosen != q_id + 1 (validate.py:585).

The whole walk compiles to one kernel; per-step stats (entropy, survivor
count, greedy-argmax agreement) are returned for observability parity.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SynthesisResult:
    """Host-side view of a completed walk."""

    seed_id: int
    indices: np.ndarray        # [steps] chosen segment ids
    jumps: np.ndarray          # [steps] bool, chosen != prev+1
    entropies: np.ndarray      # [steps]
    nonzero_counts: np.ndarray  # [steps]
    greedy_ids: np.ndarray     # [steps] argmax (non-random) choice
    pos_prob: np.ndarray       # [steps] normalized score of the positive


def num_synthesis_steps(max_length: int, window: int, stride: int) -> int:
    """Steps for ``while len(new_frames) < max_length``: the first chosen
    segment emits its full W frames, every later one its last S frames —
    the slice [q*S+(W-S), q*S+W) (reference: validate.py:580-613)."""
    if max_length <= window:
        return 1
    return 1 + -(-(max_length - window) // stride)


def seed_segment(audio_examples: Optional[jnp.ndarray],
                 driving_example: Optional[jnp.ndarray],
                 default: int = 10,
                 num_segments: Optional[int] = None) -> int:
    """Initial q_id: fixed 10, or best audio match to the first driving
    example (reference: validate.py:218-242).

    Exact reference semantics (pinned by test_reference_parity):
    the scan runs over segment ids only (``for choice in
    all_segment_ids`` — rows of ``audio_examples`` past ``num_segments``
    are never considered), starts from ``q_id = 0, max_sim = 0`` and
    updates on strictly-greater similarity — so ties keep the earliest
    id, and if no segment has positive cosine similarity the seed stays
    0 (NOT the most-similar negative match).
    """
    if driving_example is None or audio_examples is None:
        return default
    src = audio_examples.reshape(audio_examples.shape[0], -1)
    if num_segments is not None:
        src = src[:num_segments]
    src = src / (jnp.linalg.norm(src, axis=1, keepdims=True) + 1e-12)
    d = driving_example.reshape(-1)
    d = d / (jnp.linalg.norm(d) + 1e-12)
    sims = src @ d
    best = int(jnp.argmax(sims))
    return best if float(sims[best]) > 0.0 else 0


@functools.partial(jax.jit, static_argnames=("num_steps",))
def _walk(q_table: jnp.ndarray, t_table: jnp.ndarray, true_l: jnp.ndarray,
          temp: float, audio_logits: Optional[jnp.ndarray],
          seed_id: int, num_steps: int, alpha: float, threshold: float,
          rng: jax.Array):
    # The [L, L] logit matrix fuses into the same program as the scan —
    # one dispatch for the whole walk. Tables arrive padded to a bucket
    # size; ``true_l`` (traced) masks the padding, so one compiled program
    # serves every video in the bucket (walk compiles are minutes on
    # remote-attached TPUs).
    video_logits = jax.lax.dot_general(
        q_table, t_table,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) / temp
    L = video_logits.shape[0]
    ids = jnp.arange(L)
    valid = ids < true_l

    def step(carry, inp):
        q_id = carry
        key, audio_row = inp
        pos = jnp.minimum(q_id + 1, true_l - 1)
        cand = ((ids != q_id) | (pos == q_id)) & valid

        def norm(row):
            row = jnp.where(cand, row, 0.0)
            return row / jnp.sum(row)

        p = norm(video_logits[q_id])
        if audio_row is not None:
            p = alpha * p + (1.0 - alpha) * norm(audio_row)
        p = jnp.where(cand, p, -jnp.inf)

        mx = jnp.max(p)
        survive = p >= (mx - threshold * mx)
        # survivors among candidates only; values below cut -> not chosen
        p_thresh = jnp.where(survive & cand, p, 0.0)
        n_nz = jnp.sum(p_thresh != 0.0)
        p_renorm = p_thresh / jnp.sum(p_thresh)
        entropy = jnp.abs(jnp.sum(jnp.where(p_renorm > 0,
                                            jnp.log(jnp.where(p_renorm > 0,
                                                              p_renorm, 1.0)),
                                            0.0)) / jnp.maximum(n_nz, 1))

        # Uniform over survivors (exponential-race trick).
        noise = jax.random.uniform(key, (L,))
        nxt = jnp.argmax(jnp.where(p_thresh > 0.0, noise, -1.0))
        out = {
            "idx": nxt,
            "jump": nxt != q_id + 1,
            "entropy": entropy,
            "nonzero": n_nz,
            "greedy": jnp.argmax(jnp.where(cand, p, -jnp.inf)),
            "pos_prob": p[pos],
        }
        return nxt, out

    keys = jax.random.split(rng, num_steps)
    xs = (keys, audio_logits if audio_logits is not None else None)
    _, outs = jax.lax.scan(step, jnp.asarray(seed_id), xs)
    return outs


def synthesize_indices(q_table: jnp.ndarray, t_table: jnp.ndarray,
                       num_steps: int, temp: float = 0.1,
                       threshold: float = 0.0, alpha: float = 0.5,
                       audio_logits: Optional[jnp.ndarray] = None,
                       seed_id: int = 10,
                       rng: Optional[jax.Array] = None) -> SynthesisResult:
    """Run the full walk from precomputed embedding tables (device scan).

    When to use which walk (measured on v5e, steps=299, same process):
    the host walk (synthesize_indices_host, the pipeline default) costs
    43 ms at L=297 vs 151 ms here — per-step O(L) numpy beats a device
    round trip at typical video lengths, with zero compile. This fused
    lax.scan wins from roughly L >= 1k (L=2048: 152 ms vs 402 ms host)
    and in warm serving processes where its one-time compile is already
    paid and the [L, L] logit matrix should never leave the device.

    Args:
      q_table: [L, D] query-tower embeddings (L2-normalized).
      t_table: [L, D] target-tower embeddings.
      num_steps: transitions to generate (see num_synthesis_steps).
      audio_logits: optional [num_steps, L] driving-audio rows (already
        /temp), one per step (reference: validate.py:416-420).
    """
    if rng is None:
        rng = jax.random.key(0)

    # Shape bucketing: pad the segment axis to a multiple of 128 and the
    # step count to a multiple of 64 so recompiles amortize across videos.
    L, D = q_table.shape
    l_pad = (-L) % 128
    if l_pad:
        q_table = jnp.pad(q_table, ((0, l_pad), (0, 0)))
        t_table = jnp.pad(t_table, ((0, l_pad), (0, 0)))
    steps_pad = -(-num_steps // 64) * 64
    if audio_logits is not None:
        audio_logits = jnp.pad(
            audio_logits,
            ((0, steps_pad - audio_logits.shape[0]), (0, l_pad)),
            mode="edge")

    # The persistent XLA cache never serves this scan program on the
    # remote backend, so fresh processes used to pay the full walk
    # compile. AOT executable persistence (avtex/utils/aot.py) closes
    # that: the compiled walk for each (L-bucket, steps-bucket, ±audio)
    # is serialized once and fresh-process loads take ~0.2 s (measured,
    # tools/walk_aot_probe.py). Opt out with AVTEX_WALK_AOT=0.
    import os
    if os.environ.get("AVTEX_WALK_AOT", "1") == "1":
        from avtex.utils.aot import cached_compile
        Lp, D = q_table.shape
        dyn = (q_table, t_table, jnp.int32(L), temp, audio_logits, seed_id)
        key = (f"walk-v1-L{Lp}-D{D}-steps{steps_pad}"
               f"-audio{int(audio_logits is not None)}-{q_table.dtype}")
        try:
            exe = cached_compile(
                key,
                lambda: jax.jit(_walk.__wrapped__,
                                static_argnames=("num_steps",))
                .lower(*dyn, num_steps=steps_pad, alpha=alpha,
                       threshold=threshold, rng=rng).compile())
            outs = exe(*dyn, alpha=alpha, threshold=threshold, rng=rng)
        except Exception as e:
            # e.g. args arrive with a sharding the cached executable was
            # not built for — correctness beats the warm start.
            import sys
            print(f"[avtex.synth] WARNING: AOT walk path failed "
                  f"({type(e).__name__}: {e}); falling back to plain jit "
                  f"(full walk compile)", file=sys.stderr, flush=True)
            outs = _walk(q_table, t_table, jnp.int32(L), temp,
                         audio_logits, seed_id, steps_pad, alpha,
                         threshold, rng)
    else:
        outs = _walk(q_table, t_table, jnp.int32(L), temp, audio_logits,
                     seed_id, steps_pad, alpha, threshold, rng)
    sl = slice(0, num_steps)
    return SynthesisResult(
        seed_id=seed_id,
        indices=np.asarray(outs["idx"])[sl],
        jumps=np.asarray(outs["jump"])[sl],
        entropies=np.asarray(outs["entropy"])[sl],
        nonzero_counts=np.asarray(outs["nonzero"])[sl],
        greedy_ids=np.asarray(outs["greedy"])[sl],
        pos_prob=np.asarray(outs["pos_prob"])[sl],
    )


@jax.jit
def _logit_matrix(q_table, t_table):
    return jax.lax.dot_general(
        q_table, t_table, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def synthesize_indices_host(q_table, t_table, num_steps: int,
                            temp: float = 0.1, threshold: float = 0.0,
                            alpha: float = 0.5, audio_logits=None,
                            seed_id: int = 10,
                            rng: Optional[np.random.Generator] = None
                            ) -> SynthesisResult:
    """Host-side walk with the exact per-step procedure of the reference.

    The logit matrix is one device matmul; the per-step threshold/sample
    math is O(L) numpy following validate.py line by line: candidates in
    the reference's ORDER (positive first, then all other ids ascending,
    validate.py:369-377), sum-normalize (:524), alpha blend (:525-527),
    threshold + renormalize (:554-558), ``choice`` over surviving
    *positions* (:569-571). Given the same seed/rng stream as a reference
    run, the transition indices are bit-identical. ``rng`` may be a
    ``np.random.Generator``, a legacy ``RandomState``, or the ``np.random``
    module itself (what the reference's unseeded global calls use).

    This path has NO compile cost for new (L, steps) shapes (the scan
    program is minutes to compile via remote-attached TPUs and is not
    servable from the persistent cache).
    """
    if rng is None:
        rng = np.random.default_rng(0)
    logits = np.asarray(_logit_matrix(q_table, t_table)) / temp
    audio = None if audio_logits is None else np.asarray(audio_logits)
    L = logits.shape[0]
    ids = np.arange(L)

    q_id = int(seed_id)
    idxs, jumps, ents, nnzs, greedy, pos_probs = [], [], [], [], [], []
    for step_i in range(num_steps):
        pos = min(q_id + 1, L - 1)
        mask = np.ones(L, dtype=bool)
        mask[[q_id, pos]] = False
        ordering = np.concatenate(([pos], ids[mask]))

        out = logits[q_id][ordering].astype(np.float64)
        out = out / out.sum()                        # validate.py:524
        if audio is not None:
            oa = audio[step_i][ordering].astype(np.float64)
            out = alpha * out + (1.0 - alpha) * (oa / oa.sum())
        greedy.append(int(ordering[np.argmax(out)]))
        pos_probs.append(float(out[0]))

        mx = out.max()
        out[out < mx - threshold * mx] = 0.0         # validate.py:554
        nz = np.flatnonzero(out)
        renorm = out[nz] / out[nz].sum()             # validate.py:558
        ents.append(float(abs(np.log(renorm).mean())))
        nnzs.append(len(nz))
        rdm = rng.choice(nz)                         # validate.py:569-571
        nxt = int(ordering[int(rdm)])
        jumps.append(nxt != q_id + 1)
        idxs.append(nxt)
        q_id = nxt

    return SynthesisResult(
        seed_id=int(seed_id),
        indices=np.asarray(idxs), jumps=np.asarray(jumps),
        entropies=np.asarray(ents), nonzero_counts=np.asarray(nnzs),
        greedy_ids=np.asarray(greedy), pos_prob=np.asarray(pos_probs))


def driving_audio_logits(source_audio_feats: jnp.ndarray,
                         driving_audio_feats: jnp.ndarray,
                         temp: float = 0.1) -> jnp.ndarray:
    """[steps, L] cosine/temp rows between driving examples and source
    segments (reference: models.py:420-439 "VGG" branch / :445-455 "Mel")."""
    s = source_audio_feats / (jnp.linalg.norm(source_audio_feats, axis=1,
                                              keepdims=True) + 1e-12)
    d = driving_audio_feats / (jnp.linalg.norm(driving_audio_feats, axis=1,
                                               keepdims=True) + 1e-12)
    return (d @ s.T).astype(jnp.float32) / temp
