"""Synthesis engine tests: walk semantics vs a numpy oracle, stitching
contract, embed-once tables, SuperSloMo shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avtex.synth.engine import (driving_audio_logits, num_synthesis_steps,
                                seed_segment, synthesize_indices)
from avtex.synth.stitcher import stitch_texture, walk_frame_ids


def greedy_oracle(logits, seed_id, steps):
    """Reference semantics with threshold=0: only the argmax survives, so
    the walk is deterministic (validate.py:554-571 with th=0)."""
    L = logits.shape[0]
    out = []
    q = seed_id
    for _ in range(steps):
        pos = min(q + 1, L - 1)
        cand = np.ones(L, bool)
        if pos != q:
            cand[q] = False
        row = np.where(cand, logits[q], 0.0)
        row = row / row.sum()
        row = np.where(cand, row, -np.inf)
        q = int(np.argmax(row))
        out.append(q)
    return np.asarray(out)


@pytest.fixture
def tables(rng):
    L, D = 12, 16
    q = rng.standard_normal((L, D))
    t = rng.standard_normal((L, D))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(t)


def test_walk_threshold_zero_matches_greedy_oracle(tables):
    q, t = tables
    logits = np.asarray(q @ t.T) / 0.1
    res = synthesize_indices(q, t, num_steps=8, temp=0.1, threshold=0.0,
                             seed_id=3, rng=jax.random.key(1))
    expect = greedy_oracle(logits, 3, 8)
    np.testing.assert_array_equal(res.indices, expect)
    np.testing.assert_array_equal(res.greedy_ids, expect)
    assert np.all(res.nonzero_counts == 1)


def test_walk_never_chooses_query(tables):
    q, t = tables
    res = synthesize_indices(q, t, num_steps=40, threshold=0.6,
                             seed_id=0, rng=jax.random.key(0))
    L = q.shape[0]
    prev = 0
    for nxt in res.indices:
        if prev != L - 1:
            assert nxt != prev
        prev = int(nxt)


def test_walk_jump_flags(tables):
    q, t = tables
    res = synthesize_indices(q, t, num_steps=10, threshold=0.5,
                             seed_id=2, rng=jax.random.key(2))
    prev = 2
    for i, nxt in enumerate(res.indices):
        assert bool(res.jumps[i]) == (int(nxt) != prev + 1)
        prev = int(nxt)


def test_alpha_blend_extremes(tables, rng):
    q, t = tables
    L = q.shape[0]
    steps = 6
    audio = jnp.asarray(rng.standard_normal((steps, L))) / 0.1
    res_video = synthesize_indices(q, t, steps, threshold=0.0, alpha=1.0,
                                   audio_logits=audio, seed_id=3,
                                   rng=jax.random.key(3))
    res_plain = synthesize_indices(q, t, steps, threshold=0.0, seed_id=3,
                                   rng=jax.random.key(3))
    np.testing.assert_array_equal(res_video.indices, res_plain.indices)


def test_num_synthesis_steps():
    # W=15, S=6: first step 15 frames, then S=6/step (reference geometry @30fps)
    assert num_synthesis_steps(15, 15, 6) == 1
    assert num_synthesis_steps(16, 15, 6) == 2
    assert num_synthesis_steps(900, 15, 6) == 1 + -(-(900 - 15) // 6)


def test_seed_segment(rng):
    egs = jnp.asarray(rng.standard_normal((10, 100, 64)), jnp.float32)
    assert seed_segment(egs, None) == 10
    # driving example equal to source example 7 -> argmax at 7
    assert seed_segment(egs, egs[7]) == 7
    # only segment ids < num_segments are considered (validate.py:226
    # iterates all_segment_ids, not all audio rows)
    assert seed_segment(egs, egs[7], num_segments=5) != 7
    # no positive similarity -> seed stays 0 (validate.py:224 max_sim=0
    # with a strictly-greater update)
    ones = jnp.ones((6, 8), jnp.float32)
    assert seed_segment(ones, -jnp.ones((8,)), num_segments=6) == 0


def test_driving_audio_logits_shape(rng):
    s = jnp.asarray(rng.standard_normal((12, 32)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    out = driving_audio_logits(s, d, temp=0.1)
    assert out.shape == (5, 12)
    # diagonal self-similarity: identical features give max logit 1/temp
    out2 = driving_audio_logits(s, s[:3], temp=0.1)
    np.testing.assert_allclose(np.asarray(out2)[np.arange(3), np.arange(3)],
                               10.0, rtol=1e-4)


def test_walk_frame_ids_sequential():
    ids, jumps = walk_frame_ids([2, 3, 4], window=6, stride=2)
    # first: frames [4..10), then last S=2 of seg3: [10..12), seg4: [12..14)
    np.testing.assert_array_equal(ids, list(range(4, 14)))
    assert jumps == []


def test_walk_frame_ids_jump():
    ids, jumps = walk_frame_ids([2, 7], window=6, stride=2)
    assert jumps == [6]  # jump step starts after the 6 first-window frames
    np.testing.assert_array_equal(ids[6:], [18, 19])


def test_stitch_texture_no_jump(rng):
    video = (rng.random((40, 16, 16, 3)) * 255).astype(np.uint8)
    out = stitch_texture(video, [1, 2, 3], window=6, stride=2, sf=5,
                         source_audio=np.zeros(40 * 100, np.float32),
                         audio_sample_rate=1000, fps=10.0)
    assert out["jump_count"] == 0
    assert len(out["frames"]) == 6 + 2 + 2
    # intp: every frame + 2 held copies
    assert len(out["frames_intp"]) == 10 * 3
    assert len(out["audio"]) == 10 * 100


def test_stitch_texture_jump_interp(rng):
    video = (rng.random((60, 16, 16, 3)) * 255).astype(np.uint8)
    out = stitch_texture(video, [1, 10], window=6, stride=2, sf=5)
    assert out["jump_count"] == 1
    # plain: 6 + 2
    assert len(out["frames"]) == 8
    # intp: first 6 frames x3, then jump: remove 2 held, add 4 interp,
    # first new frame bare, second new frame x3  => 18-2+4+1+3 = 24
    assert len(out["frames_intp"]) == 24


def test_stitch_texture_subsample_expands_to_original_rate():
    """subsample_rate=2: the walk lives in subsampled ids but the texture
    emits the ORIGINAL frames — each walked id expands to 2 consecutive
    originals (reference: validate.py:621-630); audio follows the walked
    ids at apf = sr*sub/fps; the jump interpolates from the LAST original
    of the previous id (the reference's prev diff_ids[-1])."""
    video = np.arange(40, dtype=np.uint8)[:, None, None, None].repeat(
        4, 1).repeat(4, 2).repeat(3, 3)
    calls = []

    def fake_interp(a, b, n):
        calls.append((int(a[0, 0, 0]), int(b[0, 0, 0])))
        return [((a.astype(np.int32) + b) // 2).astype(np.uint8)] * n

    out = stitch_texture(
        video, [0, 1, 5], window=4, stride=2, sf=3, subsample_rate=2,
        interpolate=True, interp_fn=fake_interp,
        source_audio=np.arange(800, dtype=np.float32),
        audio_sample_rate=80, fps=8.0)
    # walked subsampled ids: [0,1,2,3] + [4,5] + jump [12,13]
    # -> originals [0..8) + [8..12) + [24..28)
    np.testing.assert_array_equal(
        out["frame_ids"], list(range(12)) + list(range(24, 28)))
    assert len(out["frames"]) == 16
    # frames come from the ORIGINAL video at the expanded ids
    assert int(out["frames"][9][0, 0, 0]) == 9
    assert int(out["frames"][12][0, 0, 0]) == 24
    # interp bridged original 11 (last of walked id 5) -> original 24
    assert calls == [(11, 24)]
    assert out["jump_count"] == 1
    # audio: apf = 80*2/8 = 20 samples per WALKED id, 8 walked ids
    assert len(out["audio"]) == 8 * 20
    # intp: 12 pre-jump originals x(1+hold) - hold removed at the jump
    # + (sf-1)=2 interp + first-after-jump bare + 3 more x(1+hold)
    assert len(out["frames_intp"]) == 12 * 2 - 1 + 2 + 1 + 3 * 2


@pytest.mark.slow
def test_slomo_interp_shapes():
    from avtex.synth.interp import init_slomo, make_interp_fn
    m, params = init_slomo(size=(32, 48))
    fn = make_interp_fn(m, params)
    f0 = np.zeros((32, 48, 3), np.uint8)
    f1 = np.full((32, 48, 3), 255, np.uint8)
    mids = fn(f0, f1, 4)
    assert mids.shape == (4, 32, 48, 3)


@pytest.mark.parametrize("threshold,with_audio",
                         [(0.25, False), (0.5, False),
                          (0.25, True), (0.5, True)])
def test_host_walk_matches_oracle_step(tables, rng, threshold, with_audio):
    """Seeded host walk vs tests/oracle.py::oracle_synthesis_step at th>0,
    with and without driving-audio rows: identical indices step by step
    (full walk semantics — threshold, sum-normalize, alpha blend, uniform
    choice over survivors; validate.py:369-572)."""
    from avtex.synth.engine import synthesize_indices_host
    from tests.oracle import oracle_synthesis_step

    q, t = tables
    temp, steps, alpha = 0.1, 40, 0.5
    logits = np.asarray(q @ t.T) / temp
    L = logits.shape[0]
    audio = None
    if with_audio:
        audio = (np.abs(rng.standard_normal((steps, L))) + 0.1
                 ).astype(np.float32)

    g1 = np.random.default_rng(42)
    expect = []
    q_id = 3
    for s in range(steps):
        q_id = oracle_synthesis_step(
            logits[q_id], q_id, L, threshold, g1,
            audio_row=None if audio is None else audio[s], alpha=alpha)
        expect.append(q_id)

    res = synthesize_indices_host(
        q, t, steps, temp=temp, threshold=threshold, alpha=alpha,
        audio_logits=None if audio is None else jnp.asarray(audio),
        seed_id=3, rng=np.random.default_rng(42))
    np.testing.assert_array_equal(res.indices, expect)


def test_host_walk_matches_device_greedy(tables):
    """threshold=0 -> deterministic; host and device walks must agree."""
    from avtex.synth.engine import synthesize_indices_host
    q, t = tables
    dev = synthesize_indices(q, t, num_steps=8, temp=0.1, threshold=0.0,
                             seed_id=3, rng=jax.random.key(1))
    host = synthesize_indices_host(q, t, num_steps=8, temp=0.1,
                                   threshold=0.0, seed_id=3,
                                   rng=np.random.default_rng(1))
    np.testing.assert_array_equal(dev.indices, host.indices)
    np.testing.assert_array_equal(dev.jumps, host.jumps)
    np.testing.assert_array_equal(dev.nonzero_counts, host.nonzero_counts)
    np.testing.assert_allclose(dev.entropies, host.entropies, atol=1e-4)


def test_slomo_checkpoint_autoload(tmp_path, monkeypatch):
    """maybe_make_slomo_interp_fn: finds SuperSloMo.ckpt via env var,
    converts it into the flax nets, and yields a working interp_fn; with
    no checkpoint it returns None (crossfade fallback, since random SloMo
    weights would be worse than crossfade)."""
    import torch

    from avtex.synth.interp import init_slomo
    from avtex.utils.convert import maybe_make_slomo_interp_fn

    monkeypatch.chdir(tmp_path)
    assert maybe_make_slomo_interp_fn() is None

    # synthesize a torch state dict with exactly the flax nets' conv
    # shapes in CALL order (what convert_slomo pairs on), split into the
    # real checkpoint's {state_dictFC, state_dictAT} layout
    import jax
    import jax.numpy as jnp

    from avtex.utils.convert import _module_call_order

    module, params = init_slomo(size=(32, 32))
    ex = jnp.zeros((1, 32, 32, 3))
    order = _module_call_order(module, params, ex, ex, (0.5,))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mods = {}
    for path, leaf in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        mods.setdefault("/".join(k for k in keys[:-1] if k != "params"),
                        {})[keys[-1]] = leaf
    fc, at = {}, {}
    for i, mod in enumerate(order):
        d = mods.get(mod, {})
        k = d.get("kernel")
        if k is None or k.ndim != 4:
            continue
        w = np.transpose(np.asarray(k), (3, 2, 0, 1))  # flax -> torch
        dest = fc if mod.startswith("flow_comp") else at
        dest[f"m.{i}.weight"] = torch.tensor(
            np.random.default_rng(i).standard_normal(w.shape)
            .astype(np.float32) * 0.05)
        if "bias" in d:
            dest[f"m.{i}.bias"] = torch.tensor(
                np.zeros(k.shape[-1], np.float32))
    torch.save({"state_dictFC": fc, "state_dictAT": at},
               tmp_path / "SuperSloMo.ckpt")
    monkeypatch.setenv("AVTEX_SLOMO_CKPT", str(tmp_path / "SuperSloMo.ckpt"))

    fn = maybe_make_slomo_interp_fn(size=(32, 32))
    assert fn is not None
    f0 = np.zeros((32, 32, 3), np.uint8)
    f1 = np.full((32, 32, 3), 200, np.uint8)
    mids = fn(f0, f1, 2)
    assert mids.shape == (2, 32, 32, 3) and mids.dtype == np.uint8


def test_device_walk_survivor_sampling_uniform():
    """The device walk's argmax-of-noise race (engine.py step) must sample
    uniformly over survivors (reference: validate.py:568-571 np.random.choice
    over nonzero entries). Seeded chi-square over the first-step choice."""
    import jax
    import jax.numpy as jnp
    from avtex.synth.engine import synthesize_indices

    L, D = 8, 4
    g = np.random.default_rng(7)
    # positive-quadrant embeddings: all similarities > 0, so the whole
    # candidate set survives at threshold=1.0 and normalization is stable
    q = np.abs(g.standard_normal((L, D))).astype(np.float32)
    t = np.abs(g.standard_normal((L, D))).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    qj, tj = jnp.asarray(q), jnp.asarray(t)

    # threshold=1.0 -> every positive-prob candidate survives; from seed 0
    # the candidate set is {1..7} (self excluded), so sampling must be
    # uniform over those with positive renormalized probability.
    seed = 0
    probs = (q @ t.T)[seed] / 0.1
    cand = np.ones(L, bool)
    cand[seed] = False
    row = np.where(cand, probs, 0.0)
    row = row / row.sum()
    survivors = np.flatnonzero(row > 0)

    n_trials = 400
    counts = np.zeros(L)
    for i in range(n_trials):
        r = synthesize_indices(qj, tj, 1, temp=0.1, threshold=1.0,
                               seed_id=seed, rng=jax.random.key(i))
        counts[int(r.indices[0])] += 1
    assert counts[~np.isin(np.arange(L), survivors)].sum() == 0, counts
    exp = n_trials / len(survivors)
    chi2 = float(((counts[survivors] - exp) ** 2 / exp).sum())
    # dof = len(survivors)-1; chi2 99.9th percentile for dof<=7 is < 24.3
    assert chi2 < 24.3, (chi2, counts)
