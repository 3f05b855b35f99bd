"""Parity tests: classic pipeline kernels vs the reference-semantics oracle
(reference: baselines/classic_video_textures/computeD1.py, computeD2.py,
q_learning.py, video_textures.py)."""

import numpy as np
import jax
import pytest

from avtex import classic
import oracle


@pytest.fixture(scope="module")
def frames():
    g = np.random.default_rng(7)
    # 60 tiny "frames" of smooth moving gradients with a loop (frame 50 ~ frame 10).
    t = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    y, x = np.mgrid[0:8, 0:8]
    f = np.sin(x[None] / 2 + t[:, None, None]) + np.cos(y[None] / 3 - t[:, None, None])
    f = f + 0.01 * g.standard_normal(f.shape)
    return (127 * (f + 2) / 4).astype(np.float32)


def test_pairwise_l2_matches_oracle(frames):
    ours = np.asarray(classic.pairwise_l2(frames))
    want = oracle.oracle_pairwise_l2(frames)
    # Gram-form fp32 incurs cancellation ~ |x|^2 * eps; tolerance sized for it.
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-2)
    assert np.all(np.diag(ours) == 0.0)


def test_pairwise_l2_normalized(frames):
    ours = np.asarray(classic.pairwise_l2(frames, normalize=True))
    want = oracle.oracle_pairwise_l2(frames, normalize=True)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_transition_probs_match_oracle(frames):
    d = oracle.oracle_pairwise_l2(frames)
    p_ours, sig_ours = classic.distance_to_transition_probs(
        np.asarray(d, np.float32), 4.5)
    p_want, sig_want = oracle.oracle_probs(d, 4.5)
    np.testing.assert_allclose(float(sig_ours), sig_want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_ours), p_want, rtol=1e-4, atol=1e-6)


def test_binomial_coeffs():
    for fs in (4, 16, 40):
        want = (np.poly1d([0.5, 0.5]) ** (fs - 1)).coeffs
        np.testing.assert_allclose(classic.binomial_coeffs(fs), want, rtol=1e-12)


@pytest.mark.parametrize("fs,stride", [(4, 1), (8, 1), (8, 4), (16, 3)])
def test_d2_matches_oracle(frames, fs, stride):
    d1 = oracle.oracle_pairwise_l2(frames).astype(np.float32)
    ours = np.asarray(classic.diagonal_filter_smooth(d1, fs, stride))
    want = oracle.oracle_d2(d1, fs, stride)
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-4)


def test_future_cost_matches_oracle(frames):
    d1 = oracle.oracle_pairwise_l2(frames).astype(np.float32)
    d2 = oracle.oracle_d2(d1, 8).astype(np.float32)
    # Scale to the magnitude regime the reference operates in.
    d2 = d2 / d2.mean()
    ours = np.asarray(classic.anticipated_future_cost(d2, eps=1e-4))
    want = oracle.oracle_future_cost(np.asarray(d2, np.float64), eps=1e-4)
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-3)
    # Row 0 is never updated (reference quirk, q_learning.py:42).
    np.testing.assert_allclose(ours[0], d2[0] ** 0.7, rtol=1e-5)


def test_threshold_rows(frames):
    g = np.random.default_rng(3)
    p = g.random((10, 10)).astype(np.float32)
    ours = np.asarray(classic.threshold_rows(p, 0.25))
    want = oracle.oracle_threshold_rows(p, 0.25)
    np.testing.assert_allclose(ours, want)


def test_full_classic_stack_produces_valid_walk(frames):
    d1, p1, _ = classic.compute_d1(frames, 4.5)
    d2, p2, _ = classic.compute_d2(d1, 4.5, filter_size=8)
    d3, p3, p3_new, _ = classic.compute_d3(d2, 4.5, thresholding=0.75)
    assert np.asarray(p3_new).min() >= 0
    idx, jumps = classic.sample_texture_walk(
        jnp_p := np.asarray(p3_new), start=5, num_steps=40,
        rng=jax.random.PRNGKey(0))
    idx = np.asarray(idx)
    assert idx.shape == (41,)
    # Every transition must land on a nonzero column of its source row.
    for a, b in zip(idx[:-1], idx[1:]):
        assert jnp_p[a, b] > 0


def test_host_walk_matches_choice_semantics(frames):
    p = np.zeros((6, 6))
    p[0, [1, 3]] = 0.5
    p[1, 2] = 1.0
    p[2, 0] = 1.0
    p[3, 4] = 1.0
    p[4, 5] = 1.0
    p[5, 0] = 1.0
    rng = np.random.default_rng(0)
    idx, jumps = classic.sample_texture_walk_host(p, 0, 10, rng)
    rng2 = np.random.default_rng(0)
    want = [0]
    cur = 0
    for _ in range(10):
        cur = int(rng2.choice(np.flatnonzero(p[cur])))
        want.append(cur)
    assert idx.tolist() == want


def test_host_walk_mode2_advance_matches_reference_loop():
    """Mode 2 samples each transition from min(chosen + stride, N-1), not
    from the chosen index (reference video_textures.py:148-169); jump
    flags compare against the advanced row."""
    n, stride = 12, 3
    p = np.zeros((n, n))
    p[np.arange(n), (np.arange(n) + 1) % n] = 1.0  # always next available
    p[5, 9] = 1.0
    rng = np.random.default_rng(7)
    idx, jumps = classic.sample_texture_walk_host(p, 0, 8, rng,
                                                  advance=stride)
    # reference-style oracle sharing the rng stream
    rng2 = np.random.default_rng(7)
    this_frame = 0 + stride
    want, want_jumps = [0], []
    for _ in range(8):
        nxt = int(rng2.choice(np.flatnonzero(p[this_frame])))
        want_jumps.append(nxt != this_frame + 1)
        want.append(nxt)
        this_frame = min(nxt + stride, n - 1)
    assert idx.tolist() == want
    assert jumps.tolist() == want_jumps


def test_device_walk_mode2_advance_valid():
    """Device walk with advance: every chosen index must be a nonzero
    column of the ADVANCED row it was sampled from."""
    n, stride = 10, 2
    g = np.random.default_rng(0)
    p = (g.random((n, n)) > 0.4).astype(np.float32)
    p[p.sum(1) == 0, 0] = 1.0  # no dead rows
    idx, jumps = classic.sample_texture_walk(
        p, 1, 20, jax.random.PRNGKey(0), advance=stride)
    idx = np.asarray(idx)
    row = min(1 + stride, n - 1)
    for k in range(1, len(idx)):
        assert p[row, idx[k]] > 0, (row, idx[k])
        row = min(idx[k] + stride, n - 1)


def test_expand_walk_modes():
    idx = np.array([2, 3, 7])
    assert classic.sampler.expand_walk_to_frames(idx, 1, 4, 8, 100).tolist() == [2, 3, 7]
    m2 = classic.sampler.expand_walk_to_frames(idx, 2, 4, 8, 100)
    assert m2.tolist() == [2, 3, 4, 5, 3, 4, 5, 6, 7, 8, 9, 10]
    m3 = classic.sampler.expand_walk_to_frames(idx, 3, 4, 8, 1000)
    assert m3[:8].tolist() == list(range(2, 10))
    assert m3[8:12].tolist() == [3 * 4 + 4, 3 * 4 + 5, 3 * 4 + 6, 3 * 4 + 7]


def test_fused_pipeline_matches_staged(rng):
    """classic_transition_matrix (one device program) must reproduce the
    staged compute_d1 -> compute_d2 -> compute_d3 chain exactly."""
    from avtex.classic import (classic_transition_matrix, compute_d1,
                               compute_d2, compute_d3)

    import jax.numpy as jnp
    feats = jnp.asarray(rng.standard_normal((40, 75)), jnp.float32)
    d1, _, _ = compute_d1(feats, 4.5)
    d2, _, _ = compute_d2(d1, 4.5, filter_size=8)
    _, _, p3n, _ = compute_d3(d2, 4.5, thresholding=0.75)
    fused = classic_transition_matrix(feats, 4.5, filter_size=8)
    assert fused.shape == p3n.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(p3n),
                               rtol=1e-6, atol=1e-7)


def test_fused_pipeline_matches_staged_strided(rng):
    """Classic++ geometry (stride > 1, model_type 3) through the fused
    program must also match the staged chain."""
    import jax.numpy as jnp
    from avtex.classic import (classic_transition_matrix, compute_d1,
                               compute_d2, compute_d3)

    feats = jnp.asarray(rng.standard_normal((50, 60)), jnp.float32)
    d1, _, _ = compute_d1(feats, 4.5)
    d2, _, _ = compute_d2(d1, 4.5, filter_size=8, stride=3)
    _, _, p3n, _ = compute_d3(d2, 4.5, thresholding=0.5)
    fused = classic_transition_matrix(feats, 4.5, filter_size=8, stride=3,
                                      thresholding=0.5)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(p3n),
                               rtol=1e-6, atol=1e-7)
