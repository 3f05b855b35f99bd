"""Numpy oracle: literal re-statements of the reference's semantics.

Each function here is an *independent* (loop-level, torch-free) encoding of
what the reference code computes, used as ground truth in parity tests.
Citations point into /root/reference. These are deliberately naive O(N^2)
loops — the framework code under test must match them numerically while
being fast.
"""

import numpy as np

# ---------------------------------------------------------------- audio --- #

SAMPLE_RATE = 16000
WIN = int(round(SAMPLE_RATE * 0.025))
HOP = int(round(SAMPLE_RATE * 0.010))
FFT = 2 ** int(np.ceil(np.log2(WIN)))
LOG_OFFSET = 0.01


def oracle_log_mel(data):
    """Reference utils/mel_features.py:176-205 semantics, loop-built."""
    num_frames = 1 + int(np.floor((len(data) - WIN) / HOP))
    window = 0.5 - 0.5 * np.cos(2 * np.pi / WIN * np.arange(WIN))
    frames = np.stack([data[i * HOP: i * HOP + WIN] for i in range(num_frames)])
    spec = np.abs(np.fft.rfft(frames * window, FFT))

    # Mel matrix, loop-built per reference utils/mel_features.py:103-173.
    num_bins = FFT // 2 + 1
    nyquist = SAMPLE_RATE / 2.0

    def h2m(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, float) / 700.0)

    spec_mel = h2m(np.linspace(0, nyquist, num_bins))
    edges = np.linspace(h2m(125.0), h2m(7500.0), 64 + 2)
    mel = np.empty((num_bins, 64))
    for i in range(64):
        lo, c, hi = edges[i], edges[i + 1], edges[i + 2]
        lower = (spec_mel - lo) / (c - lo)
        upper = (hi - spec_mel) / (hi - c)
        mel[:, i] = np.maximum(0.0, np.minimum(lower, upper))
    mel[0, :] = 0.0
    return np.log(spec @ mel + LOG_OFFSET)


def oracle_examples(log_mel):
    """Frame mel rows into 100-frame windows, 10-frame hop
    (reference: utils/vggish_utils.py:59-69 with vggish_params 1.0s/0.1s)."""
    n = 1 + (len(log_mel) - 100) // 10
    return np.stack([log_mel[i * 10: i * 10 + 100] for i in range(n)])

# -------------------------------------------------------------- classic --- #


def oracle_pairwise_l2(feats, normalize=False):
    """Reference computeD1.py:47-96 fast path, literal double loop."""
    x = feats.reshape(len(feats), -1).astype(np.float64)
    if normalize:
        x = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
    n = len(x)
    d = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            d[i, j] = np.linalg.norm(x[i] - x[j])
    return d


def oracle_probs(d, sigma_factor):
    """Reference computeD1.py:240-247: sigma, exp, row shift, normalize."""
    nz = np.count_nonzero(d)
    sigma = sigma_factor * d.sum() / nz
    p = np.exp(-d / sigma)
    p = np.concatenate([p[1:], p[-1:]], axis=0)
    p = p / p.sum(1, keepdims=True)
    return p, sigma


def oracle_d2(d1, filter_size, stride=1):
    """Reference computeD2.py:34-42: strided valid conv2d with diagonal
    binomial kernel, literal loops."""
    coeffs = np.poly1d([0.5, 0.5]) ** (filter_size - 1)
    c = coeffs.coeffs
    n = d1.shape[0]
    out = (n - filter_size) // stride + 1
    d2 = np.zeros((out, out))
    for i in range(out):
        for j in range(out):
            acc = 0.0
            for k in range(filter_size):
                acc += c[k] * d1[i * stride + k, j * stride + k]
            d2[i, j] = acc
    return d2


def oracle_future_cost(d2, p=0.7, alpha=0.997, eps=1e-2):
    """Reference q_learning.py:34-51: bottom-up row sweeps to fixed point."""
    d3 = d2.astype(np.float64) ** p
    d3_new = d3.copy()
    delta = np.inf
    while delta > eps:
        d3_old = d3_new.copy()
        for i in range(d3.shape[0] - 1, 0, -1):
            mask = ~np.eye(d3.shape[0], dtype=bool)
            mins = d3_old[mask].reshape(d3.shape[0], -1).min(axis=1)
            d3_new[i] = d3[i] + alpha * mins
        delta = ((d3_new - d3_old) ** 2).mean()
    return d3_new


def oracle_threshold_rows(p, threshold):
    """Reference q_learning.py:63-64."""
    out = p.copy()
    for i in range(len(out)):
        m = out[i].max()
        out[i][out[i] < (m - threshold * m)] = 0.0
    return out

# ------------------------------------------------------------ synthesis --- #


def oracle_synthesis_step(sim_row, q_id, L, threshold, rng,
                          audio_row=None, alpha=0.5):
    """One transition of the reference synthesis loop, index semantics only.

    sim_row: cosine/temp logits of the query against every segment [L].
    Reproduces validate.py:369-377 (ordering), :524-527 (alpha blend),
    :554-572 (threshold, renormalize, uniform choice over survivors).
    Returns the chosen next q_id.
    """
    pos_id = min(q_id + 1, L - 1)
    mask = np.ones(L, dtype=bool)
    mask[[q_id, pos_id]] = False
    ordering = np.concatenate(([pos_id], np.arange(L)[mask]))

    output = sim_row[ordering].astype(np.float64)
    output = output / output.sum()
    if audio_row is not None:
        oa = audio_row[ordering].astype(np.float64)
        oa = oa / oa.sum()
        output = alpha * output + (1 - alpha) * oa

    output[output < (output.max() - threshold * output.max())] = 0.0
    survivors = np.flatnonzero(output)
    rdm = rng.choice(survivors)
    return int(ordering[rdm])
