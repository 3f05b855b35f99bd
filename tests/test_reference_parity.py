"""TRUE reference-parity tests: run the reference's own CPU code.

The reference's classic pipeline (torch) and mel frontend (numpy) are pure
CPU code, so rather than only testing against re-derived oracles we import
the actual files from /root/reference (read-only) and assert avtex produces
the same matrices / spectrograms. Missing heavyweight deps (librosa,
torchvision, resampy, soundfile) are stubbed — the functions under test
never touch them at runtime.
"""

import sys
import types

import numpy as np
import pytest

REF_CLASSIC = "/root/reference/baselines/classic_video_textures"
REF_UTILS = "/root/reference/contrastive_video_textures/utils"


def _stub(name):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        # register as attribute of parent package if any
        if "." in name:
            parent, child = name.rsplit(".", 1)
            _stub(parent)
            setattr(sys.modules[parent], child, mod)
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_classic():
    for m in ["librosa", "torchvision", "torchvision.io",
              "torchvision.models", "torchvision.transforms", "resampy",
              "soundfile"]:
        _stub(m)
    # the reference hardcodes .cuda(); run it on CPU
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None
    sys.path.insert(0, REF_CLASSIC)
    try:
        import computeD1, computeD2, q_learning  # noqa: E401
        return computeD1, computeD2, q_learning
    finally:
        sys.path.remove(REF_CLASSIC)


@pytest.fixture(scope="module")
def small_frames(rng=None):
    g = np.random.default_rng(7)
    # [N, C, H, W] float in [0,255] like decoded torch frames
    return (g.random((24, 3, 8, 8)) * 255).astype(np.float32)


def test_d1_matches_reference(ref_classic, small_frames):
    import jax.numpy as jnp
    import torch
    computeD1, _, _ = ref_classic
    from avtex.classic.d1 import compute_d1

    sigma_factor = 4.5
    ref_D1, ref_P1, ref_sigma = computeD1.compute_D1(
        torch.tensor(small_frames), sigma_factor, feats="RGB", slow=False)
    ours_flat = jnp.asarray(small_frames.reshape(len(small_frames), -1))
    d1, p1, sigma = compute_d1(ours_flat, sigma_factor)
    np.testing.assert_allclose(np.asarray(d1), ref_D1.numpy(), rtol=1e-4,
                               atol=1e-2)
    np.testing.assert_allclose(float(sigma), float(ref_sigma), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), ref_P1.numpy(), rtol=1e-3,
                               atol=1e-6)


def test_d2_matches_reference(ref_classic, small_frames):
    import jax.numpy as jnp
    import torch
    computeD1, computeD2, _ = ref_classic
    from avtex.classic.d1 import compute_d1
    from avtex.classic.d2 import compute_d2

    sf = 4.5
    ref_D1, _, _ = computeD1.compute_D1(torch.tensor(small_frames), sf,
                                        feats="RGB", slow=False)
    ref_D2, ref_P2, ref_s2, _ = computeD2.compute_D2(ref_D1, sf, 8)
    ours_flat = jnp.asarray(small_frames.reshape(len(small_frames), -1))
    d1, _, _ = compute_d1(ours_flat, sf)
    d2, p2, s2 = compute_d2(d1, sf, filter_size=8)
    np.testing.assert_allclose(np.asarray(d2), ref_D2.numpy(), rtol=1e-4,
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(p2), ref_P2.numpy(), rtol=1e-3,
                               atol=1e-6)


def test_value_iteration_matches_reference(ref_classic, small_frames):
    import jax.numpy as jnp
    import torch
    computeD1, computeD2, q_learning = ref_classic
    from avtex.classic.d1 import compute_d1
    from avtex.classic.d2 import compute_d2
    from avtex.classic.future_cost import compute_d3

    sf = 4.5
    ref_D1, _, _ = computeD1.compute_D1(torch.tensor(small_frames), sf,
                                        feats="RGB", slow=False)
    ref_D2, _, _, _ = computeD2.compute_D2(ref_D1, sf, 8)
    ref_D3, ref_P3, ref_P3n, ref_s3 = q_learning.q_learning(
        ref_D2, sf, thresholding=0.75)

    ours_flat = jnp.asarray(small_frames.reshape(len(small_frames), -1))
    d1, _, _ = compute_d1(ours_flat, sf)
    d2, _, _ = compute_d2(d1, sf, filter_size=8)
    d3, p3, p3n, s3 = compute_d3(d2, sf, thresholding=0.75)

    np.testing.assert_allclose(np.asarray(d3), ref_D3.numpy(), rtol=5e-3,
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(p3), ref_P3.numpy(), rtol=5e-3,
                               atol=1e-5)
    # identical thresholded support => identical transition graphs
    np.testing.assert_array_equal(np.asarray(p3n) > 0,
                                  ref_P3n.numpy() > 0)


def test_log_mel_matches_reference():
    """avtex jnp frontend vs the reference's own numpy mel_features.py."""
    sys.path.insert(0, REF_UTILS)
    try:
        import mel_features as ref_mel
    finally:
        sys.path.remove(REF_UTILS)
    from avtex.audio import params
    from avtex.audio.mel import log_mel_spectrogram

    g = np.random.default_rng(3)
    t = np.arange(2 * params.SAMPLE_RATE) / params.SAMPLE_RATE
    wav = (0.4 * np.sin(2 * np.pi * 330 * t)
           + 0.1 * g.standard_normal(len(t))).astype(np.float64)

    ref = ref_mel.log_mel_spectrogram(
        wav, audio_sample_rate=params.SAMPLE_RATE,
        log_offset=params.LOG_OFFSET,
        window_length_secs=params.STFT_WINDOW_SECONDS,
        hop_length_secs=params.STFT_HOP_SECONDS,
        num_mel_bins=params.NUM_MEL_BINS,
        lower_edge_hertz=params.MEL_MIN_HZ,
        upper_edge_hertz=params.MEL_MAX_HZ)
    ours = np.asarray(log_mel_spectrogram(wav.astype(np.float32)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


REF_VALIDATE = "/root/reference/contrastive_video_textures/validate.py"


def _extract_block(lines, start_marker, end_marker):
    """Slice [start_marker-line, end_marker-line] and strip the common
    indentation, so the reference's own statements can be exec'd."""
    import textwrap
    starts = [i for i, l in enumerate(lines) if start_marker in l]
    ends = [i for i, l in enumerate(lines) if end_marker in l]
    i, j = starts[0], [e for e in ends if e >= starts[0]][0]
    return textwrap.dedent("\n".join(lines[i:j + 1]))


@pytest.fixture(scope="module")
def reference_walk():
    """The reference's synthesis decision loop (validate.py:369-572), built
    by exec'ing the reference's OWN source lines per step.

    validate.py itself cannot be imported here (ipdb/torchvision/librosa/
    slowfast are absent), so the three pure-CPU decision blocks — candidate
    ordering (:369-378), normalize+blend (:524-527), threshold/renormalize/
    choice (:554-572) — are extracted verbatim and driven with injected
    model outputs. Sampling uses the reference's own global
    ``np.random.choice`` calls, seeded via np.random.seed.
    """
    import torch
    from types import SimpleNamespace

    lines = open(REF_VALIDATE).read().splitlines()
    snip_order = _extract_block(lines, "pos_id = min((q_id + 1), L - 1)",
                                "os_ids_t = torch.tensor(target_segment_ids)")
    snip_blend = _extract_block(lines, "output /= output.sum()",
                                "output = args.alpha * output")
    snip_choice = _extract_block(
        lines, "output[output < (output.max()",
        "q_id = os_ids_t[rdm_id].item()")

    def run(logits, num_steps, seed_id, threshold, alpha=0.5,
            audio_logits=None, np_seed=0):
        np.random.seed(np_seed)
        L = logits.shape[0]
        ns = {
            "np": np, "torch": torch, "print": lambda *a, **k: None,
            "args": SimpleNamespace(threshold=threshold, alpha=alpha),
            "all_segment_ids": np.arange(L), "L": L, "q_id": int(seed_id),
            "entropies": [], "non_zero_counts": [],
            "driving_audio_name": (None if audio_logits is None else "da"),
        }
        idxs = []
        for step in range(num_steps):
            exec(snip_order, ns)
            ordering = ns["target_segment_ids"]
            ns["output"] = torch.tensor(
                logits[ns["q_id"]][ordering].astype(np.float32))
            if audio_logits is not None:
                ns["output_a"] = torch.tensor(
                    audio_logits[step][ordering].astype(np.float32))
            exec(snip_blend, ns)
            exec(snip_choice, ns)
            idxs.append(int(ns["q_id"]))
        return (np.asarray(idxs),
                np.asarray([float(e) for e in ns["entropies"]]),
                np.asarray(ns["non_zero_counts"]))

    return run


@pytest.mark.parametrize("threshold,with_audio",
                         [(0.25, False), (0.5, False),
                          (0.25, True), (0.5, True)])
def test_walk_matches_reference_decision_loop(reference_walk, threshold,
                                              with_audio):
    """avtex host walk vs the reference's own validate.py decision code:
    identical transition-index sequences, step for step, sharing the
    reference's global np.random stream (BASELINE.json exactness bar)."""
    import jax.numpy as jnp
    from avtex.synth.engine import synthesize_indices_host

    g = np.random.default_rng(11)
    L, D, steps, temp = 23, 16, 60, 0.1
    q = g.standard_normal((L, D)).astype(np.float32)
    t = g.standard_normal((L, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    logits = (q @ t.T).astype(np.float32) / temp
    audio = None
    if with_audio:
        audio = (np.abs(g.standard_normal((steps, L))) + 0.1
                 ).astype(np.float32)

    ref_idx, ref_ent, ref_nnz = reference_walk(
        logits, steps, seed_id=10, threshold=threshold, alpha=0.5,
        audio_logits=audio, np_seed=123)

    np.random.seed(123)  # host walk consumes the same global stream
    res = synthesize_indices_host(
        jnp.asarray(q), jnp.asarray(t), steps, temp=temp,
        threshold=threshold, alpha=0.5,
        audio_logits=None if audio is None else jnp.asarray(audio),
        seed_id=10, rng=np.random)

    np.testing.assert_array_equal(res.indices, ref_idx)
    np.testing.assert_array_equal(res.nonzero_counts, ref_nnz)
    np.testing.assert_allclose(res.entropies, ref_ent, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ref_transform():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_transform",
        "/root/reference/contrastive_video_textures/dataset/transform.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("hw", [(30, 40), (40, 30), (32, 32)])
@pytest.mark.parametrize("spatial_idx", [0, 1, 2])
def test_uniform_crop_matches_reference(ref_transform, hw, spatial_idx):
    """avtex uniform_crop vs the reference's transform.uniform_crop
    (transform.py:99-133) across aspect ratios and spatial positions."""
    import torch
    from avtex.data.preprocess import uniform_crop

    g = np.random.default_rng(2)
    h, w = hw
    x = g.random((5, 3, h, w)).astype(np.float32)  # [T, C, H, W] torch order
    ref = ref_transform.uniform_crop(torch.tensor(x), 24, spatial_idx)
    ours = uniform_crop(np.transpose(x, (0, 2, 3, 1)), 24, spatial_idx)
    np.testing.assert_array_equal(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                                  ref.numpy())


def test_scale_uniform_crop_norm_matches_reference_val_branch(ref_transform):
    """Pixel-level parity of the eval composite: scale-to-240 + center
    uniform crop + ImageNet normalize, vs the reference's own transform
    functions composed per dataset_utils.py:36-62 (val branch).

    Note: the reference's scale_jitter_crop_norm itself calls
    uniform_crop(frames, crop_size) without the required spatial_idx
    (dataset_utils.py:55 vs transform.py:99) — a TypeError as shipped, and
    the function is never called from any live path. The composite below is
    the semantics it specifies, with spatial_idx pinned to 1 (center).
    """
    import torch
    from avtex.data.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                       scale_uniform_crop_norm)

    g = np.random.default_rng(4)
    u8 = (g.random((4, 3, 64, 48)) * 255).astype(np.uint8)  # [T, C, H, W]

    x = torch.tensor(u8).float() / 255.0
    x = torch.nn.functional.interpolate(
        x, size=(40, 40), mode="bilinear", align_corners=False)
    x = ref_transform.uniform_crop(x, 32, 1)
    ref = ref_transform.color_normalization(
        x, np.array(IMAGENET_MEAN, dtype=np.float32),
        np.array(IMAGENET_STD, dtype=np.float32))

    ours = scale_uniform_crop_norm(
        np.transpose(u8, (0, 2, 3, 1)), scale_size=40, crop_size=32)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref.numpy(),
        rtol=1e-4, atol=1e-5)

    # Document the reference bug this composite fixes. dataset_utils does
    # `from . import transform`; give it a package context without running
    # the package __init__ (which drags in torchvision/slowfast).
    import importlib
    pkg = types.ModuleType("refds")
    pkg.__path__ = ["/root/reference/contrastive_video_textures/dataset"]
    sys.modules["refds"] = pkg
    try:
        ref_du = importlib.import_module("refds.dataset_utils")
    finally:
        del sys.modules["refds"]
    with pytest.raises(TypeError):
        ref_du.scale_jitter_crop_norm(torch.tensor(u8).float(),
                                      scale_height=40, scale_width=40,
                                      crop_size=32, split="val")


@pytest.mark.parametrize("hw,minmax", [((36, 24), (20, 30)),
                                       ((24, 36), (20, 30)),
                                       ((32, 32), (28, 40))])
def test_short_side_scale_jitter_matches_reference(ref_transform, hw,
                                                   minmax):
    """avtex random_short_side_scale_jitter vs the reference's own
    transform.random_short_side_scale_jitter (transform.py:9-51), sharing
    the reference's global np.random stream — identical sampled size,
    shapes and pixels across aspect ratios, including the skip-resize
    branch and the inverse-uniform variant."""
    import torch

    from avtex.data.preprocess import random_short_side_scale_jitter

    h, w = hw
    g = np.random.default_rng(11)
    x = g.random((4, 3, h, w)).astype(np.float32)  # [T, C, H, W]
    for inverse in (False, True):
        for seed in (0, 1, 2, 7):
            np.random.seed(seed)
            ref = ref_transform.random_short_side_scale_jitter(
                torch.tensor(x), *minmax, inverse_uniform_sampling=inverse)
            if isinstance(ref, tuple):  # reference returns a 1-tuple when
                ref = ref[0]            # it resizes (transform.py:47-51)
            np.random.seed(seed)
            ours = random_short_side_scale_jitter(
                np.transpose(x, (0, 2, 3, 1)), *minmax,
                inverse_uniform_sampling=inverse)
            np.testing.assert_allclose(
                np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref.numpy(),
                rtol=1e-5, atol=1e-5,
                err_msg=f"hw={hw} seed={seed} inverse={inverse}")


def test_lighting_jitter_matches_reference(ref_transform):
    """avtex lighting_jitter vs the reference's own transform.
    lighting_jitter (transform.py:264-291), sharing the reference's
    global np.random stream — including its channel-REVERSED rgb[2-idx]
    shift quirk and the alphastd=0 passthrough."""
    import torch

    from avtex.data.preprocess import lighting_jitter

    # AlexNet-paper PCA stats (the reference takes them as arguments; its
    # caller is dead code so any values exercise the math)
    eigval = [0.2175, 0.0188, 0.0045]
    eigvec = [[-0.5675, 0.7192, 0.4009],
              [-0.5808, -0.0045, -0.8140],
              [-0.5836, -0.6948, 0.4203]]
    g = np.random.default_rng(13)
    x = g.random((5, 3, 12, 10)).astype(np.float32)  # [T, C, H, W]
    for seed in (0, 3, 9):
        np.random.seed(seed)
        ref = ref_transform.lighting_jitter(torch.tensor(x), 0.1, eigval,
                                            eigvec)
        np.random.seed(seed)
        ours = lighting_jitter(np.transpose(x, (0, 2, 3, 1)), 0.1, eigval,
                               eigvec)
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref.numpy(),
            rtol=1e-5, atol=1e-6, err_msg=f"seed={seed}")
    # alphastd=0 passthrough (transform.py:277-278)
    out = lighting_jitter(np.transpose(x, (0, 2, 3, 1)), 0.0, eigval,
                          eigvec)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.transpose(x, (0, 2, 3, 1)))


def test_fused_scale_crop_matches_reference_at_same_draws(ref_transform,
                                                          monkeypatch):
    """The jitted training aug's fused scale-jitter+crop
    (_jittered_scale_crop: one scale_and_translate) vs the reference's own
    random_short_side_scale_jitter + random_crop with the SAME draws
    injected — pixel-level agreement of the resize∘crop composition.
    The avtex side's jax-key draws are recomputed on host and fed to the
    reference's np.random calls."""
    import jax
    import jax.numpy as jnp
    import torch

    from avtex.data.preprocess import _jittered_scale_crop

    h, w, size = 40, 56, 24
    min_size, max_size = 26, 38
    g = np.random.default_rng(17)
    clip = g.random((2, h, w, 3)).astype(np.float32)  # [T, H, W, 3]
    k_scale, k_crop = jax.random.key(3), jax.random.key(4)
    ours = np.asarray(_jittered_scale_crop(
        jnp.asarray(clip[None]), k_scale, k_crop, size, min_size, max_size)
    )[0]

    # recompute the avtex draws on host
    s_float = float(jax.random.uniform(k_scale, (1,), minval=float(min_size),
                                       maxval=float(max_size))[0])
    s = int(jnp.round(s_float))
    u = np.asarray(jax.random.uniform(k_crop, (1, 2)))[0]
    nh, nw = s, s
    if w < h:
        nh = int(np.floor(h / w * s))
    elif h < w:
        nw = int(np.floor(w / h * s))
    oy = int(np.floor(u[0] * (nh - size))) if nh > size else 0
    ox = int(np.floor(u[1] * (nw - size))) if nw > size else 0

    # drive the reference's own functions with those exact draws (its
    # random_crop only draws for dims strictly larger than the crop)
    draws = iter([s_float])
    ints = iter(([oy] if nh > size else []) + ([ox] if nw > size else []))
    monkeypatch.setattr(np.random, "uniform",
                        lambda *a, **k: next(draws))
    monkeypatch.setattr(np.random, "randint",
                        lambda *a, **k: next(ints))
    ref = ref_transform.random_short_side_scale_jitter(
        torch.tensor(np.transpose(clip, (0, 3, 1, 2))), min_size, max_size)
    if isinstance(ref, tuple):
        ref = ref[0]
    ref = ref_transform.random_crop(ref, size)
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)),
                               ref.numpy(), rtol=1e-4, atol=1e-5)


def test_preprocess_clip_live_constants_match_reference():
    """preprocess_clip's non-SlowFast normalize uses the reference's LIVE
    constants (validate.py:88-93 / dataset.py:48-58), and the SlowFast path
    swaps RGB->BGR before DATA.MEAN/STD normalize (dataset.py:70-73)."""
    from avtex.data.preprocess import preprocess_clip

    g = np.random.default_rng(6)
    u8 = (g.random((2, 3, 16, 16, 3)) * 255).astype(np.uint8)
    x = u8.astype(np.float32) / 255.0

    ours = np.asarray(preprocess_clip(u8, size=16))
    want = ((x - np.array([0.4345, 0.4051, 0.3775], np.float32))
            / np.array([0.2768, 0.2713, 0.2737], np.float32))
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-6)

    ours_sf = np.asarray(preprocess_clip(u8, size=16, slowfast=True))
    want_sf = (x[..., ::-1] - 0.45) / 0.225
    np.testing.assert_allclose(ours_sf, want_sf, rtol=1e-5, atol=1e-6)


def test_bn_folded_r3d_matches_reference_net():
    """Frozen-BN import: the reference's OWN torch 3D ResNet (random conv
    weights + random BN running stats, eval mode) vs avtex resnet3d10 with
    norm="affine" after convert_bn_folded — same clip embeddings to fp32
    precision. This is the r3d18_KM_200ep.pth import path
    (models/models.py:565-580, video_models/resnet3d.py:18-24) exercised
    end-to-end without the (unshipped) checkpoint file.
    """
    import importlib.util

    import jax
    import jax.numpy as jnp
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_r3d",
        "/root/reference/contrastive_video_textures/models/video_models/"
        "resnet3d.py")
    ref_r3d = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_r3d)

    torch.manual_seed(0)
    net = ref_r3d.resnet10(sample_size=32, sample_duration=16,
                           pretrained=False)
    # randomize BN affine + running stats so folding is non-trivial
    g = torch.Generator().manual_seed(1)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.weight.data = torch.rand(m.weight.shape, generator=g) + 0.5
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.1
            m.running_mean = torch.randn(m.running_mean.shape, generator=g)
            m.running_var = torch.rand(m.running_var.shape, generator=g) + 0.5
    net.eval()

    x = torch.randn(2, 3, 16, 32, 32, generator=g)
    with torch.no_grad():
        ref_out = net(x).reshape(2, -1).numpy()

    from avtex.nn.resnet3d import resnet3d10
    from avtex.utils.convert import convert_bn_folded

    m = resnet3d10(dtype=jnp.float32, norm="affine")
    xa = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # NCDHW -> NDHWC
    params = jax.jit(m.init)(jax.random.key(0), xa)
    state = {k: v.numpy() for k, v in net.state_dict().items()
             if hasattr(v, "numpy")}
    params = convert_bn_folded(state, m, params, xa)
    ours = np.asarray(jax.jit(m.apply)(params, xa))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)


def test_encoder_autoload_grafts_both_towers(tmp_path, monkeypatch):
    """norm="affine" synthesis init auto-loads a pretrained frozen-BN
    encoder checkpoint into BOTH towers (reference models/models.py:556-580
    builds query and target encoders from the same checkpoint). Uses the
    reference's OWN torch net saved to a real .pth file."""
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_r3d",
        "/root/reference/contrastive_video_textures/models/video_models/"
        "resnet3d.py")
    ref_r3d = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_r3d)

    torch.manual_seed(3)
    net = ref_r3d.resnet10(sample_size=32, sample_duration=8,
                           pretrained=False)
    g = torch.Generator().manual_seed(4)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean = torch.randn(m.running_mean.shape, generator=g)
            m.running_var = torch.rand(m.running_var.shape, generator=g) + 0.5
    ckpt = str(tmp_path / "r3d10_fake.pth")
    torch.save(net.state_dict(), ckpt)
    monkeypatch.setenv("AVTEX_ENCODER_CKPT", ckpt)

    import jax
    import jax.numpy as jnp
    from avtex.contrastive.model import ContrastiveTextures
    from avtex.data.preprocess import preprocess_clip
    from avtex.utils.convert import maybe_load_encoder_into_model

    model = ContrastiveTextures(arch="resnet10", model_type=1,
                                norm="affine")
    xp = preprocess_clip(jnp.zeros((1, 4, 32, 32, 3), jnp.uint8), size=32)
    params = jax.jit(model.init)(jax.random.key(0), xp, xp[:, None])
    new, loaded = maybe_load_encoder_into_model("resnet10", params,
                                                window=4)
    assert loaded
    w_torch = np.transpose(net.state_dict()["conv1.weight"].numpy(),
                           (2, 3, 4, 1, 0))
    for tower in ("q_embedder", "t_embedder"):
        enc = new["params"][tower]["video_encoder"]
        flat = jax.tree_util.tree_flatten_with_path(enc)[0]
        kernels = [leaf for path, leaf in flat
                   if str(getattr(path[-1], "key", "")) == "kernel"
                   and np.ndim(leaf) == 5
                   and tuple(np.shape(leaf)) == w_torch.shape]
        assert any(np.allclose(np.asarray(k), w_torch) for k in kernels), \
            f"{tower} stem kernel not grafted"


def _torch_slowfast(layers=(2, 1, 1, 1), width=8, beta_inv=8, alpha=4,
                    fusion_kernel=7):
    """Minimal torch SlowFast with pyslowfast's module naming + forward
    semantics (video_model_builder.SlowFast: stems with pooling, lateral
    FuseFastToSlow conv/bn/relu, bottleneck branch2 a/b/c with the
    temporal kernel on a, stride on b, branch1 projection, pooled-concat
    head). This is the SLOWFAST_8x8_R50 shape the reference strips the
    head from (models/models.py:565-580), at test width."""
    import torch
    import torch.nn as nn

    class Stem(nn.Module):
        def __init__(self, cin, cout, tk):
            super().__init__()
            self.conv = nn.Conv3d(cin, cout, (tk, 7, 7), (1, 2, 2),
                                  (tk // 2, 3, 3), bias=False)
            self.bn = nn.BatchNorm3d(cout)
            self.pool = nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))

        def forward(self, x):
            return self.pool(torch.relu(self.bn(self.conv(x))))

    class Fuse(nn.Module):
        def __init__(self, cf):
            super().__init__()
            fk = fusion_kernel
            self.conv_f2s = nn.Conv3d(cf, 2 * cf, (fk, 1, 1),
                                      (alpha, 1, 1), (fk // 2, 0, 0),
                                      bias=False)
            self.bn = nn.BatchNorm3d(2 * cf)

        def forward(self, xs, xf):
            return torch.cat([xs, torch.relu(self.bn(self.conv_f2s(xf)))],
                             dim=1), xf

    class Block(nn.Module):
        def __init__(self, cin, feats, tk, stride):
            super().__init__()
            out = feats * 4
            if cin != out or stride != 1:
                self.branch1 = nn.Conv3d(cin, out, 1, (1, stride, stride),
                                         bias=False)
                self.branch1_bn = nn.BatchNorm3d(out)
            self.branch2 = nn.ModuleDict({
                "a": nn.Conv3d(cin, feats, (tk, 1, 1), 1, (tk // 2, 0, 0),
                               bias=False),
                "a_bn": nn.BatchNorm3d(feats),
                "b": nn.Conv3d(feats, feats, (1, 3, 3), (1, stride, stride),
                               (0, 1, 1), bias=False),
                "b_bn": nn.BatchNorm3d(feats),
                "c": nn.Conv3d(feats, out, 1, 1, bias=False),
                "c_bn": nn.BatchNorm3d(out),
            })

        def forward(self, x):
            b2 = self.branch2
            y = torch.relu(b2["a_bn"](b2["a"](x)))
            y = torch.relu(b2["b_bn"](b2["b"](y)))
            y = b2["c_bn"](b2["c"](y))
            r = (self.branch1_bn(self.branch1(x))
                 if hasattr(self, "branch1") else x)
            return torch.relu(y + r)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            w, wf = width, width // beta_inv
            self.s1 = nn.Module()
            self.s1.pathway0_stem = Stem(3, w, 1)
            self.s1.pathway1_stem = Stem(3, wf, 5)
            self.s1_fuse = Fuse(wf)
            slow_t = (1, 1, 3, 3)
            cin_s, cin_f = w + 2 * wf, wf
            for i, n in enumerate(layers):
                feats = w * 2 ** i
                stage = nn.Module()
                for j in range(n):
                    stride = 2 if (i > 0 and j == 0) else 1
                    setattr(stage, f"pathway0_res{j}",
                            Block(cin_s, feats, slow_t[i], stride))
                    setattr(stage, f"pathway1_res{j}",
                            Block(cin_f, feats // beta_inv, 3, stride))
                    cin_s, cin_f = feats * 4, feats * 4 // beta_inv
                setattr(self, f"s{2 + i}", stage)
                if i != len(layers) - 1:
                    setattr(self, f"s{2 + i}_fuse", Fuse(cin_f))
                    cin_s += 2 * cin_f
            self.layers = layers

        def forward(self, xs, xf):
            xs = self.s1.pathway0_stem(xs)
            xf = self.s1.pathway1_stem(xf)
            xs, xf = self.s1_fuse(xs, xf)
            for i, n in enumerate(self.layers):
                stage = getattr(self, f"s{2 + i}")
                for j in range(n):
                    xs = getattr(stage, f"pathway0_res{j}")(xs)
                    xf = getattr(stage, f"pathway1_res{j}")(xf)
                if i != len(self.layers) - 1:
                    xs, xf = getattr(self, f"s{2 + i}_fuse")(xs, xf)
            pool = lambda z: z.mean(dim=(2, 3, 4))  # noqa: E731
            return torch.cat([pool(xs), pool(xf)], dim=1)

    return Net()


def _randomize_bn(net, seed=1):
    import torch
    g = torch.Generator().manual_seed(seed)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.weight.data = torch.rand(m.weight.shape, generator=g) + 0.5
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.1
            m.running_mean = torch.randn(m.running_mean.shape, generator=g)
            m.running_var = torch.rand(m.running_var.shape, generator=g) + 0.5


def test_slowfast_import_matches_torch_net():
    """SLOWFAST pretrained-import path: a torch SlowFast with pyslowfast's
    module naming/semantics (random conv weights + random frozen-BN stats,
    eval mode) must produce the same embeddings as SlowFastR50
    (norm="affine", incl. the s2d stem) after convert_slowfast. This is
    the reference's flagship encoder import (models/models.py:565-580)
    exercised end-to-end without the external pkl."""
    import jax
    import jax.numpy as jnp
    import torch

    from avtex.nn.slowfast import SlowFastR50
    from avtex.utils.convert import convert_slowfast

    layers, width = (2, 1, 1, 1), 8
    torch.manual_seed(0)
    net = _torch_slowfast(layers, width)
    _randomize_bn(net)
    net.eval()

    g = torch.Generator().manual_seed(2)
    xf = torch.randn(2, 3, 8, 32, 32, generator=g)
    xs = xf[:, :, 2::4]  # slow = every alpha-th fast frame
    with torch.no_grad():
        ref = net(xs, xf).numpy()

    m = SlowFastR50(layers=layers, width=width, dtype=jnp.float32,
                    norm="affine", s2d_stem=True)
    to_ndhwc = lambda z: jnp.asarray(  # noqa: E731
        z.numpy().transpose(0, 2, 3, 4, 1))
    slow, fast = to_ndhwc(xs), to_ndhwc(xf)
    params = jax.jit(m.init)(jax.random.key(0), slow, fast)
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert_slowfast(state, params, layers=layers)
    ours = np.asarray(jax.jit(m.apply)(params, slow, fast))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_slowfast_c2_pkl_roundtrip(tmp_path):
    """load_slowfast_state on a caffe2-format .pkl (the model-zoo artifact
    the reference points at, models/models.py:573): blob names built with
    the c2 scheme round-trip through _c2_name_to_pt into the same
    converted params as the pytorch-format dict."""
    import pickle

    import torch

    from avtex.utils.convert import load_slowfast_state

    layers, width = (2, 1, 1, 1), 8
    torch.manual_seed(5)
    net = _torch_slowfast(layers, width)
    _randomize_bn(net, seed=6)
    state = {k: v.numpy() for k, v in net.state_dict().items()
             if "num_batches" not in k}

    # pt module name -> c2 blob name (inverse of convert._c2_name_to_pt)
    def c2_name(pt):
        base, _, leaf = pt.rpartition(".")
        lf = {"weight": "w", "bias": "b", "running_mean": "rm",
              "running_var": "riv"}[leaf]
        import re
        m = re.match(r"^s1\.pathway(\d)_stem\.(conv|bn)$", base)
        if m:
            fast = "_fast" if m.group(1) == "1" else ""
            if m.group(2) == "conv":
                return f"conv1{fast}_{lf}"
            return f"res_conv1{fast}_bn_{'s' if lf == 'w' else lf}"
        m = re.match(r"^s1_fuse\.(conv_f2s|bn)$", base)
        if m:
            bn = "_bn" if m.group(1) == "bn" else ""
            lf2 = "s" if (bn and lf == "w") else lf
            return f"t_pool1_subsample{bn}_{lf2}"
        m = re.match(r"^s(\d)_fuse\.(conv_f2s|bn)$", base)
        if m:
            s = int(m.group(1)) - 1
            bn = "_bn" if m.group(2) == "bn" else ""
            lf2 = "s" if (bn and lf == "w") else lf
            return f"t_res{s}_0_branch2c_bn_subsample{bn}_{lf2}"
        m = re.match(
            r"^s(\d)\.pathway(\d)_res(\d+)\.branch(1|2\.[a-c])(_bn)?$", base)
        if m:
            br = m.group(4).replace("2.", "2")
            fast = "_fast" if m.group(2) == "1" else ""
            bn = m.group(5) or ""
            lf2 = "s" if (bn and lf == "w") else lf
            return (f"res{m.group(1)}_{m.group(3)}_branch{br}{bn}"
                    f"{fast}_{lf2}")
        raise AssertionError(f"unmapped pt name {pt}")

    blobs = {c2_name(k): v for k, v in state.items()}
    pkl = tmp_path / "SLOWFAST_tiny.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    loaded = load_slowfast_state(str(pkl))
    assert set(loaded) == set(state), (
        sorted(set(state) ^ set(loaded))[:10])
    for k in state:
        np.testing.assert_array_equal(loaded[k], state[k])


def test_batching_utils_match_reference():
    """avtex.utils.batching vs the reference's torch implementations."""
    import importlib.util
    import torch
    spec = importlib.util.spec_from_file_location(
        "ref_utils", "/root/reference/contrastive_video_textures/utils/utils.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from avtex.utils.batching import (combine_batches, split_into_batches,
                                      split_into_overlapping_segments)

    g = np.random.default_rng(5)
    x = g.random((1, 13, 4, 4)).astype(np.float32)
    ours, n1 = split_into_batches(x, 5)
    theirs, n2 = ref.split_into_batches(torch.tensor(x), 5)
    assert n1 == n2
    np.testing.assert_array_equal(ours, theirs.numpy())

    frames = g.random((37, 4)).astype(np.float32)
    ours2, m1 = split_into_overlapping_segments(frames, 4, 6, 2)
    theirs2, m2 = ref.split_into_overlapping_segments(
        torch.tensor(frames), 4, 6, 2)
    assert m1 == m2
    np.testing.assert_array_equal(ours2, theirs2.numpy())

    back = combine_batches(ours, 13)
    ref_back = ref.combine_batches(theirs, 13)
    np.testing.assert_array_equal(back, ref_back.numpy())


def test_bn_folded_resnet2d_matches_reference_net():
    """The 2D path of the same story: the reference's vendored torchvision
    ResNet-18 (models/resnet.py, random weights + random BN stats, eval,
    fc stripped like the classic baseline does at computeD1.py:101-103)
    vs avtex resnet2d18 with norm='affine' after convert_bn_folded."""
    import importlib.util

    import jax
    import jax.numpy as jnp
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_r2d", "/root/reference/contrastive_video_textures/models/"
        "resnet.py")
    ref_r2d = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_r2d)

    torch.manual_seed(0)
    net = ref_r2d.resnet18(pretrained=False)
    g = torch.Generator().manual_seed(2)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.weight.data = torch.rand(m.weight.shape, generator=g) + 0.5
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.1
            m.running_mean = torch.randn(m.running_mean.shape, generator=g)
            m.running_var = torch.rand(m.running_var.shape, generator=g) + 0.5
    net.eval()

    x = torch.randn(2, 3, 64, 64, generator=g)
    with torch.no_grad():
        feats = net.avgpool(  # penultimate features, fc stripped
            torch.nn.Sequential(*list(net.children())[:-2])(x))
        ref_out = feats.reshape(2, -1).numpy()

    from avtex.nn.resnet2d import resnet2d18
    from avtex.utils.convert import convert_bn_folded

    m = resnet2d18(dtype=jnp.float32, norm="affine")
    xa = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = jax.jit(m.init)(jax.random.key(0), xa)
    state = {k: v.numpy() for k, v in net.state_dict().items()
             if hasattr(v, "numpy") and not k.startswith("fc.")}
    params = convert_bn_folded(state, m, params, xa)
    ours = np.asarray(jax.jit(m.apply)(params, xa))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)


@pytest.fixture(scope="module")
def reference_seed():
    """The reference's audio-argmax seed block (validate.py:218-242), built
    by exec'ing the reference's OWN source lines.

    The uncommented ``if driving_audio_name is None:`` statement (a
    commented duplicate precedes it at :197) through the final
    ``print("Max Audio Sim: ", max_sim)``, driven with injected audio
    example tensors. Returns the reference's chosen q_id.
    """
    import textwrap

    import torch

    lines = open(REF_VALIDATE).read().splitlines()
    start = next(i for i, l in enumerate(lines)
                 if l.strip().startswith("if driving_audio_name is None:"))
    end = next(i for i, l in enumerate(lines)
               if i > start and 'print("Max Audio Sim: ", max_sim)' in l)
    snip = textwrap.dedent("\n".join(lines[start:end + 1]))

    def run(audio_eg, driving_eg, num_segments):
        import copy
        ns = {
            "np": np, "torch": torch, "copy": copy,
            "F": torch.nn.functional, "nn": torch.nn,
            "print": lambda *a, **k: None,
            "driving_audio_name": "da",
            "driving_audio_eg": torch.tensor(np.asarray(driving_eg))[None],
            "audio_eg": torch.tensor(np.asarray(audio_eg)),
            "all_segment_ids": np.arange(num_segments),
        }
        exec(snip, ns)
        return int(ns["q_id"])

    return run


def test_seed_segment_matches_reference(reference_seed, rng):
    """avtex seed_segment vs the reference's own seed block: identical ids
    over random inputs, incl. the two edge cases the loop semantics
    create — ids past num_segments are never considered, and when no
    segment has positive cosine similarity the seed stays 0 (the loop's
    ``sim > max_sim`` with max_sim=0 never fires)."""
    import jax.numpy as jnp

    from avtex.synth.engine import seed_segment

    for trial in range(5):
        egs = rng.standard_normal((12, 20, 4)).astype(np.float32)
        drv = rng.standard_normal((20, 4)).astype(np.float32)
        for L in (12, 7):
            ref = reference_seed(egs, drv, L)
            ours = seed_segment(jnp.asarray(egs), jnp.asarray(drv),
                                num_segments=L)
            assert ours == ref, (trial, L, ours, ref)

    # all-negative similarities: the reference keeps q_id = 0
    egs = np.ones((6, 8), np.float32)
    drv = -np.ones((8,), np.float32)
    assert reference_seed(egs, drv, 6) == 0
    assert seed_segment(jnp.asarray(egs), jnp.asarray(drv),
                        num_segments=6) == 0

    # exact match at a given row wins (positive similarity, argmax-first)
    egs = rng.standard_normal((10, 8)).astype(np.float32)
    assert reference_seed(egs, egs[7], 10) == 7
    assert seed_segment(jnp.asarray(egs), jnp.asarray(egs[7]),
                        num_segments=10) == 7


@pytest.fixture(scope="module")
def reference_max_length():
    """The reference's max_length computation (validate.py:257-263),
    exec'd verbatim: the base ceil(fps)*new_video_length plus the
    driving-audio clip statement."""
    import math

    lines = open(REF_VALIDATE).read().splitlines()
    start = next(i for i, l in enumerate(lines)
                 if l.strip().startswith("max_length = math.ceil"))
    clip = next(i for i, l in enumerate(lines)
                if "np.floor(len(driving_audio_eg) * S + W)" in l)
    snip = "\n".join(
        [lines[start].strip()]
        + ["if driving_audio_name is not None:"]
        + ["    " + l.strip() for l in lines[clip - 1:clip + 2]])

    def run(fps, new_video_length, n_driving_eg):
        from types import SimpleNamespace
        ns = {
            "np": np, "math": math,
            "args": SimpleNamespace(fps=fps,
                                    new_video_length=new_video_length),
            "S": 6, "W": 15,  # main.py:515-516 geometry at fps=30
            "driving_audio_name": None if n_driving_eg is None else "da",
            "driving_audio_eg": ([0] * n_driving_eg
                                 if n_driving_eg is not None else None),
        }
        exec(snip, ns)
        return float(ns["max_length"])

    return run


def test_max_length_clip_vs_reference(reference_max_length):
    """Driving-audio length clipping vs the reference's own lines.

    Without driving audio both agree exactly: max_length =
    ceil(fps) * new_video_length. WITH driving audio the reference's
    formula (validate.py:262) multiplies a FRAME count (len*S + W) by
    ceil(fps) again, so the clip is inert for any driving audio >= ~1 s
    — and the unclipped loop then indexes driving_audio_eg[iter_count]
    out of range (validate.py:417 consumes one example per step,
    iter_count starts at 1): the reference crashes as shipped. This test
    pins (a) the no-driving agreement, (b) the reference's inert-clip
    arithmetic, (c) that avtex's rule — output length =
    min(new_video_length, driving duration in seconds) — always keeps
    the step count within the examples the reference formula was meant
    to guarantee (avtex additionally clips per-step ids, pipeline.py:352,
    so it cannot crash either way)."""
    from avtex.synth.engine import num_synthesis_steps

    fps, nvl, W, S = 30, 60, 15, 6

    # (a) no driving audio: identical
    assert reference_max_length(fps, nvl, None) == nvl * fps == 1800

    for n in (10, 50, 100, 300, 600):  # 1 s .. 60 s of driving audio
        ref_ml = reference_max_length(fps, nvl, n)
        # (b) the fps double-multiplication: clip value is
        # ceil(fps)*floor(n*S + W) frames — never below the base for
        # n >= 10, so the reference's max_length is unclipped...
        assert ref_ml == min(fps * nvl, fps * np.floor(n * S + W))
        if n >= 10:
            assert ref_ml == nvl * fps, "clip fired unexpectedly"
        # ...and the reference's own walk would then run
        # num_synthesis_steps(ref_ml) steps consuming eg[1..steps],
        # which overruns n examples whenever the driving audio is
        # shorter than the requested video:
        ref_steps = num_synthesis_steps(int(ref_ml), W, S)
        if n < 299:
            assert ref_steps > n - 1, "reference would NOT crash here?"

        # (c) avtex (synth/pipeline.py:95-99): duration-in-seconds clip
        ours_ml = min(nvl * fps, int(n / 10 * fps))
        ours_steps = num_synthesis_steps(ours_ml, W, S)
        assert ours_ml == min(nvl, n / 10) * fps
        assert ours_steps <= max(n - 1, 1), (n, ours_steps)


@pytest.fixture(scope="module")
def ref_slomo():
    """The reference's own SuperSloMo nets (models/slowmo.py:10-283),
    imported with torchvision stubbed (it is imported but never used by
    the classes)."""
    import importlib.util

    for m in ["torchvision", "torchvision.transforms"]:
        _stub(m)
    spec = importlib.util.spec_from_file_location(
        "ref_slowmo",
        "/root/reference/contrastive_video_textures/models/slowmo.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_backwarp_matches_reference_grid_sample(ref_slomo):
    """avtex backwarp vs the reference's own backWarp module
    (models/slowmo.py:211-283) on CPU: the reference's grid_sample call
    (default align_corners=False, zeros padding) samples at
    (x+u-0.5, y+v-0.5) with out-of-image taps contributing zero — at an
    even and an odd spatial size, with flows large enough to leave the
    image."""
    import warnings

    import jax.numpy as jnp
    import torch

    from avtex.nn.slomo import backwarp

    for seed, (h, w) in [(0, (6, 8)), (1, (7, 9))]:
        g = np.random.default_rng(seed)
        img = g.standard_normal((2, 3, h, w)).astype(np.float32)
        flow = (g.standard_normal((2, 2, h, w)) * 3).astype(np.float32)
        warper = ref_slomo.backWarp(w, h, torch.device("cpu"))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            with torch.no_grad():
                ref = warper(torch.from_numpy(img),
                             torch.from_numpy(flow)).numpy()
        ours = np.asarray(backwarp(
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(flow.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"size {(h, w)}")


def test_slomo_matches_reference_net(ref_slomo, tmp_path):
    """Golden numeric parity for the full SuperSloMo surface: the
    reference's own UNet(6,4) + UNet(20,5) + backWarp (models/slowmo.py)
    driven by the reference's own interpolation math exec'd verbatim from
    interpolate.py:101-136, vs avtex SuperSloMo after converting a
    real-format checkpoint ({state_dictFC, state_dictAT}, what
    validate.py:183-185 loads) through the load_torch_state +
    convert_slomo path. H=32 (even bottleneck extent) x W=96 (odd
    extent 3 at the bottom, exercising the upsample grid on odd sizes)."""
    import warnings
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp
    import torch

    H, W, SF = 32, 96, 4
    torch.manual_seed(5)
    flow_comp = ref_slomo.UNet(6, 4)
    arb_time = ref_slomo.UNet(20, 5)
    warper = ref_slomo.backWarp(W, H, torch.device("cpu"))

    g = np.random.default_rng(9)
    i0 = (g.random((1, 3, H, W)).astype(np.float32) - 0.43)
    i1 = (g.random((1, 3, H, W)).astype(np.float32) - 0.43)

    # the reference's own interpolation statements (interpolate.py)
    lines = open("/root/reference/contrastive_video_textures/"
                 "interpolate.py").read().splitlines()
    snip_flow = _extract_block(lines, "flowOut = self.flowComp",
                               "F_1_0 = flowOut")
    snip_step = _extract_block(lines, "temp = -t * (1 - t)",
                               "g_I1_F_t_1_f) / (wCoeff")
    ns = {
        "torch": torch,
        "self": SimpleNamespace(flowComp=flow_comp,
                                ArbTimeFlowIntrp=arb_time,
                                flowBackWarp=warper),
        "I0": torch.from_numpy(i0), "I1": torch.from_numpy(i1),
    }
    ref_frames = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with torch.no_grad():
            exec(snip_flow, ns)
            for k in range(1, SF):
                ns["t"] = k / SF
                exec(snip_step, ns)
                ref_frames.append(ns["Ft_p"].numpy())
    ref_out = np.stack(ref_frames)  # [SF-1, 1, 3, H, W]

    # save a real-format checkpoint and run the avtex import path
    ckpt = tmp_path / "SuperSloMo.ckpt"
    torch.save({"state_dictFC": flow_comp.state_dict(),
                "state_dictAT": arb_time.state_dict(),
                "epoch": 0}, str(ckpt))

    from avtex.nn.slomo import SuperSloMo
    from avtex.utils.convert import convert_slomo, load_torch_state

    m = SuperSloMo(dtype=jnp.float32)
    x0 = jnp.asarray(i0.transpose(0, 2, 3, 1))
    x1 = jnp.asarray(i1.transpose(0, 2, 3, 1))
    ts = tuple(k / SF for k in range(1, SF))
    params = jax.jit(m.init, static_argnums=3)(jax.random.key(0), x0, x1,
                                               ts)
    params = convert_slomo(load_torch_state(str(ckpt)), m, params,
                           x0, x1, ts)
    ours = np.asarray(m.apply(params, x0, x1, ts))  # [SF-1, 1, H, W, 3]
    ours = ours.transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)


def test_import_slowfast_tool(tmp_path):
    """tools/import_slowfast.py end-to-end on a pytorch-format checkpoint
    with pyslowfast naming (reduced geometry via --layers/--width): must
    convert with full coverage, embed finitely, write --out, and exit 0
    with IMPORT OK. Garbage input must exit 1 with IMPORT FAILED (no
    traceback) — the user-facing wrapper around the import path the
    reference drives at models/models.py:565-580."""
    import subprocess

    import torch

    net = _torch_slowfast(layers=(2, 1, 1, 1), width=8)
    _randomize_bn(net)
    ckpt = tmp_path / "tiny_slowfast.pth"
    torch.save(net.state_dict(), str(ckpt))

    tool = __file__.rsplit("/tests/", 1)[0] + "/tools/import_slowfast.py"
    out_file = tmp_path / "converted.msgpack"
    proc = subprocess.run(
        [sys.executable, tool, str(ckpt), "--layers", "2,1,1,1",
         "--width", "8", "--out", str(out_file)],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "IMPORT OK" in proc.stdout, proc.stdout
    assert "all tensors mapped" in proc.stdout
    assert out_file.exists() and out_file.stat().st_size > 1000

    bad = tmp_path / "bad.pkl"
    bad.write_text("garbage")
    proc = subprocess.run([sys.executable, tool, str(bad)],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 1
    assert "IMPORT FAILED" in proc.stderr
    assert "Traceback" not in proc.stderr
