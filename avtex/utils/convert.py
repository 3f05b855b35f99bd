"""Convert reference PyTorch checkpoints to avtex flax params.

The reference depends on external pretrained weights that are NOT shipped
in its repo (SURVEY.md §2.4): ``pytorch_vggish.pth`` (main.py:338) and
``SuperSloMo.ckpt`` (validate.py:183-185). Both nets are pure conv stacks
(no normalization layers), so an exact weight-for-weight conversion into
the avtex flax modules exists. This module performs it when the user has
the files; otherwise avtex runs with random init (VGGish) or crossfade
(SuperSloMo).

BatchNorm nets (``r3d18_KM_200ep.pth``-style 3D ResNets, torchvision 2D
ResNets — reference: models/models.py:565-580, video_models/resnet3d.py:
18-24) convert via ``convert_bn_folded``: the reference only ever runs
them eval-mode with frozen stats, and frozen BN is exactly a per-channel
affine, which folds into the ``norm="affine"`` inference variants of the
avtex encoders (avtex/nn/resnet3d.py) with zero numerical loss. This also
kills the norm-reduction op tail at inference — every norm becomes a
conv-epilogue fusion.

Conversion rule: torch conv weight [out, in, *k] -> flax kernel
[*k, in, out]; biases pass through. Layers are matched in declaration
order, asserting shapes — both implementations declare convs in identical
order.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """[out, in, *spatial] -> [*spatial, in, out]."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def _ordered_convs_from_torch(state: Dict[str, np.ndarray]
                              ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """(kernel, bias) pairs in declaration order from a torch state dict."""
    pairs = []
    for key in state:
        if key.endswith(".weight"):
            base = key[: -len(".weight")]
            w = np.asarray(state[key])
            if w.ndim < 3:
                continue  # not a conv
            b = state.get(base + ".bias")
            pairs.append((_torch_conv_to_flax(w),
                          None if b is None else np.asarray(b)))
    return pairs


def _group_by_module(flax_params, leaf_keys) -> Dict[str, dict]:
    """Group flax leaves by module path: {"A/B": {"kernel": ..., ...}}.

    The leading "params" collection key is dropped so module paths match
    the capture-pass paths from _module_call_order. Dict order is JAX's
    tree-flatten order (alphabetical per level).
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    by_module: Dict[str, dict] = {}
    for path, leaf in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys[-1] not in leaf_keys or np.ndim(leaf) < 1:
            continue
        mod = "/".join(k for k in keys[:-1] if k != "params")
        by_module.setdefault(mod, {})[keys[-1]] = leaf
    return by_module


def _replace_convs(conv_slots, conv_pairs) -> Dict[str, np.ndarray]:
    """Pair flax conv slots against torch (kernel, bias) pairs, checking
    count and per-slot shapes; returns the replacements dict."""
    if len(conv_slots) != len(conv_pairs):
        raise ValueError(
            f"conv count mismatch: flax has {len(conv_slots)}, torch ckpt "
            f"has {len(conv_pairs)}")
    replacements: Dict[str, np.ndarray] = {}
    for (mod, d), (w, b) in zip(conv_slots, conv_pairs):
        if tuple(d["kernel"].shape) != tuple(w.shape):
            raise ValueError(
                f"shape mismatch at {mod}: flax {d['kernel'].shape} vs "
                f"torch {w.shape}")
        replacements[mod + "/kernel"] = w
        if b is not None and "bias" in d:
            replacements[mod + "/bias"] = b
    return replacements


def _rebuild_with(flax_params, replacements):
    """Rebuild the flax tree with leaves swapped per the replacements dict
    (keys are "params"-stripped module paths + "/kernel" etc.)."""
    import jax

    def rebuild(path, leaf):
        keys = "/".join(str(getattr(p, "key", p)) for p in path
                        if str(getattr(p, "key", p)) != "params")
        if keys in replacements:
            return np.asarray(replacements[keys], dtype=np.float32)
        return leaf

    return jax.tree_util.tree_map_with_path(rebuild, flax_params)


def _assign_in_order(flax_params, conv_pairs):
    """Replace conv kernels/biases pairing torch declaration order against
    the flax tree's flatten (alphabetical) order — correct for flat nets
    like VGGish whose Conv_0..Conv_5 sort in declaration order."""
    by_module = _group_by_module(flax_params, ("kernel", "bias"))
    conv_slots = [(m, d) for m, d in by_module.items()
                  if d.get("kernel") is not None
                  and np.ndim(d["kernel"]) >= 3]
    return _rebuild_with(flax_params,
                         _replace_convs(conv_slots, conv_pairs))


def _torch_tokens(state: Dict[str, np.ndarray], eps: float = 1e-5):
    """Tokenize a torch state dict in declaration order.

    Yields ("conv", kernel, bias) for conv modules and ("norm", scale,
    shift) for BatchNorm modules with their frozen stats folded to the
    equivalent per-channel affine: scale = gamma/sqrt(var+eps),
    shift = beta - mean*scale. A conv bias immediately preceding a BN is
    folded into that BN's shift (the flax convs are bias-free).
    """
    bases: List[str] = []
    by_base: Dict[str, Dict[str, np.ndarray]] = {}
    for key in state:
        base, _, leaf = key.rpartition(".")
        if base not in by_base:
            by_base[base] = {}
            bases.append(base)
        by_base[base][leaf] = np.asarray(state[key])

    tokens = []
    for base in bases:
        mod = by_base[base]
        w = mod.get("weight")
        if "running_mean" in mod:
            gamma = mod.get("weight")
            beta = mod.get("bias")
            mean, var = mod["running_mean"], mod["running_var"]
            scale = (1.0 if gamma is None else gamma) / np.sqrt(var + eps)
            shift = (0.0 if beta is None else beta) - mean * scale
            if tokens and tokens[-1][0] == "conv" and tokens[-1][2] is not None:
                kind, k, b = tokens[-1]
                tokens[-1] = (kind, k, None)
                shift = shift + scale * b
            tokens.append(("norm", scale.astype(np.float32),
                           shift.astype(np.float32)))
        elif w is not None and w.ndim >= 3:
            tokens.append(("conv", _torch_conv_to_flax(w), mod.get("bias")))
    return tokens


def _module_call_order(module, flax_params, *example_args) -> List[str]:
    """Module paths ("A/B/C") in first-call order, via a capture pass.

    Flax param dicts flatten alphabetically (Conv_0 sorts after
    BasicBlock3D_*), so declaration order cannot be read off the tree.
    The capture_intermediates FILTER fires once per module call at trace
    time, so paths are recorded from the filter itself under an abstract
    jax.eval_shape trace — zero device work (an eager forward here would
    be 150+ sequential remote dispatches at the tunnel's ~30 ms floor
    when the default backend is the TPU; returning the intermediates
    dict through eval_shape does not work either, because JAX tree
    flattening SORTS dict keys and destroys insertion order). The filter
    fires post-order (a child sows before its parent returns), so each
    path is expanded to all its prefixes — reproducing the insertion
    order of the eager capture dict, where a parent key is created at
    its first descendant's sow.
    """
    import jax

    seen: Dict[str, None] = {}

    def record(mod, name):
        path = tuple(str(p) for p in mod.path)
        for i in range(1, len(path) + 1):
            seen.setdefault("/".join(path[:i]))
        return False  # record order only; capture no values

    jax.eval_shape(
        lambda p, *a: module.apply(p, *a, capture_intermediates=record),
        flax_params, *example_args)
    return list(seen)


def convert_bn_folded(torch_state: Dict[str, np.ndarray], module,
                      flax_params, *example_args, eps: float = 1e-5):
    """Import a frozen-BatchNorm torch net into a ``norm="affine"`` avtex
    net: conv kernels copied, each BN folded into the matching Affine's
    (scale, bias). Call order must interleave identically
    (conv, norm, conv, norm, ...) — asserted per slot, with shape checks.

    ``module``/``example_args`` drive one apply pass to recover call order
    (example_args can be tiny — only shapes' divisibility matters).
    """
    tokens = _torch_tokens(torch_state, eps)
    call_order = _module_call_order(module, flax_params, *example_args)
    by_module = _group_by_module(flax_params, ("kernel", "bias", "scale"))
    typed_slots = []
    for mod in call_order:
        d = by_module.get(mod)
        if not d:
            continue
        if "scale" in d:
            typed_slots.append(("norm", mod, d))
        elif np.ndim(d.get("kernel")) >= 3:
            typed_slots.append(("conv", mod, d))
    if len(typed_slots) != len(tokens):
        raise ValueError(f"slot count mismatch: flax {len(typed_slots)} vs "
                         f"torch {len(tokens)}")

    replacements = {}
    for (kind, mod, d), tok in zip(typed_slots, tokens):
        if kind != tok[0]:
            raise ValueError(f"slot kind mismatch at {mod}: flax {kind} vs "
                             f"torch {tok[0]}")
        if kind == "conv":
            _, w, b = tok
            if tuple(d["kernel"].shape) != tuple(w.shape):
                raise ValueError(f"shape mismatch at {mod}: flax "
                                 f"{d['kernel'].shape} vs torch {w.shape}")
            replacements[mod + "/kernel"] = w
            if b is not None and "bias" in d:
                replacements[mod + "/bias"] = b
        else:
            _, scale, shift = tok
            if tuple(d["scale"].shape) != tuple(scale.shape):
                raise ValueError(f"norm shape mismatch at {mod}: flax "
                                 f"{d['scale'].shape} vs torch {scale.shape}")
            replacements[mod + "/scale"] = scale
            replacements[mod + "/bias"] = shift

    return _rebuild_with(flax_params, replacements)


def convert_vggish(torch_state: Dict[str, np.ndarray], flax_params):
    """pytorch_vggish.pth features -> avtex.nn.vggish.VGGish params."""
    convs = _ordered_convs_from_torch(torch_state)
    # keep only the 6 feature convs (drop any fc/embedding tensors)
    convs = [c for c in convs if c[0].ndim == 4][:6]
    return _assign_in_order(flax_params, convs)


def _assign_convs_in_call_order(module, flax_params, example_args,
                                conv_pairs):
    """Replace conv kernels/biases pairing torch declaration order against
    the flax modules' TRUE first-call order (via a capture pass).

    Alphabetical tree-flatten order is wrong for nested nets: in the
    SuperSloMo UNet ``Conv_2`` (the final conv3) sorts before ``_Down_0``,
    and ``arb_time`` sorts before ``flow_comp`` — but torch state dicts
    list registration order (conv1, conv2, downs, ups, conv3; flowComp
    before arbTimeFlowIntrp). Call order matches torch registration order
    for these nets, so pair on that, asserting shapes per slot.
    """
    call_order = _module_call_order(module, flax_params, *example_args)
    by_module = _group_by_module(flax_params, ("kernel", "bias"))
    conv_slots = [(m, by_module[m]) for m in call_order
                  if by_module.get(m, {}).get("kernel") is not None
                  and np.ndim(by_module[m]["kernel"]) >= 3]
    return _rebuild_with(flax_params,
                         _replace_convs(conv_slots, conv_pairs))


def convert_slomo(torch_state: Dict[str, np.ndarray], module, flax_params,
                  *example_args):
    """SuperSloMo.ckpt (flowComp + arbTimeFlowIntrp) -> avtex SuperSloMo.

    ``module``/``example_args`` drive one capture pass to recover the true
    conv call order (golden-tested against the reference's own torch nets,
    tests/test_reference_parity.py::test_slomo_matches_reference_net).
    """
    convs = [c for c in _ordered_convs_from_torch(torch_state)
             if c[0].ndim == 4]
    return _assign_convs_in_call_order(module, flax_params, example_args,
                                       convs)


def find_vggish_checkpoint(explicit: str = None) -> str:
    """Locate pytorch_vggish.pth: explicit path, $AVTEX_VGGISH_CKPT, or the
    reference's conventional locations (reference: main.py:338 loads
    ``pretrained/pytorch_vggish.pth``). Returns None if absent."""
    import os
    for cand in (explicit, os.environ.get("AVTEX_VGGISH_CKPT"),
                 "pretrained/pytorch_vggish.pth", "pytorch_vggish.pth"):
        if cand and os.path.exists(cand):
            return cand
    return None


def maybe_load_vggish(vggish_params, path: str = None, *, context: str = ""):
    """Load pretrained VGGish weights into ``vggish_params`` if a checkpoint
    can be found; otherwise warn LOUDLY and return the params unchanged.

    The reference always loads pytorch_vggish.pth (main.py:338); random
    VGGish conv features score driving audio meaninglessly, so running
    without the checkpoint deserves more than silence.

    Returns (params, loaded: bool).
    """
    import sys
    found = find_vggish_checkpoint(path)
    if found is None:
        print(f"[avtex] WARNING: no pytorch_vggish.pth found ({context}); "
              "VGGish runs with RANDOM weights — audio features are "
              "meaningless. Set $AVTEX_VGGISH_CKPT or place the file at "
              "pretrained/pytorch_vggish.pth.", file=sys.stderr)
        return vggish_params, False
    params = convert_vggish(load_torch_state(found), vggish_params)
    print(f"[avtex] loaded pretrained VGGish weights from {found}")
    return params, True


def maybe_load_vggish_into_model(model_params, path: str = None, *,
                                 context: str = ""):
    """Graft pretrained VGGish weights into the shared ``audio_encoder``
    subtree of full ContrastiveTextures params (model_type=2 init —
    reference: main.py:338 always starts from pretrained VGGish).

    Returns (params, loaded: bool); params unchanged (plus a loud warning)
    when no checkpoint is found.
    """
    from flax.core import FrozenDict, freeze, unfreeze

    frozen = isinstance(model_params, FrozenDict)
    tree = unfreeze(model_params) if frozen else dict(model_params)
    sub = tree.get("params", {}).get("audio_encoder")
    if sub is None:
        return model_params, False
    new_sub, loaded = maybe_load_vggish({"params": sub}, path,
                                        context=context)
    if not loaded:
        return model_params, False
    tree["params"] = dict(tree["params"])
    tree["params"]["audio_encoder"] = new_sub["params"]
    return (freeze(tree) if frozen else tree), True


def find_slomo_checkpoint(explicit: str = None) -> str:
    """Locate SuperSloMo.ckpt: explicit path, $AVTEX_SLOMO_CKPT, or the
    reference's conventional locations (validate.py:183-185 loads
    ``pretrained/SuperSloMo.ckpt``). Returns None if absent."""
    import os
    for cand in (explicit, os.environ.get("AVTEX_SLOMO_CKPT"),
                 "pretrained/SuperSloMo.ckpt", "SuperSloMo.ckpt"):
        if cand and os.path.exists(cand):
            return cand
    return None


def maybe_make_slomo_interp_fn(path: str = None, size=(224, 224)):
    """interp_fn from a pretrained SuperSloMo checkpoint, or None.

    The reference runs SuperSloMo at every jump (validate.py:183-185,
    :587-613); without the (unshipped) checkpoint avtex stitches with the
    native crossfade instead — random SloMo weights would look worse than
    crossfade, so unlike VGGish this does not fall back to random init.
    """
    found = find_slomo_checkpoint(path)
    if found is None:
        return None
    import jax.numpy as jnp

    from avtex.synth.interp import init_slomo, make_interp_fn
    module, params = init_slomo(size=size)
    # call-order capture is shape-independent; run it tiny
    ex = jnp.zeros((1, 32, 32, 3))
    params = convert_slomo(load_torch_state(found), module, params,
                           ex, ex, (0.5,))
    print(f"[avtex] loaded pretrained SuperSloMo weights from {found}")
    return make_interp_fn(module, params)


def find_encoder_checkpoint(arch: str, explicit: str = None) -> str:
    """Locate a pretrained encoder checkpoint: explicit path,
    $AVTEX_ENCODER_CKPT, or the reference's conventional filenames
    (resnet3d.py:18-24 ``r3d18_KM_200ep.pth`` under ``pretrained/``).
    Returns None if absent."""
    import os
    names = {"resnet18": "r3d18_KM_200ep.pth",
             "resnet18_2d": "resnet18-imagenet.pth",
             "slowfast": "SLOWFAST_8x8_R50.pkl"}
    fname = names.get(arch)
    for cand in (explicit, os.environ.get("AVTEX_ENCODER_CKPT"),
                 fname and f"pretrained/{fname}", fname):
        if cand and os.path.exists(cand):
            return cand
    return None


def maybe_load_encoder(arch: str, module, params, *example_args,
                       path: str = None, context: str = ""):
    """Load a pretrained BN torch checkpoint into a ``norm="affine"``
    encoder via convert_bn_folded, if one can be found (reference:
    models/models.py:556-563 loads r3d18_KM_200ep.pth for resnet18).

    Returns (params, loaded: bool); silent no-op when no file exists (the
    reference's checkpoints are external artifacts it does not ship).
    """
    found = find_encoder_checkpoint(arch, path)
    if found is None:
        return params, False
    if arch == "slowfast":
        params = convert_slowfast(load_slowfast_state(found), params)
    else:
        state = load_torch_state(found)
        # drop classifier tensors (fc.*) — the feature forward never uses them
        state = {k: v for k, v in state.items() if not k.startswith("fc.")}
        params = convert_bn_folded(state, module, params, *example_args)
    print(f"[avtex] loaded pretrained {arch} weights from {found} "
          f"({context})")
    return params, True


def _fold_bn(mod: Dict[str, np.ndarray], eps: float = 1e-5):
    """Frozen-BN tensors -> equivalent per-channel (scale, shift)."""
    gamma, beta = mod.get("weight"), mod.get("bias")
    mean, var = mod["running_mean"], mod["running_var"]
    scale = (1.0 if gamma is None else gamma) / np.sqrt(var + eps)
    shift = (0.0 if beta is None else beta) - mean * scale
    return scale.astype(np.float32), shift.astype(np.float32)


def convert_slowfast(torch_state: Dict[str, np.ndarray], flax_params,
                     layers=(3, 4, 6, 3), eps: float = 1e-5):
    """Import a pyslowfast SlowFast-R50 checkpoint (pytorch-format module
    naming) into ``SlowFastR50(norm="affine")`` params.

    This is the reference's flagship pretrained encoder: pyslowfast's
    ``SLOWFAST_8x8_R50`` with the head stripped (reference:
    models/models.py:565-580 loads the caffe2 pkl via ActionPredictor and
    replaces head.dropout/projection/act with Identity). The reference
    only ever runs it eval-mode, so every BatchNorm folds losslessly into
    the affine slots.

    Name mapping (pyslowfast video_model_builder.SlowFast -> avtex
    avtex/nn/slowfast.py::SlowFastR50):

      s1.pathway0_stem.{conv,bn}        -> Conv_0 / Affine_0
      s1.pathway1_stem.{conv,bn}        -> fast_stem_kernel / Affine_1
      s1_fuse.{conv_f2s,bn}             -> Conv_1 / Affine_2
      s{2+i}.pathway0_res{j}.*          -> SFBottleneck_{2g}   (slow)
      s{2+i}.pathway1_res{j}.*          -> SFBottleneck_{2g+1} (fast)
        with g = sum(layers[:i]) + j and, inside a block,
        branch2.a/a_bn -> Conv_0/Affine_0, b/b_bn -> Conv_1/Affine_1,
        c/c_bn -> Conv_2/Affine_2, branch1/branch1_bn -> Conv_3/Affine_3
      s{2+i}_fuse.{conv_f2s,bn}         -> Conv_{2+i} / Affine_{3+i}
      head.*                            -> dropped (the reference strips it)

    Every mapped tensor is shape-checked against the flax slot; unmapped
    non-head torch keys and unmatched flax slots raise with the offending
    names, so a naming drift can never corrupt silently.
    """
    import jax

    # group torch tensors by module base
    by_base: Dict[str, Dict[str, np.ndarray]] = {}
    for key, v in torch_state.items():
        if key.startswith("head.") or key.endswith("num_batches_tracked"):
            continue
        base, _, leaf = key.rpartition(".")
        by_base.setdefault(base, {})[leaf] = np.asarray(v)

    repl: Dict[str, np.ndarray] = {}
    used = set()

    def take_conv(torch_mod: str, avtex_path: str):
        mod = by_base.get(torch_mod)
        if mod is None or "weight" not in mod:
            raise ValueError(f"slowfast ckpt missing conv {torch_mod!r} "
                             f"(have e.g. {sorted(by_base)[:8]})")
        repl[avtex_path] = _torch_conv_to_flax(mod["weight"])
        used.add(torch_mod)

    def take_bn(torch_mod: str, avtex_prefix: str):
        mod = by_base.get(torch_mod)
        if mod is None or "running_mean" not in mod:
            raise ValueError(f"slowfast ckpt missing bn {torch_mod!r}")
        scale, shift = _fold_bn(mod, eps)
        repl[avtex_prefix + "/scale"] = scale
        repl[avtex_prefix + "/bias"] = shift
        used.add(torch_mod)

    take_conv("s1.pathway0_stem.conv", "Conv_0/kernel")
    take_bn("s1.pathway0_stem.bn", "Affine_0")
    take_conv("s1.pathway1_stem.conv", "fast_stem_kernel")
    take_bn("s1.pathway1_stem.bn", "Affine_1")
    take_conv("s1_fuse.conv_f2s", "Conv_1/kernel")
    take_bn("s1_fuse.bn", "Affine_2")

    g = 0
    for i, n_blocks in enumerate(layers):
        s = f"s{2 + i}"
        for j in range(n_blocks):
            for pathway, blk in ((0, f"SFBottleneck_{2 * g}"),
                                 (1, f"SFBottleneck_{2 * g + 1}")):
                t = f"{s}.pathway{pathway}_res{j}"
                for tk, ak in (("branch2.a", "Conv_0"),
                               ("branch2.b", "Conv_1"),
                               ("branch2.c", "Conv_2")):
                    take_conv(f"{t}.{tk}", f"{blk}/{ak}/kernel")
                    take_bn(f"{t}.{tk}_bn", f"{blk}/Affine_{ak[-1]}")
                if f"{t}.branch1" in by_base:
                    take_conv(f"{t}.branch1", f"{blk}/Conv_3/kernel")
                    take_bn(f"{t}.branch1_bn", f"{blk}/Affine_3")
            g += 1
        if i != len(layers) - 1:
            # top-level auto-name counters: Conv_0 slow stem, Conv_1 stem
            # lateral, then one lateral per non-final stage; Affine_0/1
            # stems, Affine_2 stem lateral, then stage laterals.
            take_conv(f"{s}_fuse.conv_f2s", f"Conv_{2 + i}/kernel")
            take_bn(f"{s}_fuse.bn", f"Affine_{3 + i}")

    leftover = [b for b in by_base if b not in used]
    if leftover:
        raise ValueError(f"slowfast ckpt has unmapped modules: {leftover}")

    hit = set()

    def rebuild(path, leaf):
        keys = "/".join(str(getattr(p, "key", p)) for p in path
                        if str(getattr(p, "key", p)) != "params")
        if keys in repl:
            w = repl[keys]
            if tuple(np.shape(leaf)) != tuple(w.shape):
                raise ValueError(f"shape mismatch at {keys}: flax "
                                 f"{np.shape(leaf)} vs torch {w.shape}")
            hit.add(keys)
            return np.asarray(w, dtype=np.float32)
        return leaf

    out = jax.tree_util.tree_map_with_path(rebuild, flax_params)
    missed = sorted(set(repl) - hit)
    if missed:
        raise ValueError(f"slowfast import: no flax slot for {missed[:10]} "
                         f"({len(missed)} total) — wrong layers/norm?")
    return out


# pyslowfast stores the c2-format SLOWFAST_8x8_R50.pkl with caffe2 blob
# names; these rules reconstruct pyslowfast's c2->pytorch name conversion
# (slowfast/utils/c2_model_loading.py::get_name_convert_func) for the
# SlowFast blob families. Unmatched blobs surface loudly in
# convert_slowfast's coverage check — never silently.
def _c2_name_to_pt(name: str) -> str:
    import re
    rules = (
        # fuse convs/bns: 't_pool1_subsample*' (stem), 't_res{N}_{J}_...'
        (r"^t_pool1_subsample_bn_(.*)$", r"s1_fuse.bn.\1"),
        (r"^t_pool1_subsample_(.*)$", r"s1_fuse.conv_f2s.\1"),
        (r"^t_res(\d+)_(\d+)_branch2c_bn_subsample_bn_(.*)$",
         lambda m: f"s{int(m.group(1)) + 1}_fuse.bn.{m.group(3)}"),
        (r"^t_res(\d+)_(\d+)_branch2c_bn_subsample_(.*)$",
         lambda m: f"s{int(m.group(1)) + 1}_fuse.conv_f2s.{m.group(3)}"),
        # stems: 'conv1_fast_w', 'res_conv1_fast_bn_s', 'conv1_w', ...
        (r"^conv1_fast_(.*)$", r"s1.pathway1_stem.conv.\1"),
        (r"^res_conv1_fast_bn_(.*)$", r"s1.pathway1_stem.bn.\1"),
        (r"^conv1_(.*)$", r"s1.pathway0_stem.conv.\1"),
        (r"^res_conv1_bn_(.*)$", r"s1.pathway0_stem.bn.\1"),
        # blocks: 'res2_0_branch2a_fast_w' / 'res2_0_branch2a_bn_fast_s'
        (r"^res(\d)_(\d+)_branch(\d)([a-c]?)_bn_fast_(.*)$",
         lambda m: f"s{m.group(1)}.pathway1_res{m.group(2)}."
                   f"{_c2_branch(m.group(3), m.group(4))}_bn.{m.group(5)}"),
        (r"^res(\d)_(\d+)_branch(\d)([a-c]?)_fast_(.*)$",
         lambda m: f"s{m.group(1)}.pathway1_res{m.group(2)}."
                   f"{_c2_branch(m.group(3), m.group(4))}.{m.group(5)}"),
        (r"^res(\d)_(\d+)_branch(\d)([a-c]?)_bn_(.*)$",
         lambda m: f"s{m.group(1)}.pathway0_res{m.group(2)}."
                   f"{_c2_branch(m.group(3), m.group(4))}_bn.{m.group(5)}"),
        (r"^res(\d)_(\d+)_branch(\d)([a-c]?)_(.*)$",
         lambda m: f"s{m.group(1)}.pathway0_res{m.group(2)}."
                   f"{_c2_branch(m.group(3), m.group(4))}.{m.group(5)}"),
        (r"^pred_(.*)$", r"head.projection.\1"),
    )
    for pat, rep in rules:
        m = re.match(pat, name)
        if m:
            return rep(m) if callable(rep) else re.sub(pat, rep, name)
    return name


def _c2_branch(num: str, letter: str) -> str:
    return f"branch2.{letter}" if num == "2" else "branch1"


_C2_LEAF = {"w": "weight", "b": "bias", "s": "weight", "rm": "running_mean",
            "riv": "running_var"}


def load_slowfast_state(path: str) -> Dict[str, np.ndarray]:
    """Load a SlowFast checkpoint into pytorch-format naming.

    Accepts: a torch .pth/.pyth save (optionally wrapped in
    ``model_state``/``state_dict``), or the caffe2 ``.pkl`` from the
    pyslowfast model zoo ({"blobs": {...}} — the exact artifact the
    reference points at, models/models.py:573), whose blob names are
    converted via ``_c2_name_to_pt``. BN leaves: c2 ``_s``->weight
    (scale), ``_b``->bias, ``_rm``/``_riv``->running stats.
    """
    import pickle

    try:
        state = load_torch_state(path)
        if state:
            return {k[len("model."):] if k.startswith("model.") else k: v
                    for k, v in state.items()}
    except Exception:
        pass
    with open(path, "rb") as f:
        obj = pickle.load(f, encoding="latin1")
    blobs = obj.get("blobs", obj) if isinstance(obj, dict) else obj
    out = {}
    for name, v in blobs.items():
        if not hasattr(v, "shape") or "momentum" in name:
            continue
        base, _, leaf = name.rpartition("_")
        if name.endswith("_riv"):
            base, leaf = name[: -len("_riv")], "riv"
        elif name.endswith("_rm"):
            base, leaf = name[: -len("_rm")], "rm"
        if leaf not in _C2_LEAF:
            continue
        pt = _c2_name_to_pt(f"{base}_{leaf}")
        pt_base, _, pt_leaf = pt.rpartition(".")
        out[f"{pt_base}.{_C2_LEAF.get(pt_leaf, pt_leaf)}"] = np.asarray(v)
    return out


def maybe_load_encoder_into_model(arch: str, model_params, *,
                                  window: int = 8, path: str = None,
                                  context: str = ""):
    """Graft a pretrained frozen-BN encoder checkpoint into BOTH towers'
    ``video_encoder`` subtrees of full ContrastiveTextures params
    (``norm="affine"`` configuration).

    The reference loads the same pretrained net into its query and target
    encoders before any training (models/models.py:556-580 builds both
    from the same checkpoint); synthesis without a trained contrastive
    checkpoint should therefore start from the pretrained encoders, not
    random affine weights. Returns (params, loaded: bool); silent no-op
    when no checkpoint file exists (they are external artifacts).
    """
    found = find_encoder_checkpoint(arch, path)
    if found is None:
        return model_params, False

    import jax.numpy as jnp
    from flax.core import FrozenDict, freeze, unfreeze

    from avtex.nn.encoders import build_encoder

    module, _, kind = build_encoder(arch, norm="affine")
    # Tiny example input: the apply pass only recovers call order, so only
    # shape divisibility matters (T=window, 32x32 frames).
    x = jnp.zeros((1, max(window, 4), 32, 32, 3), jnp.float32)
    if kind == "slowfast":
        from avtex.nn.slowfast import slowfast_pathways
        example_args = slowfast_pathways(x)
    else:
        example_args = (x,)

    frozen = isinstance(model_params, FrozenDict)
    tree = unfreeze(model_params) if frozen else dict(model_params)
    col = dict(tree.get("params", {}))
    loaded_any = False
    for tower in ("q_embedder", "t_embedder"):
        sub = col.get(tower, {}).get("video_encoder")
        if sub is None:
            continue
        new_sub, ok = _load_encoder_subtree(arch, module, {"params": sub},
                                            example_args, found)
        if not ok:
            return model_params, False
        col[tower] = dict(col[tower])
        col[tower]["video_encoder"] = new_sub["params"]
        loaded_any = True
    if not loaded_any:
        return model_params, False
    tree["params"] = col
    print(f"[avtex] loaded pretrained {arch} encoder weights from {found} "
          f"into both towers ({context})")
    return (freeze(tree) if frozen else tree), True


def _load_encoder_subtree(arch, module, params, example_args, found):
    try:
        if arch == "slowfast":
            state = load_slowfast_state(found)
            return convert_slowfast(state, params), True
        state = load_torch_state(found)
        state = {k: v for k, v in state.items() if not k.startswith("fc.")}
        return convert_bn_folded(state, module, params, *example_args), True
    except ValueError as e:
        import sys
        print(f"[avtex] WARNING: pretrained {arch} import from {found} "
              f"failed ({e}); continuing with current weights",
              file=sys.stderr)
        return params, False


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.ckpt into numpy arrays (torch CPU)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    for wrap in ("state_dict", "model_state"):  # pyslowfast uses model_state
        if isinstance(obj, dict) and wrap in obj:
            obj = obj[wrap]
    # SuperSloMo.ckpt stores two nested state dicts (the reference loads
    # them into flowComp / ArbTimeFlowIntrp separately, validate.py:183-185);
    # flatten them FC-first to match the avtex SuperSloMo call order.
    if isinstance(obj, dict) and "state_dictFC" in obj and \
            "state_dictAT" in obj:
        flat = {}
        for prefix, sub in (("flowComp", obj["state_dictFC"]),
                            ("arbTimeFlowIntrp", obj["state_dictAT"])):
            for k, v in sub.items():
                flat[f"{prefix}.{k}"] = v
        obj = flat
    return {k: v.numpy() for k, v in obj.items()
            if hasattr(v, "numpy")}
