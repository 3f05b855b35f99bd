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


def _assign_in_order(flax_params, conv_pairs):
    """Walk the flax tree in insertion order, replacing conv kernels/biases."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    # group leaves by module path (drop the final 'kernel'/'bias' key)
    slots: List[Tuple[str, dict]] = []
    by_module: Dict[str, dict] = {}
    for path, leaf in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys[-1] not in ("kernel", "bias") or np.ndim(leaf) < 1:
            continue
        mod = "/".join(keys[:-1])
        if mod not in by_module:
            by_module[mod] = {}
            slots.append((mod, by_module[mod]))
        by_module[mod][keys[-1]] = leaf
    conv_slots = [(m, d) for m, d in slots if d.get("kernel") is not None
                  and np.ndim(d["kernel"]) >= 3]
    if len(conv_slots) != len(conv_pairs):
        raise ValueError(
            f"conv count mismatch: flax has {len(conv_slots)}, torch ckpt "
            f"has {len(conv_pairs)}")

    replacements = {}
    for (mod, d), (w, b) in zip(conv_slots, conv_pairs):
        if tuple(d["kernel"].shape) != tuple(w.shape):
            raise ValueError(
                f"shape mismatch at {mod}: flax {d['kernel'].shape} vs "
                f"torch {w.shape}")
        replacements[mod + "/kernel"] = w
        if b is not None and "bias" in d:
            replacements[mod + "/bias"] = b

    def rebuild(path, leaf):
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        if keys in replacements:
            return np.asarray(replacements[keys], dtype=np.float32)
        return leaf

    return jax.tree_util.tree_map_with_path(rebuild, flax_params)


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
    BasicBlock3D_*), so declaration order cannot be read off the tree;
    capture_intermediates preserves true call order via dict insertion.
    """
    _, state = module.apply(flax_params, *example_args,
                            capture_intermediates=lambda mod, name: True)
    order: List[str] = []

    def walk(d, prefix):
        for k, v in d.items():
            if k == "__call__" or not hasattr(v, "items"):
                continue
            order.append("/".join(prefix + [k]))
            walk(v, prefix + [k])

    walk(state["intermediates"], [])
    return order


def convert_bn_folded(torch_state: Dict[str, np.ndarray], module,
                      flax_params, *example_args, eps: float = 1e-5):
    """Import a frozen-BatchNorm torch net into a ``norm="affine"`` avtex
    net: conv kernels copied, each BN folded into the matching Affine's
    (scale, bias). Call order must interleave identically
    (conv, norm, conv, norm, ...) — asserted per slot, with shape checks.

    ``module``/``example_args`` drive one apply pass to recover call order
    (example_args can be tiny — only shapes' divisibility matters).
    """
    import jax

    tokens = _torch_tokens(torch_state, eps)
    call_order = _module_call_order(module, flax_params, *example_args)

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    by_module: Dict[str, dict] = {}
    for path, leaf in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys[-1] not in ("kernel", "bias", "scale") or np.ndim(leaf) < 1:
            continue
        # drop the leading "params" collection key
        mod = "/".join(k for k in keys[:-1] if k != "params")
        by_module.setdefault(mod, {})[keys[-1]] = leaf
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

    def rebuild(path, leaf):
        keys = "/".join(str(getattr(p, "key", p)) for p in path
                        if str(getattr(p, "key", p)) != "params")
        if keys in replacements:
            return np.asarray(replacements[keys], dtype=np.float32)
        return leaf

    return jax.tree_util.tree_map_with_path(rebuild, flax_params)


def convert_vggish(torch_state: Dict[str, np.ndarray], flax_params):
    """pytorch_vggish.pth features -> avtex.nn.vggish.VGGish params."""
    convs = _ordered_convs_from_torch(torch_state)
    # keep only the 6 feature convs (drop any fc/embedding tensors)
    convs = [c for c in convs if c[0].ndim == 4][:6]
    return _assign_in_order(flax_params, convs)


def convert_slomo(torch_state: Dict[str, np.ndarray], flax_params):
    """SuperSloMo.ckpt (flowComp + arbTimeFlowIntrp) -> avtex SuperSloMo."""
    convs = [c for c in _ordered_convs_from_torch(torch_state)
             if c[0].ndim == 4]
    return _assign_in_order(flax_params, convs)


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
    from avtex.synth.interp import init_slomo, make_interp_fn
    module, params = init_slomo(size=size)
    params = convert_slomo(load_torch_state(found), params)
    print(f"[avtex] loaded pretrained SuperSloMo weights from {found}")
    return make_interp_fn(module, params)


def find_encoder_checkpoint(arch: str, explicit: str = None) -> str:
    """Locate a pretrained encoder checkpoint: explicit path,
    $AVTEX_ENCODER_CKPT, or the reference's conventional filenames
    (resnet3d.py:18-24 ``r3d18_KM_200ep.pth`` under ``pretrained/``).
    Returns None if absent."""
    import os
    names = {"resnet18": "r3d18_KM_200ep.pth"}
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
    state = load_torch_state(found)
    # drop classifier tensors (fc.*) — the feature forward never uses them
    state = {k: v for k, v in state.items() if not k.startswith("fc.")}
    params = convert_bn_folded(state, module, params, *example_args)
    print(f"[avtex] loaded pretrained {arch} weights from {found} "
          f"({context})")
    return params, True


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
    state = load_torch_state(found)
    state = {k: v for k, v in state.items() if not k.startswith("fc.")}
    try:
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
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() for k, v in obj.items()
            if hasattr(v, "numpy")}
