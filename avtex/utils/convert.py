"""Convert reference PyTorch checkpoints to avtex flax params.

The reference depends on external pretrained weights that are NOT shipped
in its repo (SURVEY.md §2.4): ``pytorch_vggish.pth`` (main.py:338) and
``SuperSloMo.ckpt`` (validate.py:183-185). Both nets are pure conv stacks
(no normalization layers), so an exact weight-for-weight conversion into
the avtex flax modules exists. This module performs it when the user has
the files; otherwise avtex runs with random init (VGGish) or crossfade
(SuperSloMo).

3D ResNet weights (``r3d18_KM_200ep.pth``) are NOT convertible exactly:
the torch nets use BatchNorm running stats while avtex uses stateless
GroupNorm (a deliberate TPU-first change) — documented here so nobody
chases that ghost.

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


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.ckpt into numpy arrays (torch CPU)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() for k, v in obj.items()
            if hasattr(v, "numpy")}
