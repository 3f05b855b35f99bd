"""Checkpointing with the reference's latest/best contract.

The reference writes ``{epoch, arch, state_dict, best_loss}`` to
``ckpt/<logname>_latest.pth.tar`` and copies to ``_best`` on improvement
(reference: main.py:461-483); eval auto-derives the best path from the flag
string (main.py:520-534). Same contract here, serialized with flax msgpack.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
from flax import serialization


def _paths(ckpt_dir: str, logname: str):
    os.makedirs(ckpt_dir, exist_ok=True)
    return (os.path.join(ckpt_dir, f"{logname}_latest"),
            os.path.join(ckpt_dir, f"{logname}_best"))


def save_checkpoint(ckpt_dir: str, logname: str, state: Any, epoch: int,
                    arch: str, best_loss: float, is_best: bool,
                    opt_state: Any = None, step: int = 0) -> str:
    """Write the latest checkpoint; copy to best on improvement.

    ``state`` is the model params; ``opt_state``/``step`` (optional) make
    the run fully resumable — the optimizer's momentum trace and schedule
    count survive, so a resumed run continues the StepLR where it left off
    (the reference loses both, main.py:356-370 restores only state_dict).
    """
    latest, best = _paths(ckpt_dir, logname)
    payload = {
        "epoch": epoch,
        "arch": arch,
        "best_loss": float(best_loss),
        "step": int(step),
        "state": serialization.to_state_dict(state),
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(opt_state)
    with open(latest, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree.map(lambda x: x, payload)))
    if is_best:
        shutil.copyfile(latest, best)
    return best if is_best else latest


def restore_checkpoint(path: str, state_template: Any,
                       opt_template: Any = None
                       ) -> Optional[Dict[str, Any]]:
    """Load a checkpoint written by save_checkpoint.

    Returns {"epoch", "arch", "best_loss", "step", "state"[, "opt_state"]}
    with "state" restored onto ``state_template`` (and "opt_state" onto
    ``opt_template`` when both are present), or None if the file doesn't
    exist.
    """
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if state_template is not None:
        payload["state"] = serialization.from_state_dict(
            state_template, payload["state"])
    payload.setdefault("step", 0)
    if opt_template is not None and "opt_state" in payload:
        payload["opt_state"] = serialization.from_state_dict(
            opt_template, payload["opt_state"])
    elif "opt_state" in payload:
        del payload["opt_state"]
    return payload
