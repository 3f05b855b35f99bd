"""User-facing pretrained SlowFast import check.

Runs the full import path on a real checkpoint — the pyslowfast
``SLOWFAST_8x8_R50.pkl`` caffe2 artifact the reference loads
(reference: models/models.py:565-580), or any pytorch-format
.pth/.pyth save of the same architecture:

  1. ``load_slowfast_state``: pkl/pth -> pytorch-format numpy dict;
  2. ``convert_slowfast``: name-map + BN-fold into
     ``SlowFastR50(norm="affine")`` — every tensor shape-checked, and
     unmapped keys on EITHER side raise with the offending names;
  3. embeds a synthetic clip and prints the embedding stats.

Exit 0 + "IMPORT OK" means the checkpoint will load identically inside
the synthesis/training CLIs (which auto-discover it at
``pretrained/SLOWFAST_8x8_R50.pkl`` or ``$AVTEX_ENCODER_CKPT`` —
avtex/utils/convert.py::find_encoder_checkpoint).

Usage:
  python tools/import_slowfast.py path/to/SLOWFAST_8x8_R50.pkl
  python tools/import_slowfast.py ckpt.pkl --out converted.msgpack
"""

import argparse
import os
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ckpt", help="SLOWFAST_8x8_R50.pkl (caffe2) or .pth")
    ap.add_argument("--out", default=None,
                    help="write converted flax params (msgpack)")
    ap.add_argument("--layers", default="3,4,6,3",
                    help="bottlenecks per stage (non-default only for "
                         "reduced test checkpoints)")
    ap.add_argument("--width", type=int, default=64,
                    help="stem width (non-default only for tests)")
    args = ap.parse_args()
    layers = tuple(int(x) for x in args.layers.split(","))

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from avtex.nn.slowfast import SlowFastR50, slowfast_pathways
    from avtex.utils.convert import convert_slowfast, load_slowfast_state

    print(f"[1/3] loading {args.ckpt}")
    try:
        state = load_slowfast_state(args.ckpt)
    except Exception as e:
        print(f"IMPORT FAILED: cannot read {args.ckpt} as a torch save or "
              f"caffe2 pkl ({type(e).__name__}: {e})", file=sys.stderr)
        return 1
    if not state:
        print(f"IMPORT FAILED: no tensors found in {args.ckpt}",
              file=sys.stderr)
        return 1
    n_bn = sum(1 for k in state if k.endswith("running_mean"))
    n_conv = sum(1 for k in state if k.endswith(".weight")
                 and k.replace(".weight", ".running_mean") not in state)
    print(f"      {len(state)} tensors ({n_conv} conv weights, "
          f"{n_bn} BN layers)")

    print("[2/3] converting into SlowFastR50(norm='affine')")
    model = SlowFastR50(norm="affine", layers=layers, width=args.width)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((1, 8, 64, 64, 3)), jnp.float32)
    slow, fast = slowfast_pathways(frames)
    params = jax.jit(model.init)(jax.random.key(0), slow, fast)
    try:
        params = convert_slowfast(state, params, layers=layers)
    except ValueError as e:
        print(f"IMPORT FAILED: {e}", file=sys.stderr)
        print("      (every conv/BN tensor must map by name and shape — "
              "is this a SlowFast-R50 8x8 checkpoint?)", file=sys.stderr)
        return 1
    n_slots = len(jax.tree.leaves(params))
    print(f"      all tensors mapped and shape-checked "
          f"({n_slots} flax param leaves)")

    print("[3/3] embedding a synthetic clip")
    emb = np.asarray(jax.jit(model.apply)(params, slow, fast))
    ok = np.isfinite(emb).all() and float(np.abs(emb).sum()) > 0
    print(f"      embedding shape {emb.shape}  "
          f"norm {float(np.linalg.norm(emb)):.4f}  "
          f"mean {emb.mean():.5f}  std {emb.std():.5f}  "
          f"finite={bool(np.isfinite(emb).all())}")

    if args.out:
        from flax import serialization
        with open(args.out, "wb") as f:
            f.write(serialization.to_bytes(params))
        print(f"      wrote converted params -> {args.out}")

    if not ok:
        print("IMPORT FAILED: degenerate embedding", file=sys.stderr)
        return 1
    print("IMPORT OK — the CLIs will auto-load this checkpoint from "
          "pretrained/SLOWFAST_8x8_R50.pkl or $AVTEX_ENCODER_CKPT")
    return 0


if __name__ == "__main__":
    sys.exit(main())
