#!/usr/bin/env python
"""Self-train the ALIKED-style extractor and save the checkpoint.

Same offline recipe as scripts/train_superpoint.py (no downloads):
synthetic corner labels bootstrap the score map; homography-related
pairs (synthetic + real glacier patches) supervise descriptors and
score repeatability (training/aliked_train.py).

Usage:
  python scripts/train_aliked.py --steps 4000 \
      --out weights/aliked_synthetic.npz
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

if os.environ.get("ICEPY4D_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-batches", type=int, default=64)
    ap.add_argument("--scan-chunk", type=int, default=100)
    ap.add_argument("--real-image-dir",
                    default="/root/reference/assets/img",
                    help="real frames for homography pairs ('' disables)")
    ap.add_argument("--real-fraction", type=float, default=0.5)
    ap.add_argument("--init", default=None,
                    help="resume from an existing checkpoint (.npz)")
    ap.add_argument("--out", default="weights/aliked_synthetic.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from icepy4d_tpu.models.aliked import aliked_init
    from icepy4d_tpu.models.convert import load_params, save_params
    from icepy4d_tpu.training.aliked_train import train_aliked
    from icepy4d_tpu.training.synthetic import load_real_patch_pool

    model, params = aliked_init(args.seed)
    if args.init:
        params = jax.tree.map(jnp.asarray, load_params(args.init))

    pool = None
    if args.real_image_dir:
        try:
            pool = load_real_patch_pool(args.real_image_dir)
        except FileNotFoundError as e:
            print(f"[train_aliked] no real pool: {e}", file=sys.stderr)

    params = train_aliked(
        model, params, steps=args.steps, batch=args.batch,
        h=args.height, w=args.width, lr=args.lr, seed=args.seed,
        n_batches=args.n_batches, real_pool=pool,
        real_fraction=args.real_fraction, scan_chunk=args.scan_chunk,
        log=lambda m: print(f"[train_aliked] {m}", file=sys.stderr))

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_params(out, params)
    print(json.dumps({"steps": args.steps, "out": str(out)}))


if __name__ == "__main__":
    main()
