#!/usr/bin/env python
"""Self-train SuperPoint on synthetic geometry and save the checkpoint.

Offline replacement for the undownloadable official weights: the
MagicPoint synthetic stage (training/superpoint_train.py). The saved
.npz loads anywhere via models.convert.load_params and plugs into any
matcher as `superpoint_params`.

Usage:
  python scripts/train_superpoint.py --steps 6000 \
      --out weights/superpoint_synthetic.npz
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

if os.environ.get("ICEPY4D_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--desc-weight", type=float, default=1.0)
    ap.add_argument("--out", default="weights/superpoint_synthetic.npz")
    ap.add_argument("--real-image-dir",
                    default="/root/reference/assets/img",
                    help="real frames for descriptor-stage warps "
                         "('' disables)")
    ap.add_argument("--real-fraction", type=float, default=0.5)
    ap.add_argument("--adapt-steps", type=int, default=6000,
                    help="stage-2 steps after homographic adaptation "
                         "(0 disables the adaptation round)")
    ap.add_argument("--adapt-patches", type=int, default=384)
    ap.add_argument("--init", default=None,
                    help="resume from an existing checkpoint (.npz)")
    args = ap.parse_args()

    from icepy4d_tpu.models.convert import load_params, save_params
    from icepy4d_tpu.training.superpoint_train import train_superpoint

    params = None
    history = [{"loss": float("nan")}]
    if args.init:
        import jax
        import jax.numpy as jnp

        params = jax.tree.map(jnp.asarray, load_params(args.init))
        print(f"resumed from {args.init}")
    if args.steps > 0:
        params, history = train_superpoint(
            steps=args.steps, batch=args.batch, h=args.height,
            w=args.width, lr=args.lr, seed=args.seed,
            desc_weight=args.desc_weight, params=params,
            real_image_dir=args.real_image_dir or None,
            real_fraction=args.real_fraction)

    if args.adapt_steps and args.real_image_dir:
        # SuperPoint §6: pseudo-label real patches with the stage-1
        # detector aggregated over warps, then retrain on real data
        import numpy as np

        from icepy4d_tpu.training.superpoint_train import (
            homographic_adaptation)
        from icepy4d_tpu.training.synthetic import load_real_patch_pool

        rng = np.random.default_rng(args.seed + 1)
        pool = load_real_patch_pool(args.real_image_dir)
        print("homographic adaptation: pseudo-labeling "
              f"{args.adapt_patches} real patches...", flush=True)
        real_labeled = homographic_adaptation(
            params, pool, rng, n_patches=args.adapt_patches,
            h=args.height, w=args.width)
        n_pts = int((real_labeled[1] < 64).sum())
        print(f"  {n_pts} pseudo-labels total", flush=True)
        params, history = train_superpoint(
            steps=args.adapt_steps, batch=args.batch, h=args.height,
            w=args.width, lr=args.lr * 0.3, seed=args.seed + 2,
            desc_weight=args.desc_weight, params=params,
            real_image_dir=args.real_image_dir,
            real_fraction=0.7, real_labeled=real_labeled)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_params(out, params)
    print(f"checkpoint -> {out} "
          f"(final loss {history[-1]['loss']:.4f})")


if __name__ == "__main__":
    main()
