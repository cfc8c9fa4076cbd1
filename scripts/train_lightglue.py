#!/usr/bin/env python
"""Self-train LightGlue on homography-supervised correspondences.

Offline replacement for the undownloadable official checkpoint
(training/lightglue_train.py): keypoints + descriptors come from the
self-trained SuperPoint, pairs are real glacier frames (plus synthetic
canvases) under random homographies + photometric jitter, supervision
is the known-homography assignment (the original model's own
pre-training stage).

Usage:
  python scripts/train_lightglue.py --steps 4000 \
      --out weights/lightglue_synthetic.npz
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
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--n-layers", type=int, default=9)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-batches", type=int, default=96,
                    help="cached training batches (device-resident)")
    ap.add_argument("--eval-batches", type=int, default=6,
                    help="held-out batches for the final report")
    ap.add_argument("--scan-chunk", type=int, default=200)
    ap.add_argument("--real-image-dir",
                    default="/root/reference/assets/img",
                    help="real frames for patch sampling ('' disables)")
    ap.add_argument("--real-fraction", type=float, default=0.7)
    ap.add_argument("--superpoint",
                    default="weights/superpoint_synthetic.npz",
                    help="self-trained SuperPoint checkpoint feeding "
                         "keypoints/descriptors")
    ap.add_argument("--init", default=None,
                    help="resume from an existing LightGlue .npz")
    ap.add_argument("--dataset-cache", default=None,
                    help=".npz path: reuse the cached batch set if it "
                         "exists, else build and save it (dataset "
                         "construction costs minutes of SuperPoint "
                         "extraction)")
    ap.add_argument("--out", default="weights/lightglue_synthetic.npz")
    ap.add_argument("--save-every", type=int, default=1000,
                    help="checkpoint to --out every N steps (0 = only "
                         "at the end)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from icepy4d_tpu.models.convert import load_params, save_params
    from icepy4d_tpu.models.lightglue import LightGlue
    from icepy4d_tpu.models.superpoint import SuperPoint
    from icepy4d_tpu.training.lightglue_train import (
        evaluate_matching, make_lightglue_dataset, train_lightglue)
    from icepy4d_tpu.training.synthetic import load_real_patch_pool

    rng = np.random.default_rng(args.seed)
    n_total = args.n_batches + args.eval_batches
    cache = Path(args.dataset_cache) if args.dataset_cache else None
    if cache is not None and cache.exists():
        with np.load(cache) as z:
            ds = {k: z[k] for k in z.files}
        assert ds["H"].shape[0] == n_total, (
            f"cached dataset has {ds['H'].shape[0]} batches, "
            f"need {n_total}")
        print(f"loaded dataset cache {cache}", flush=True)
    else:
        sp = SuperPoint(max_keypoints=args.max_keypoints,
                        detection_threshold=0.0005)
        sp_params = jax.tree.map(jnp.asarray,
                                 load_params(args.superpoint))
        pool = (load_real_patch_pool(args.real_image_dir)
                if args.real_image_dir else None)
        print(f"building {args.n_batches}+{args.eval_batches} cached "
              f"batches of {args.batch} pairs "
              f"({args.height}x{args.width}, {args.max_keypoints} kpts)",
              flush=True)
        ds = make_lightglue_dataset(
            rng, lambda imgs: sp.extract(sp_params, imgs),
            n_batches=n_total, batch=args.batch,
            h=args.height, w=args.width, real_pool=pool,
            real_fraction=args.real_fraction)
        if cache is not None:
            cache.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(cache, **ds)
            print(f"saved dataset cache {cache}", flush=True)
    train_ds = {k: v[:args.n_batches] for k, v in ds.items()}
    eval_ds = {k: v[args.n_batches:] for k, v in ds.items()}

    model = LightGlue(n_layers=args.n_layers)
    params = None
    if args.init:
        params = jax.tree.map(jnp.asarray, load_params(args.init))
        print(f"resumed from {args.init}")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)

    def save_intermediate(p, step):
        tmp = out.with_suffix(".tmp.npz")
        save_params(tmp, p)
        tmp.replace(out)
        print(f"checkpointed step {step} -> {out}", flush=True)

    params, history = train_lightglue(
        model, train_ds, steps=args.steps, lr=args.lr, seed=args.seed,
        params=params, scan_chunk=args.scan_chunk,
        save_fn=save_intermediate, save_every=args.save_every)

    report = evaluate_matching(model, params, eval_ds)
    print("held-out:", json.dumps(report))

    save_params(out, params)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
