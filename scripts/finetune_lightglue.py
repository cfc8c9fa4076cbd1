#!/usr/bin/env python
"""Fine-tune LightGlue on the pipeline's own verified wide-baseline
correspondences.

Homography pre-training (scripts/train_lightglue.py) cannot teach
extreme-viewpoint matching — the original's second stage used MegaDepth
3-D supervision. A processed season replaces that: every epoch's
cross-camera features with shared track_ids are geometrically-verified
real wide-baseline correspondences (SIFT + GCP-prior chain), and this
script trains the matcher head on exactly those, with SuperPoint
descriptors sampled at the correspondence pixels
(training/lightglue_train.py::make_correspondence_dataset).

Usage (after a pipeline run):
  python scripts/finetune_lightglue.py --results-dir res \
      --init weights/lightglue_synthetic.npz \
      --out weights/lightglue_finetuned.npz
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
    ap.add_argument("--results-dir", required=True,
                    help="pipeline results dir (epochs/*/*.pickle)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-batches", type=int, default=48)
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--image-scale", type=float, default=0.25,
                    help="downscale factor for the full-res frames "
                         "(descriptor sampling memory)")
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scan-chunk", type=int, default=100)
    ap.add_argument("--n-layers", type=int, default=9)
    ap.add_argument("--superpoint",
                    default="weights/superpoint_synthetic.npz")
    ap.add_argument("--init", default="weights/lightglue_synthetic.npz",
                    help="checkpoint to fine-tune ('' = fresh init)")
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--no-keep-best", action="store_true",
                    help="disable held-out-based best-checkpoint "
                         "keeping (default on when pairs are held "
                         "out: periodic saves evaluate and only "
                         "improvements overwrite --out)")
    ap.add_argument("--holdout-pairs", type=int, default=1,
                    help="epoch pairs held out of training entirely "
                         "and used for the before/after eval (0 = "
                         "evaluate in-sample, reported as such)")
    ap.add_argument("--mix-homography", type=int, default=0,
                    help="additionally interleave N freshly-built "
                         "homography-supervised batches (same shapes) "
                         "— regularizes a small-season fine-tune "
                         "against memorizing its few real pairs")
    ap.add_argument("--real-image-dir", default="",
                    help="real frames for the homography-mix patch "
                         "pool ('' = synthetic canvases only)")
    ap.add_argument("--out", default="weights/lightglue_finetuned.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from icepy4d_tpu.models.convert import load_params, save_params
    from icepy4d_tpu.models.lightglue import LightGlue
    from icepy4d_tpu.models.superpoint import SuperPoint
    from icepy4d_tpu.training.lightglue_train import (
        collect_epoch_pairs, evaluate_matching,
        make_correspondence_dataset, train_lightglue)

    rng = np.random.default_rng(args.seed)
    pairs = collect_epoch_pairs(args.results_dir,
                                image_scale=args.image_scale)
    if not pairs:
        raise SystemExit(f"no usable epoch pairs in {args.results_dir}")
    n_corr = [len(p["corr0"]) for p in pairs]
    print(f"{len(pairs)} epoch pairs, correspondences "
          f"min/median/max = {min(n_corr)}/{int(np.median(n_corr))}/"
          f"{max(n_corr)}", flush=True)

    sp = SuperPoint(max_keypoints=args.max_keypoints,
                    detection_threshold=0.0005)
    sp_params = jax.tree.map(jnp.asarray, load_params(args.superpoint))

    def build(pair_list, n_batches):
        return make_correspondence_dataset(
            rng,
            lambda imgs, kpts: sp.describe_at(sp_params, imgs, kpts),
            lambda imgs: sp.extract(sp_params, imgs),
            pair_list, n_batches=n_batches, batch=args.batch,
            n_kpts=args.max_keypoints)

    # held-out = whole epoch pairs, never seen in training (same-pair
    # samples share images/correspondences, so a batch-level split
    # would leak)
    n_hold = min(args.holdout_pairs, len(pairs) - 1)
    if args.holdout_pairs and n_hold < args.holdout_pairs:
        print(f"only {len(pairs)} pairs: holding out {n_hold}",
              flush=True)
    if n_hold > 0:
        train_ds = build(pairs[:-n_hold], args.n_batches)
        eval_ds = build(pairs[-n_hold:], args.eval_batches)
        eval_kind = f"held-out ({n_hold} pairs)"
    else:
        train_ds = build(pairs, args.n_batches)
        eval_ds = build(pairs, args.eval_batches)
        eval_kind = "IN-SAMPLE (no holdout pairs)"

    if args.mix_homography > 0:
        from icepy4d_tpu.training.lightglue_train import (
            homography_to_explicit, make_lightglue_dataset)
        from icepy4d_tpu.training.synthetic import load_real_patch_pool

        pool = (load_real_patch_pool(args.real_image_dir)
                if args.real_image_dir else None)
        # same (batch, n_kpts) shapes as the real batches so the two
        # halves concatenate into one scan-able dataset
        homog = make_lightglue_dataset(
            rng, lambda imgs: sp.extract(sp_params, imgs),
            n_batches=args.mix_homography, batch=args.batch,
            h=240, w=320, real_pool=pool)
        homog = homography_to_explicit(homog)
        assert homog["kpts0"].shape[1:] == train_ds["kpts0"].shape[1:]
        train_ds = {k: np.concatenate([train_ds[k], homog[k]])
                    for k in train_ds}
        # interleave: scan walks batches in order, so spread the
        # homography batches EVENLY through the real ones (keys at
        # (j+0.5)*R/H land between real keys 0..R-1 uniformly for any
        # mix ratio — clustering them at the front would leave most of
        # each epoch unregularized)
        n_real = args.n_batches
        keys = np.concatenate([
            np.arange(n_real, dtype=np.float64),
            (np.arange(args.mix_homography) + 0.5)
            * n_real / args.mix_homography])
        order = np.argsort(keys, kind="stable")
        n_tot = len(keys)
        train_ds = {k: v[order] for k, v in train_ds.items()}
        print(f"mixed in {args.mix_homography} homography batches "
              f"({n_tot} total)", flush=True)

    model = LightGlue(n_layers=args.n_layers)
    params = None
    if args.init:
        params = jax.tree.map(jnp.asarray, load_params(args.init))
        print(f"fine-tuning from {args.init}")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)

    def write_ckpt(p):
        tmp = out.with_suffix(".tmp.npz")
        save_params(tmp, p)
        tmp.replace(out)

    # keep-best: the measured failure mode of small-season fine-tunes
    # is LATE-stage memorization (a mid-run snapshot transferred better
    # than the final model), so every periodic save evaluates on the
    # held-out pairs and only an improvement overwrites --out
    keep_best = n_hold > 0 and not args.no_keep_best
    best = {"score": -1.0, "step": None}

    def eval_score(p):
        rep = evaluate_matching(model, p, eval_ds, filter_threshold=0.0)
        return rep["recall"] + rep.get("precision_labeled",
                                       rep["precision"]), rep

    def save_intermediate(p, step):
        if keep_best:
            score, rep = eval_score(p)
            print(f"step {step}: held-out recall {rep['recall']:.4f} "
                  f"P_lab {rep.get('precision_labeled', 0.0):.4f}",
                  flush=True)
            if score <= best["score"]:
                return
            best.update(score=score, step=step)
        write_ckpt(p)
        print(f"checkpointed step {step} -> {out}", flush=True)

    before = evaluate_matching(model, params, eval_ds) \
        if params is not None else None
    params, _ = train_lightglue(
        model, train_ds, steps=args.steps, lr=args.lr, seed=args.seed,
        params=params, scan_chunk=args.scan_chunk,
        save_fn=save_intermediate, save_every=args.save_every)
    after = evaluate_matching(model, params, eval_ds)
    if before is not None:
        print(f"{eval_kind} before:", json.dumps(before))
    print(f"{eval_kind} after:", json.dumps(after))

    if keep_best:
        score, _ = eval_score(params)
        if score > best["score"]:
            best.update(score=score, step=args.steps)
            write_ckpt(params)
        print(f"saved {out} (best held-out checkpoint: "
              f"step {best['step']})")
    else:
        write_ckpt(params)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
