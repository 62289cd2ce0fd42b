#!/usr/bin/env python
"""Evaluate the face localizer: is-face accuracy + box corner RMSE.

Contract: the reference's `scripts/LocalizerEvaluation.ipynb` — load a
LocalizerNet checkpoint, run the WIDER FACE single-face held-out split
through it, and report accuracy of the face logit plus the RMSE of the
box corner points at detection thresholds 0.25 / 0.5 / 0.75
(reference `train.py: LocalizerIsFaceMatches / LocalizerBoxMeanSquareErrors`).

Two evaluation protocols:
  --protocol full  (default) rescale the whole image maintaining aspect to
                   the 224x288 input, like the notebook's
                   RescaleMaintainAspect — this is how opentrack feeds it.
  --protocol crop  deterministic GT-roi-centered context crop (the training
                   distribution, extension 2.2).

Optionally dumps prediction overlays with --vis-outdir.
"""

import argparse
import os
import sys
from os.path import dirname, join, realpath

import numpy as np

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))

OUT_H, OUT_W = 224, 288


def _aspect_corrected_full_roi(sizes_wh: np.ndarray) -> np.ndarray:
    """[0,0,w,h] expanded (centered) to the 288/224 input aspect."""
    aspect = OUT_W / OUT_H
    w, h = sizes_wh[:, 0].astype(np.float32), sizes_wh[:, 1].astype(np.float32)
    tw = np.maximum(w, h * aspect)
    th = tw / aspect
    cx, cy = 0.5 * w, 0.5 * h
    return np.stack([cx - 0.5 * tw, cy - 0.5 * th, cx + 0.5 * tw, cy + 0.5 * th], axis=-1)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", type=str, help="LocalizerNet .ckpt")
    parser.add_argument("--ds", type=str, default=None,
                        help="HDF5 file (default $DATADIR/widerfacessingle.h5, first 500 rows)")
    parser.add_argument("-n", type=int, default=500, help="number of held-out samples")
    parser.add_argument("--protocol", choices=["full", "crop"], default="full")
    parser.add_argument("--batchsize", type=int, default=32)
    parser.add_argument("--thresholds", type=float, nargs="*", default=[0.25, 0.5, 0.75])
    parser.add_argument("--vis-outdir", type=str, default=None,
                        help="Save the first 32 prediction overlays here")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from neuralnet_tracker_traincode_tpu import pipelines
    from neuralnet_tracker_traincode_tpu.augmentation.localizer_pipeline import (
        LocalizerAugConfig,
        augment_batch_for_localizer,
    )
    from neuralnet_tracker_traincode_tpu.augmentation.affine import transform_roi
    from neuralnet_tracker_traincode_tpu.augmentation.warp import warp_affine
    from neuralnet_tracker_traincode_tpu.data.fields import Tag
    from neuralnet_tracker_traincode_tpu.data.pose_dataset import Hdf5PoseDataset
    from neuralnet_tracker_traincode_tpu.data.sampling import Subset
    from neuralnet_tracker_traincode_tpu.eval.metrics import (
        LocalizerBoxMeanSquareErrors,
        LocalizerIsFaceMatches,
    )
    from neuralnet_tracker_traincode_tpu.models.io import load_model
    from neuralnet_tracker_traincode_tpu.models.localizer import LocalizerNet
    from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d

    if args.ds is not None:
        ds = Hdf5PoseDataset(args.ds, dataclass=Tag.FACE_DETECTION)
        test = Subset(ds, np.arange(min(args.n, len(ds))))
    else:
        _, test = pipelines.make_widerface_datasets()
        test = Subset(test, np.arange(min(args.n, len(test))))

    model, variables = load_model(args.checkpoint, [LocalizerNet])
    print(f"Evaluating {args.checkpoint} on {len(test)} samples ({args.protocol} protocol)")

    pad = 0
    for i in range(len(test)):
        h, w = np.asarray(test[i]["image"]).shape[:2]
        pad = max(pad, h, w)

    cfg = LocalizerAugConfig(deterministic=True, enable_image_aug=False)
    # Predictions and labels are compared in input-pixel units (like the
    # notebook's RMSE over 224x288 crops).
    px = np.asarray([OUT_W, OUT_H, OUT_W, OUT_H], np.float32) * 0.5

    @jax.jit
    def eval_full(images, view_roi, roi_gt):
        B = images.shape[0]
        tr = Affine2d.range_remap_2d(
            view_roi[..., :2],
            view_roi[..., 2:],
            jnp.zeros((B, 2), jnp.float32),
            jnp.broadcast_to(jnp.asarray([float(OUT_W), float(OUT_H)], jnp.float32), (B, 2)),
        )
        x = warp_affine(images, tr, (OUT_H, OUT_W), 1) * (1.0 / 256.0) - 0.5
        pred = LocalizerNet.inference_outputs(
            model.apply(variables, x, train=False)
        )
        # Net roi is [-1, 1] in the crop frame -> pixels; GT roi -> crop pixels.
        pred_roi = (pred["roi"] + 1.0) * px
        gt_roi = transform_roi(tr, roi_gt)
        return x, pred["hasface"], pred_roi, gt_roi

    @jax.jit
    def eval_crop(key, images, roi_gt, hasface):
        x, labels = augment_batch_for_localizer(
            key, images, {"roi": roi_gt, "hasface": hasface}, cfg
        )
        pred = LocalizerNet.inference_outputs(model.apply(variables, x, train=False))
        return x, pred["hasface"], (pred["roi"] + 1.0) * px, (labels["roi"] + 1.0) * px

    metrics = {
        t: (LocalizerIsFaceMatches(t), LocalizerBoxMeanSquareErrors(t))
        for t in args.thresholds
    }
    vis_saved = 0
    if args.vis_outdir:
        os.makedirs(args.vis_outdir, exist_ok=True)

    key = jax.random.PRNGKey(0)
    for start in range(0, len(test), args.batchsize):
        idx = range(start, min(start + args.batchsize, len(test)))
        samples = [test[i] for i in idx]
        B = len(samples)
        images = np.zeros((args.batchsize, pad, pad, 1), np.uint8)
        sizes = np.zeros((args.batchsize, 2), np.int32)
        roi = np.zeros((args.batchsize, 4), np.float32)
        hasface = np.zeros((args.batchsize,), np.float32)
        for j, s in enumerate(samples):
            img = np.asarray(s["image"])
            if img.ndim == 2:
                img = img[..., None]
            h, w = img.shape[:2]
            images[j, :h, :w] = img[..., :1]
            sizes[j] = (w, h)
            roi[j] = np.asarray(s["roi"], np.float32)
            hasface[j] = float(np.asarray(s.get("hasface", 1.0)))

        if args.protocol == "full":
            view = _aspect_corrected_full_roi(sizes)
            x, score, pred_roi, gt_roi = eval_full(images, view, roi)
        else:
            x, score, pred_roi, gt_roi = eval_crop(key, images, roi, hasface)

        preds = {"hasface": np.asarray(score)[:B], "roi": np.asarray(pred_roi)[:B]}
        targets = {"hasface": hasface[:B], "roi": np.asarray(gt_roi)[:B]}
        for acc, mse in metrics.values():
            acc.update(preds, targets)
            mse.update(preds, targets)

        if args.vis_outdir and vis_saved < 32:
            from neuralnet_tracker_traincode_tpu import vis
            import cv2

            crops = np.clip((np.asarray(x)[:B] + 0.5) * 256.0, 0, 255).astype(np.uint8)
            for j in range(B):
                if vis_saved >= 32:
                    break
                img = vis.draw_prediction((
                    {"image": crops[j], "roi": targets["roi"][j]},
                    {"roi": preds["roi"][j]},
                ))
                cv2.imwrite(join(args.vis_outdir, f"loc_{vis_saved:03d}.png"), img[..., ::-1])
                vis_saved += 1

    for t, (acc_m, mse_m) in metrics.items():
        matches = np.asarray(acc_m.compute(), np.float64)
        err = np.asarray(mse_m.compute())
        err = err[np.isfinite(err)]
        accuracy = float(np.average(matches))
        rmse = float(np.sqrt(np.average(err.ravel()))) if err.size else float("nan")
        print(f"Threshold {t} => Acc {accuracy * 100:.0f}%, corner RMSE {rmse:.2f} px")
    if args.vis_outdir:
        print(f"Wrote {vis_saved} overlays to {args.vis_outdir}")


if __name__ == "__main__":
    main()
