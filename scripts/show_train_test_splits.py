#!/usr/bin/env python
"""Page through augmented training samples exactly as the train step sees them.

Contract: `scripts/show_train_test_splits.py` of the reference — build the
train pipeline for a dataset-mix string and visualize the (augmented,
unwhitened) samples with their transformed labels. Here the fused on-device
augmentation is applied to a raw loader batch, labels are un-normalized back
to crop pixels, and samples are shown in a matplotlib pager (or dumped as
PNGs with --outdir for headless use).
"""

import argparse
import sys
from os.path import dirname, join, realpath

import numpy as np

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))
sys.path.insert(0, dirname(realpath(__file__)))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ds", type=str, default="repro_300_wlp")
    parser.add_argument("--batchsize", type=int, default=32)
    parser.add_argument("--raug", default=30.0, type=float, dest="rotation_aug_angle")
    parser.add_argument("--no-imgaug", default=True, action="store_false", dest="with_image_aug")
    parser.add_argument(
        "--roi-override", default="original",
        choices=["extent_to_forehead", "original", "landmarks"],
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--outdir", default=None,
                        help="Write PNGs here instead of an interactive window")
    args = parser.parse_args()

    import jax

    from train_poseestimator import parse_dataset_definition

    from neuralnet_tracker_traincode_tpu import pipelines, vis
    from neuralnet_tracker_traincode_tpu.augmentation.affine import (
        position_unnormalization,
        transform_coord,
        transform_points,
        transform_roi,
    )
    from neuralnet_tracker_traincode_tpu.augmentation.pipeline import augment_batch_for_training
    from neuralnet_tracker_traincode_tpu.data.loader import LABEL_CATEGORIES

    dsids, weights = parse_dataset_definition(args.ds)
    loader, _, size, tag_order, aug = pipelines.make_pose_estimation_loaders(
        inputsize=129,
        batchsize=args.batchsize,
        datasets=dsids,
        dataset_weights=weights,
        enable_image_aug=args.with_image_aug,
        rotation_aug_angle=args.rotation_aug_angle,
        roi_override=args.roi_override,
    )
    print(f"Training pipeline over {size} samples, tags {tag_order}")

    import jax.numpy as jnp

    def iterate_samples():
        key = jax.random.PRNGKey(args.seed)
        for step, batch in enumerate(loader):
            labels = {
                k: jnp.asarray(v)
                for k, v in batch.items()
                if k in LABEL_CATEGORIES and k != "image"
            }
            k = jax.random.fold_in(key, step)
            x, out = augment_batch_for_training(
                k, jnp.asarray(batch["image"]), labels, LABEL_CATEGORIES, aug,
                param_index=jnp.asarray(batch["param_index"]),
            )
            B = x.shape[0]
            un = position_unnormalization(x.shape[2], x.shape[1]).broadcast_to((B,))
            imgs = np.clip((np.asarray(x) + 0.5) * 255.0, 0, 255).astype(np.uint8)
            shown = {}
            if "pt3d_68" in out:
                shown["pt3d_68"] = np.asarray(transform_points(un, out["pt3d_68"]))
            if "coord" in out:
                shown["coord"] = np.asarray(transform_coord(un, out["coord"]))
            if "roi" in out:
                shown["roi"] = np.asarray(transform_roi(un, out["roi"]))
            if "pose" in out:
                shown["pose"] = np.asarray(out["pose"])
            for i in range(B):
                if not batch["dataset_weight"][i]:
                    continue  # padding row
                sample = {"image": imgs[i]}
                sample.update({k: v[i] for k, v in shown.items()})
                yield (sample, None)

    if args.outdir:
        import os

        import cv2

        os.makedirs(args.outdir, exist_ok=True)
        for i, gp in zip(range(32), iterate_samples()):
            img = vis.draw_prediction(gp)
            cv2.imwrite(join(args.outdir, f"sample_{i:03d}.png"), img[..., ::-1])
        print(f"Wrote 32 augmented samples to {args.outdir}")
    else:
        import matplotlib

        matplotlib.use("TkAgg")
        from matplotlib import pyplot

        keepalive = vis.matplotlib_plot_iterable(iterate_samples(), vis.draw_prediction)
        pyplot.show()


if __name__ == "__main__":
    main()
