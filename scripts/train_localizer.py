#!/usr/bin/env python
"""Train the face localizer on WIDER FACE single-face crops.

The reference keeps this workflow in the TrainLocalizer notebook
(`readme.md:246-253`); here it is a proper CLI mirroring the pose trainer:
fused on-device augmentation, jitted DP train step, checkpointing, and
localizer metrics (is-face accuracy + box MSE) on the held-out split.
"""

import argparse
import os
import sys
import time
from os.path import dirname, join, realpath

import numpy as np

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batchsize", type=int, default=64)
    parser.add_argument("--lr", type=float, default=1.0e-3)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--outdir", type=str, default=join(dirname(__file__), "..", "model_files"))
    parser.add_argument("--pad-size", type=int, default=None)
    parser.add_argument("--no-imgaug", default=True, action="store_false", dest="with_image_aug")
    parser.add_argument("--samples-per-epoch", default=10 * 1024, type=int)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from neuralnet_tracker_traincode_tpu import pipelines
    from neuralnet_tracker_traincode_tpu.augmentation.localizer_pipeline import (
        LocalizerAugConfig,
        augment_batch_for_localizer,
    )
    from neuralnet_tracker_traincode_tpu.data.loader import FusedBatchLoader
    from neuralnet_tracker_traincode_tpu.data.fields import Tag
    from neuralnet_tracker_traincode_tpu.data.sampling import (
        ConcatDataset,
        make_concat_dataset_item_sampler,
    )
    from neuralnet_tracker_traincode_tpu.losses.losses import LocalizerBoxLoss, LocalizerProbLoss
    from neuralnet_tracker_traincode_tpu.models import io as model_io
    from neuralnet_tracker_traincode_tpu.models.localizer import LocalizerNet
    from neuralnet_tracker_traincode_tpu.parallel.mesh import make_mesh, shard_batch
    from neuralnet_tracker_traincode_tpu.train.plotting import ConsoleTrainOutput
    from neuralnet_tracker_traincode_tpu.train.schedules import exponential_up_then_steps

    train_set, test_set = pipelines.make_widerface_datasets()
    concat = ConcatDataset([train_set])
    sampler = make_concat_dataset_item_sampler(concat, [1.0])
    pad_size = args.pad_size or pipelines.probe_pad_size([train_set])
    print(f"Localizer training: {len(train_set)} train / {len(test_set)} test, pad {pad_size}")
    loader = FusedBatchLoader(
        concat,
        tags_by_dataset_index=lambda i: Tag.FACE_DETECTION,
        tag_to_id={Tag.FACE_DETECTION: 0},
        sampler=sampler,
        batchsize=args.batchsize,
        pad_size=pad_size,
    )

    model = LocalizerNet(dtype=jnp.bfloat16)
    mesh = make_mesh()
    rng = jax.random.PRNGKey(1234)
    variables = model.init(
        {"params": rng}, jnp.zeros((2, 224, 288, 1)), train=True
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    steps_per_epoch = max(1, args.samples_per_epoch // args.batchsize)
    sched = exponential_up_then_steps(max(1, args.epochs // 10), 0.1, [args.epochs // 2])
    table = np.asarray([sched(e) for e in range(args.epochs)], np.float32)
    epoch_ids = np.arange(args.epochs)

    def lr_fn(step):
        epoch = jnp.clip(step // steps_per_epoch, 0, args.epochs - 1)
        return args.lr * jnp.sum(jnp.where(epoch_ids == epoch, table, 0.0))

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr_fn))
    opt_state = tx.init(params)
    cfg = LocalizerAugConfig(enable_image_aug=args.with_image_aug)
    prob_loss = LocalizerProbLoss()
    box_loss = LocalizerBoxLoss()

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch, key, step):
        key = jax.random.fold_in(key, step)
        x, labels = augment_batch_for_localizer(
            key, batch["image"], {"roi": batch["roi"], "hasface": batch["hasface"]}, cfg
        )

        def loss_fn(p):
            pred, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            l = jnp.mean(prob_loss(pred, labels)) + jnp.mean(box_loss(pred, labels))
            return l, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    console = ConsoleTrainOutput()
    outdir = join(args.outdir, "LocalizerNet")
    os.makedirs(outdir, exist_ok=True)
    key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
    step = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        it = iter(loader)
        loss = None
        # Losses stay on device during the epoch; one bulk pull at the end
        # (per-step conversions block on host<->device round trips and
        # serialize the pipeline — docs/PERFORMANCE.md item 5).
        losses = []
        step0 = step
        for _ in range(steps_per_epoch):
            batch = shard_batch(next(it), mesh)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, batch, key, step
            )
            losses.append(loss)
            step += 1
        for i, v in enumerate(jax.device_get(losses)):
            console.add_train_point(epoch, step0 + i, "loss", float(v))
        loss_val = float(loss)
        assert np.isfinite(loss_val), f"non-finite loss at epoch {epoch}"
        dt = time.time() - t0
        console.summarize_train_values()
        console.update_graph()
        model_io.save_model(
            model, {"params": params, "batch_stats": batch_stats}, join(outdir, "last.ckpt")
        )
        print(
            f"epoch {epoch + 1}/{args.epochs}: loss {loss_val:.4f}, "
            f"{steps_per_epoch * args.batchsize / dt:.0f} img/s"
        )
    print(f"Saved localizer to {join(outdir, 'last.ckpt')}")


if __name__ == "__main__":
    main()
