"""Validation during training: deterministic crop + forward + criterion.

Contract: `LitModel.validation_step` (`train_poseestimator.py:332-338`) — the
test criterion over the aflw2k test split, with the deterministic eval crop.
Runs the same fused jitted path as training (masked criterion, fixed shapes).
"""

import dataclasses
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neuralnet_tracker_traincode_tpu.augmentation.pipeline import augment_batch_for_training
from neuralnet_tracker_traincode_tpu.data.loader import LABEL_CATEGORIES, pack_fused_batch


class FusedValidation:
    def __init__(self, trainer, dataset, tag_order: Sequence[Any], batchsize: int = 128):
        self.trainer = trainer
        self.batchsize = batchsize
        self.tag_to_id = {t: i for i, t in enumerate(tag_order)}
        self._batches = self._pack(dataset)
        self._eval_step = None

    def _pack(self, dataset) -> List[dict]:
        samples = [dataset[i] for i in range(len(dataset))]
        pad = 64 * int(np.ceil(max(max(s.meta.image_wh) for s in samples) / 64))
        batches = []
        for i in range(0, len(samples), self.batchsize):
            chunk = samples[i : i + self.batchsize]
            tag_ids = [self.tag_to_id[s.meta.tag] for s in chunk]
            b = pack_fused_batch(chunk, tag_ids, pad)
            B = b["tag_id"].shape[0]
            if B % self.batchsize != 0:
                reps = self.batchsize - (B % self.batchsize)
                b = {k: np.concatenate([v, np.repeat(v[:1], reps, axis=0)]) for k, v in b.items()}
                b["dataset_weight"][B:] = 0.0
            batches.append(b)
        return batches

    def _build(self):
        trainer = self.trainer
        cfg = dataclasses.replace(
            trainer.config,
        )
        aug = trainer.config.aug._replace(deterministic=True)
        categories = trainer.categories
        criterion = trainer.criterion
        model = trainer.model

        def eval_step(state, batch, weight_matrix):
            labels = {
                k: v
                for k, v in batch.items()
                if k not in ("image", "param_index", "tag_id", "dataset_weight")
            }
            x, labels = augment_batch_for_training(
                jax.random.PRNGKey(0), batch["image"], labels, categories, aug
            )
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(
                variables, x, coord_convention_id=labels.get("coord_convention_id"), train=False
            )
            loss, byname = criterion(
                out, labels, batch["tag_id"], weight_matrix,
                dataset_weight=batch.get("dataset_weight"),
            )
            return loss, byname

        # Single-device eval, no mesh shardings: validation needs no
        # cross-device collectives, and the XLA:CPU test mesh (8 virtual
        # devices on few cores) can hit the 40s collective-rendezvous
        # abort when a loader thread starves one participant. Eval batches
        # are small; params are replicated so device 0 holds a full copy.
        self._eval_step = jax.jit(eval_step)

    def run(self, state, epoch: int, *recorders) -> float:
        if self._eval_step is None:
            self._build()
        W = self.trainer.weight_matrix(epoch)
        losses = []
        byname_acc = {}
        device0 = jax.devices()[0]
        device0_state = jax.device_put(
            jax.tree_util.tree_map(np.asarray, state), device0
        )
        W = jax.device_put(np.asarray(W), device0)
        for b in self._batches:
            loss, byname = self._eval_step(device0_state, b, W)
            losses.append(loss)
            for k, (vals, ws) in byname.items():
                denom = jnp.maximum(jnp.sum(ws != 0), 1)
                byname_acc.setdefault(k, []).append(jnp.sum(vals) / denom)
        val_loss = float(np.mean([float(l) for l in losses]))
        for rec in recorders:
            rec.add_test_point(epoch, "loss", val_loss)
            for k, vs in byname_acc.items():
                rec.add_test_point(epoch, k, float(np.mean([float(v) for v in vs])))
        return val_loss
