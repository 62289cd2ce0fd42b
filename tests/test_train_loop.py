"""End-to-end training smoke test on a virtual 8-device CPU mesh.

Analog of `test/test_train.py`: drive the REAL jitted DP train step (fused
augmentation + forward + masked loss + Adam update + SWA + checkpoints) for a
few steps and check that losses decrease-ish, state updates, and checkpoints
round-trip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.augmentation.pipeline import TrainAugmentationConfig
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory, Tag
from neuralnet_tracker_traincode_tpu.data.loader import LABEL_CATEGORIES, pack_fused_batch
from neuralnet_tracker_traincode_tpu.losses import losses as L
from neuralnet_tracker_traincode_tpu.losses.criterion import (
    Criterion,
    CriterionGroup,
    MaskedMultiTaskCriterion,
)
from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead
from neuralnet_tracker_traincode_tpu.parallel.mesh import make_mesh, shard_batch
from neuralnet_tracker_traincode_tpu.train.loop import PoseTrainer, TrainerConfig, label_parameters


def make_synthetic_batch(rng, B=16, src=64):
    images = (rng.rand(B, src, src, 1) * 255).astype(np.uint8)
    batch = {
        "image": images,
        "pose": np.tile(np.asarray([0.0, 0, 0, 1], np.float32), (B, 1)),
        "coord": (rng.rand(B, 3) * 20 + 20).astype(np.float32),
        "roi": np.tile(np.asarray([10.0, 10, 50, 50], np.float32), (B, 1)),
        "pt3d_68": (rng.rand(B, 68, 3) * 30 + 15).astype(np.float32),
        "shapeparam": rng.randn(B, 50).astype(np.float32),
        "hasface": np.full((B,), 0.9, np.float32),
        "coord_convention_id": np.zeros((B,), np.int32),
        "tag_id": np.zeros((B,), np.int32),
        "dataset_weight": np.ones((B,), np.float32),
        "param_index": np.arange(B, dtype=np.int32),
    }
    return batch


def make_trainer() -> PoseTrainer:
    assert len(jax.devices()) == 8, "expected the virtual 8-device CPU mesh"
    model = NetworkWithPointHead(enable_point_head=True, config="mobilenetv1")
    crit = MaskedMultiTaskCriterion(
        {
            Tag.POSE_WITH_LANDMARKS: CriterionGroup(
                [
                    Criterion("rot", L.QuatPoseLoss("approx_distance"), 1.0),
                    Criterion("xy", L.PoseXYLoss("l2"), 0.25),
                    Criterion("sz", L.PoseSizeLoss("l2"), 0.25),
                    Criterion("points3d", L.Points3dLoss("l2", chin_weight=0.8), 0.5),
                    Criterion(
                        "quatregularization1", L.QuaternionNormalizationSoftConstraint(), 1e-6
                    ),
                ]
            )
        },
        [Tag.POSE_WITH_LANDMARKS],
    )
    cfg = TrainerConfig(
        batchsize=16,
        lr=1e-3,
        epochs=4,
        samples_per_epoch=32,
        aug=TrainAugmentationConfig(inputsize=129, enable_image_aug=False),
    )
    mesh = make_mesh()
    return PoseTrainer(model, crit, cfg, LABEL_CATEGORIES, mesh=mesh)


@pytest.fixture(scope="module")
def trainer_and_state():
    trainer = make_trainer()

    def make_state():
        # fresh state per test: the train step donates its input state
        return trainer.init_state(jax.random.PRNGKey(0), (129, 129, 1))

    return trainer, make_state


@pytest.mark.slow
def test_train_steps_run_and_update(trainer_and_state, rng, tmp_path):
    trainer, make_state = trainer_and_state
    state = make_state()
    batch = shard_batch(make_synthetic_batch(rng), trainer.mesh)
    W = trainer.weight_matrix(0)
    key = jax.random.PRNGKey(42)

    # Individual leaves (e.g. a masked-out head's bias) may legitimately get an
    # exactly-zero gradient; assert movement over the whole parameter tree.
    leaves0 = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(state.params)]
    losses = []
    for i in range(4):
        state, metrics = trainer.train_step(state, batch, W, key)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 4
    leaves1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    n_changed = sum(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))
    assert n_changed > len(leaves0) // 2, f"only {n_changed}/{len(leaves0)} leaves moved"
    assert all(np.isfinite(l) for l in losses)
    assert "rot" in metrics and "points3d" in metrics

    # SWA update
    state = trainer.update_swa(state)
    assert int(state.swa_count) == 1
    swa0 = np.asarray(jax.tree_util.tree_leaves(state.swa_params)[0])
    p1 = leaves1[0]
    np.testing.assert_allclose(swa0, p1, atol=1e-6)  # first update copies params

    # checkpoint roundtrip
    path = str(tmp_path / "best.nnckpt")
    trainer.save_checkpoint(state, path)
    from neuralnet_tracker_traincode_tpu.models import io as model_io

    model2, variables2 = model_io.load_posenet(path)
    assert model2.get_config() == trainer.model.get_config()


@pytest.mark.slow
def test_training_reduces_loss(trainer_and_state, rng):
    # Same batch repeatedly: loss must drop substantially (overfit check).
    trainer, make_state = trainer_and_state
    state = make_state()
    batch = shard_batch(make_synthetic_batch(rng, B=16), trainer.mesh)
    W = trainer.weight_matrix(3)  # post-rampup weights
    key = jax.random.PRNGKey(7)
    first = None
    # Disable augmentation randomness effect by fixing the rng fold-in via step.
    for i in range(30):
        state, metrics = trainer.train_step(state, batch, W, key)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first, f"loss did not decrease: {first} -> {last}"


@pytest.mark.slow
def test_multi_step_matches_sequential(trainer_and_state, rng):
    """K scanned steps in one dispatch == K sequential single-step dispatches.

    The multi-step path exists purely to amortize dispatch latency
    (docs/PERFORMANCE.md); it must be a pure batching of the step program —
    same rng fold-in per step, same optimizer trajectory, same metrics."""
    trainer, make_state = trainer_and_state
    K = 3
    host_batches = [make_synthetic_batch(np.random.RandomState(100 + i)) for i in range(K)]
    W = trainer.weight_matrix(1)
    key = jax.random.PRNGKey(11)

    state_a = make_state()
    seq_metrics = []
    for hb in host_batches:
        state_a, m = trainer.train_step(state_a, shard_batch(hb, trainer.mesh), W, key)
        seq_metrics.append(jax.device_get(m))

    from neuralnet_tracker_traincode_tpu.parallel.mesh import shard_stacked_batch

    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *host_batches)
    state_b = make_state()
    state_b, multi_metrics = trainer.train_step_multi(
        state_b, shard_stacked_batch(stacked, trainer.mesh), W, key
    )
    multi_metrics = jax.device_get(multi_metrics)

    assert int(state_b.step) == int(state_a.step) == K
    # Scan and unrolled dispatches compile to differently-fused XLA programs,
    # so float rounding differs in the last ulps and Adam amplifies it step
    # over step: step 1 must match tightly, later steps within drift bounds
    # (measured max relative drift ~4e-4 by step 3 on CPU).
    for name in seq_metrics[0]:
        got = np.asarray(multi_metrics[name])
        assert got.shape == (K,)
        want = np.asarray([m[name] for m in seq_metrics])
        np.testing.assert_allclose(got[0], want[0], rtol=1e-5, atol=1e-6, err_msg=name)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4, err_msg=name)
    # Param drift bound: Adam normalizes by sqrt(second moment), so an
    # ulp-level gradient difference can move an element by up to ~lr per step
    # once trajectories decohere; require total drift below K lr steps
    # (measured 1.1e-3 after K=3 steps at lr 1e-3 on CPU) — way below any
    # training-relevant scale, yet fails instantly on a wrong rng fold-in,
    # batch-order bug, or weight-matrix mixup (those are O(weight-scale)).
    lr = trainer.config.lr
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params), jax.tree_util.tree_leaves(state_b.params)
    ):
        drift = np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)))
        assert drift < K * lr, f"param drift {drift} exceeds {K} lr steps"


def test_device_prefetch_stacked_shapes(rng):
    from neuralnet_tracker_traincode_tpu.data.loader import device_prefetch_stacked

    mesh = make_mesh()
    batches = [make_synthetic_batch(np.random.RandomState(i), B=8) for i in range(5)]
    out = list(device_prefetch_stacked(iter(batches), mesh, steps_per_dispatch=2))
    assert len(out) == 2  # trailing odd batch dropped
    assert out[0]["image"].shape == (2, 8, 64, 64, 1)
    np.testing.assert_array_equal(
        np.asarray(out[1]["coord"][0]), batches[2]["coord"]
    )


def test_param_group_labels():
    model = NetworkWithPointHead(enable_point_head=True, enable_uncertainty=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 129, 129, 1)),
    )
    labels = label_parameters(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    values = [v for _, v in flat]
    assert "variance" in values  # uncertainty modules found
    # quatnet's uncertainty net must be variance; backbone conv must be main
    as_str = {jax.tree_util.keystr(p): v for p, v in flat}
    assert any("uncertainty" in k and v == "variance" for k, v in as_str.items())
    assert any("convnet" in k or "conv" in k for k in as_str)


def test_schedule_values():
    from neuralnet_tracker_traincode_tpu.train.schedules import exponential_up_then_steps

    sched = exponential_up_then_steps(10, 0.1, [50])
    assert abs(sched(0) - 0.01 * np.exp(np.log(100) * 0.1)) < 1e-6
    assert abs(sched(9) - 1.0) < 1e-9
    assert sched(20) == 1.0
    assert abs(sched(60) - 0.1) < 1e-9
