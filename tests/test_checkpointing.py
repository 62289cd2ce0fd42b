"""Training-state resume round-trip and torch checkpoint interop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.train.checkpointing import (
    load_train_state,
    save_train_state,
)


@pytest.mark.slow
def test_train_state_roundtrip(tmp_path):
    from neuralnet_tracker_traincode_tpu.augmentation.pipeline import TrainAugmentationConfig
    from neuralnet_tracker_traincode_tpu.data.fields import Tag
    from neuralnet_tracker_traincode_tpu.data.loader import LABEL_CATEGORIES
    from neuralnet_tracker_traincode_tpu.losses import losses as L
    from neuralnet_tracker_traincode_tpu.losses.criterion import (
        Criterion,
        CriterionGroup,
        MaskedMultiTaskCriterion,
    )
    from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead
    from neuralnet_tracker_traincode_tpu.train.loop import PoseTrainer, TrainerConfig

    model = NetworkWithPointHead(enable_point_head=False)
    crit = MaskedMultiTaskCriterion(
        {Tag.ONLY_POSE: CriterionGroup([Criterion("rot", L.QuatPoseLoss(), 1.0)])},
        [Tag.ONLY_POSE],
    )
    cfg = TrainerConfig(batchsize=8, epochs=2, samples_per_epoch=16)
    trainer = PoseTrainer(model, crit, cfg, LABEL_CATEGORIES)
    state = trainer.init_state(jax.random.PRNGKey(0), (129, 129, 1))
    state = state.replace(step=jnp.asarray(17, jnp.int32))

    path = str(tmp_path / "resume.msgpack")
    save_train_state(state, path, extra={"epoch": 3})
    state2, extra = load_train_state(trainer.init_state(jax.random.PRNGKey(1), (129, 129, 1)), path)
    assert extra == {"epoch": 3}
    assert int(state2.step) == 17
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(state2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_interop_roundtrip(tmp_path):
    """Build a fake reference-style state dict from our own params, convert, compare."""
    torch = pytest.importorskip("torch")

    from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead
    from neuralnet_tracker_traincode_tpu.models.torch_interop import (
        convert_posenet_state_dict,
    )

    model = NetworkWithPointHead(enable_point_head=True, enable_uncertainty=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 129, 129, 1)),
    )
    params, stats = variables["params"], variables["batch_stats"]

    # Emit the reference's state-dict naming from our tree (inverse mapping).
    sd = {}

    def put_linear(prefix, p):
        sd[prefix + ".weight"] = np.transpose(np.asarray(p["kernel"]), (1, 0))
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    def put_bn(prefix, p, s):
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])
        sd[prefix + ".running_mean"] = np.asarray(s["mean"])
        sd[prefix + ".running_var"] = np.asarray(s["var"])

    cp, cs = params["convnet"], stats["convnet"]
    sd["convnet.conv1.weight"] = np.transpose(np.asarray(cp["conv1"]["kernel"]), (3, 2, 0, 1))
    put_bn("convnet.bn1", cp["bn1"], cs["bn1"])
    for name in "dw2_1 dw2_2 dw3_1 dw3_2 dw4_1 dw4_2 dw5_1 dw5_2 dw5_3 dw5_4 dw5_5 dw5_6 dw6".split():
        sd[f"convnet.{name}.conv_dw.weight"] = np.transpose(
            np.asarray(cp[name]["conv_dw"]["kernel"]), (3, 2, 0, 1)
        )
        put_bn(f"convnet.{name}.bn_dw", cp[name]["bn_dw"], cs[name]["bn_dw"])
        sd[f"convnet.{name}.conv_sep.weight"] = np.transpose(
            np.asarray(cp[name]["conv_sep"]["kernel"]), (3, 2, 0, 1)
        )
        put_bn(f"convnet.{name}.bn_sep", cp[name]["bn_sep"], cs[name]["bn_sep"])

    put_linear("boxnet.linear", params["boxnet"]["linear"])
    sd["boxnet.scales.hidden_scale"] = np.asarray(
        params["boxnet"]["uncertainty_scales"]["hidden_scale"]
    )
    put_linear("posnet.linear_xy", params["posnet"]["linear_xy"])
    put_linear("posnet.linear_size", params["posnet"]["linear_size"])
    put_linear("posnet.scales.neck.lin", params["posnet"]["uncertainty_scales"]["neck"]["lin"])
    put_linear("quatnet.linear", params["quatnet"]["linear"])
    put_linear(
        "quatnet.uncertainty_net.neck.lin", params["quatnet"]["uncertainty_net"]["neck"]["lin"]
    )
    sd["local_pose_offset.p"] = np.asarray(params["local_pose_offset"]["p"])
    sd["local_pose_offset_kpts.p"] = np.asarray(params["local_pose_offset_kpts"]["p"])
    put_linear("landmarks.shapenet", params["landmarks"]["shapenet"])
    sd["landmarks.point_distrib_scales.hidden_scale"] = np.asarray(
        params["landmarks"]["uncertainty_points"]["hidden_scale"]
    )
    sd["landmarks.shape_distrib_scales.hidden_scale"] = np.asarray(
        params["landmarks"]["uncertainty_shape"]["hidden_scale"]
    )

    converted = convert_posenet_state_dict(sd, model.get_config())
    # Converted tree must reproduce the original forward exactly.
    x = jnp.asarray(np.random.RandomState(0).rand(2, 129, 129, 1).astype(np.float32))
    out1 = model.apply(variables, x, train=False)
    out2 = model.apply(converted, x, train=False)
    np.testing.assert_allclose(np.asarray(out1["pose"]), np.asarray(out2["pose"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1["pt3d_68"]), np.asarray(out2["pt3d_68"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out1["pose_scales_tril"]), np.asarray(out2["pose_scales_tril"]), atol=1e-6
    )
