"""Model forward shape/sanity + save/load round-trips (mirrors `test/test_models_sanity.py`
and `test/test_backbones.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.models import io as model_io
from neuralnet_tracker_traincode_tpu.models.localizer import LocalizerNet
from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead
from neuralnet_tracker_traincode_tpu.ops.rotrepr import Mat33Repr, QuatRepr

B = 2
RES = 129


def init_model(model, x_shape=(B, RES, RES, 1), **kwargs):
    rng = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    x = jnp.zeros(x_shape, jnp.float32)
    variables = model.init(rng, x, **kwargs)
    return variables, x


@pytest.mark.parametrize("config", ["mobilenetv1", "resnet18"])
def test_posenet_forward_shapes(config):
    model = NetworkWithPointHead(
        enable_point_head=True, config=config, enable_uncertainty=True,
        backbone_args={"use_blurpool": False},
    )
    variables, x = init_model(model)
    out = model.apply(variables, x, train=False)
    assert isinstance(out["rot"], QuatRepr)
    assert out["pose"].shape == (B, 4)
    assert out["coord"].shape == (B, 3)
    assert out["roi"].shape == (B, 4)
    assert out["pt3d_68"].shape == (B, 68, 3)
    assert out["shapeparam"].shape == (B, 50)
    assert out["unnormalized_quat"].shape == (B, 4)
    assert out["pose_scales_tril"].shape == (B, 3, 3)
    assert out["coord_scales"].shape == (B, 3, 3)
    assert out["roi_scales"].shape == (B, 4)
    assert out["pt3d_68_scales"].shape == (B, 68, 3)
    assert out["shapeparam_scales"].shape == (B, 50)
    # Normalized quaternion with positive-biased real part
    norms = np.linalg.norm(np.asarray(out["pose"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # pose_scales_tril is lower triangular with positive diagonal
    tril = np.asarray(out["pose_scales_tril"])
    assert np.all(tril[:, np.triu_indices(3, 1)[0], np.triu_indices(3, 1)[1]] == 0)
    assert np.all(tril[:, np.arange(3), np.arange(3)] > 0)


def test_posenet_6drot():
    model = NetworkWithPointHead(
        enable_point_head=False, config="mobilenetv1", enable_6drot=True,
    )
    variables, x = init_model(model)
    out = model.apply(variables, x, train=False)
    assert isinstance(out["rot"], Mat33Repr)
    assert out["rot"].value.shape == (B, 3, 3)
    assert out["unnormalized_6drepr"].shape == (B, 6)
    assert out["pose"].shape == (B, 4)


def test_posenet_face_detector():
    model = NetworkWithPointHead(
        enable_point_head=False, enable_face_detector=True, config="mobilenetv1"
    )
    variables, x = init_model(model)
    out = model.apply(variables, x, train=False)
    assert out["hasface"].shape == (B,)
    assert np.all((np.asarray(out["hasface"]) >= 0) & (np.asarray(out["hasface"]) <= 1))


def test_posenet_coord_convention_ids():
    model = NetworkWithPointHead(enable_point_head=False)
    variables, x = init_model(model)
    ids = jnp.asarray([0, 3], jnp.int32)
    out = model.apply(variables, x, coord_convention_id=ids, train=False)
    assert out["coord"].shape == (B, 3)


@pytest.mark.slow
def test_posenet_train_mode_jit_and_grad():
    model = NetworkWithPointHead(enable_point_head=True, enable_uncertainty=False)
    variables, x = init_model(model)

    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(out["coord"] ** 2) + jnp.sum(out["pt3d_68"] ** 2)

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_backbone_intermediate_shapes():
    from neuralnet_tracker_traincode_tpu.models.backbones.mobilenet_v1 import MobileNet

    model = MobileNet()
    x = jnp.zeros((1, 129, 129, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    pooled, inter = model.apply(variables, x)
    assert pooled.shape == (1, 1024)
    # Feature map sizes from the reference backbone contract: 65/33/17/9/5
    assert [f.shape[1] for f in inter] == [65, 33, 17, 9, 5]
    assert [f.shape[-1] for f in inter] == [64, 128, 256, 512, 1024]


@pytest.mark.slow
def test_hybrid_vit_backbone():
    from neuralnet_tracker_traincode_tpu.models.backbones.hybrid_vit import HybridVitBackbone

    model = HybridVitBackbone(num_heads_out=4)
    x = jnp.zeros((2, 129, 129, 1))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    out, _ = model.apply(variables, x)
    assert out.shape == (2, 4, 256)


@pytest.mark.slow
def test_efficientnet_backbone():
    from neuralnet_tracker_traincode_tpu.models.backbones.efficientnet import EfficientNetBackbone

    model = EfficientNetBackbone(kind="b0")
    x = jnp.zeros((1, 129, 129, 1))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    pooled, inter = model.apply(variables, x)
    assert pooled.shape == (1, 1280)
    assert [f.shape[1] for f in inter] == [65, 33, 17, 9, 5]


@pytest.mark.slow
def test_localizer_forward():
    model = LocalizerNet()
    x = jnp.zeros((2, 224, 288, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    pred = model.apply(variables, x)
    assert pred.shape == (2, 5)
    out = LocalizerNet.inference_outputs(pred)
    assert out["hasface"].shape == (2,)
    assert out["roi"].shape == (2, 4)
    # box = mean -+ std => x1 > x0, y1 > y0
    roi = np.asarray(out["roi"])
    assert np.all(roi[:, 2] > roi[:, 0]) and np.all(roi[:, 3] > roi[:, 1])


def test_save_load_roundtrip(tmp_path):
    model = NetworkWithPointHead(enable_point_head=True, enable_uncertainty=True)
    variables, x = init_model(model)
    path = str(tmp_path / "model.nnckpt")
    model_io.save_model(model, variables, path)
    model2, variables2 = model_io.load_posenet(path)
    assert model2.get_config() == model.get_config()
    out1 = model.apply(variables, x, train=False)
    out2 = model2.apply(variables2, x, train=False)
    np.testing.assert_allclose(np.asarray(out1["pose"]), np.asarray(out2["pose"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1["pt3d_68"]), np.asarray(out2["pt3d_68"]), atol=1e-6)


def test_bad_checkpoint_raises(tmp_path):
    path = str(tmp_path / "junk.nnckpt")
    with open(path, "wb") as f:
        f.write(b"not a checkpoint")
    with pytest.raises(model_io.InvalidFileFormatError):
        model_io.load_posenet(path)
