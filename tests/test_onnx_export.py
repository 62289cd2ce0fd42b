"""ONNX export: structural round-trip + semantic parity with the flax forward.

The reference verifies exports with onnxruntime (`export_model.py:274-279`);
here the emitted bytes are decoded and executed by the numpy reference
executor and compared against the flax model (atol 1e-4, like the reference).
"""

import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.export import onnx_export, onnx_proto, onnx_run
from neuralnet_tracker_traincode_tpu.models.localizer import LocalizerNet
from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead


def _init(model, shape):
    rng = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rng, jnp.zeros(shape))
    # Perturb batch stats so BN folding is actually exercised.
    import jax.tree_util as jtu

    def perturb(path, x):
        if "var" in jax.tree_util.keystr(path):
            return x * 1.7 + 0.05
        if "mean" in jax.tree_util.keystr(path):
            return x + 0.01
        return x

    bs = jtu.tree_map_with_path(perturb, variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": bs}


@pytest.fixture(scope="module")
def posenet_and_vars():
    model = NetworkWithPointHead(
        enable_point_head=True, enable_uncertainty=True, config="mobilenetv1"
    )
    return model, _init(model, (1, 129, 129, 1))


def test_posenet_onnx_parity(posenet_and_vars, rng):
    model, variables = posenet_and_vars
    blob = onnx_export.build_posenet_onnx(model, variables)
    sess = onnx_run.NumpyOnnxSession(blob)
    assert sess.model_version == 4
    assert set(sess.output_names) == {
        "pos_size", "quat", "box", "pos_size_scales", "rotaxis_scales_tril", "box_scales",
    }

    x_nhwc = (rng.rand(2, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    x_nchw = np.moveaxis(x_nhwc, -1, 1)
    out = dict(zip(sess.output_names, sess.run(None, {"x": x_nchw})))

    np.testing.assert_allclose(out["quat"], np.asarray(ref["pose"]), atol=1e-4)
    np.testing.assert_allclose(out["pos_size"], np.asarray(ref["coord"]), atol=1e-4)
    np.testing.assert_allclose(out["box"], np.asarray(ref["roi"]), atol=1e-4)
    np.testing.assert_allclose(
        out["pos_size_scales"], np.asarray(ref["coord_scales"]), atol=1e-4
    )
    np.testing.assert_allclose(
        out["rotaxis_scales_tril"], np.asarray(ref["pose_scales_tril"]), atol=1e-4
    )
    np.testing.assert_allclose(out["box_scales"], np.asarray(ref["roi_scales"]), atol=1e-4)


def test_posenet_onnx_nonzero_pose_offset(posenet_and_vars, rng):
    # Exercise the local->global offset path with non-trivial learned params.
    model, variables = posenet_and_vars
    p = np.zeros((8, 4), np.float32)
    p[0] = [0.05, 0.1, -0.2, 0.3]
    variables = dict(variables)
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    params["local_pose_offset"]["p"] = jnp.asarray(p)
    variables["params"] = params
    blob = onnx_export.build_posenet_onnx(model, variables)
    sess = onnx_run.NumpyOnnxSession(blob)
    x_nhwc = (rng.rand(2, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    out = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
    np.testing.assert_allclose(out["quat"], np.asarray(ref["pose"]), atol=1e-4)
    np.testing.assert_allclose(out["pos_size"], np.asarray(ref["coord"]), atol=1e-4)


def test_localizer_onnx_parity(rng):
    model = LocalizerNet()
    variables = _init(model, (1, 224, 288, 1))
    blob = onnx_export.build_localizer_onnx(model, variables)
    sess = onnx_run.NumpyOnnxSession(blob)
    x_nhwc = rng.rand(2, 224, 288, 1).astype(np.float32) - 0.5
    ref = np.asarray(model.apply(variables, jnp.asarray(x_nhwc)))
    (out,) = sess.run(["logit_box"], {"x": np.moveaxis(x_nhwc, -1, 1)})
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_wire_format_protoc_compatible(posenet_and_vars, tmp_path):
    # protoc --decode_raw must accept the emitted bytes (generic wire parse).
    model, variables = posenet_and_vars
    blob = onnx_export.build_posenet_onnx(model, variables)
    path = tmp_path / "m.onnx"
    path.write_bytes(blob)
    try:
        res = subprocess.run(
            ["protoc", "--decode_raw"], stdin=open(path, "rb"),
            capture_output=True, timeout=120,
        )
    except FileNotFoundError:
        pytest.skip("protoc not available")
    assert res.returncode == 0, res.stderr[:500]
    assert b"7 {" in res.stdout  # the graph field


def test_clear_denormals():
    tree = {"a": np.asarray([1e-30, 1.0, -1e-25], np.float32)}
    out = onnx_export.clear_denormals(tree)
    np.testing.assert_array_equal(out["a"], [0.0, 1.0, 0.0])
