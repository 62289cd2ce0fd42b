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


def test_posenet_onnx_resnet18_parity(rng):
    model = NetworkWithPointHead(enable_point_head=True, config="resnet18")
    variables = _init(model, (1, 129, 129, 1))
    blob = onnx_export.build_posenet_onnx(model, variables)
    sess = onnx_run.NumpyOnnxSession(blob)
    x_nhwc = (rng.rand(2, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    out = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
    np.testing.assert_allclose(out["quat"], np.asarray(ref["pose"]), atol=1e-4)
    np.testing.assert_allclose(out["pos_size"], np.asarray(ref["coord"]), atol=1e-4)
    np.testing.assert_allclose(out["box"], np.asarray(ref["roi"]), atol=1e-4)


def test_posenet_onnx_fp16(posenet_and_vars, rng):
    model, variables = posenet_and_vars
    blob = onnx_export.build_posenet_onnx(model, variables, fp16=True)
    blob32 = onnx_export.build_posenet_onnx(model, variables)
    assert len(blob) < 0.6 * len(blob32)  # weights actually stored as fp16
    sess = onnx_run.NumpyOnnxSession(blob)
    x_nhwc = (rng.rand(2, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    out = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
    for k in out:
        assert out[k].dtype == np.float32  # boundary casts back to fp32
    np.testing.assert_allclose(out["quat"], np.asarray(ref["pose"]), atol=5e-2)
    np.testing.assert_allclose(out["pos_size"], np.asarray(ref["coord"]), atol=5e-2)
    np.testing.assert_allclose(out["box"], np.asarray(ref["roi"]), atol=5e-2)


def test_posenet_onnx_int8_ptq(rng):
    model = NetworkWithPointHead(enable_point_head=True, config="mobilenetv1")
    variables = _init(model, (1, 129, 129, 1))
    fp32_blob = onnx_export.build_posenet_onnx(model, variables)
    calib = [rng.rand(4, 1, 129, 129).astype(np.float32) - 0.5 for _ in range(2)]
    ranges = onnx_export.calibrate_conv_ranges(fp32_blob, calib)
    assert len(ranges) == 27  # stem + 13 blocks x 2 convs
    blob = onnx_export.build_posenet_onnx(model, variables, quant_ranges=ranges)

    m = onnx_run.load_model(blob)
    int8_weights = [v for v in m.initializers.values() if v.dtype == np.int8 and v.ndim == 4]
    assert len(int8_weights) == 27  # every backbone conv weight stored as int8

    sess32 = onnx_run.NumpyOnnxSession(fp32_blob)
    sess8 = onnx_run.NumpyOnnxSession(blob)
    x = calib[0][:2]
    out32 = dict(zip(sess32.output_names, sess32.run(None, {"x": x})))
    out8 = dict(zip(sess8.output_names, sess8.run(None, {"x": x})))
    for k in ("quat", "pos_size", "box"):
        np.testing.assert_allclose(out8[k], out32[k], atol=2e-1)
    # quat must still be normalized exactly (normalization is fp32)
    np.testing.assert_allclose(np.linalg.norm(out8["quat"], axis=-1), 1.0, atol=1e-5)


def test_jax_onnx_session_matches_numpy(posenet_and_vars, rng):
    model, variables = posenet_and_vars
    blob = onnx_export.build_posenet_onnx(model, variables)
    s_np = onnx_run.NumpyOnnxSession(blob)
    s_jx = onnx_run.JaxOnnxSession(blob)
    assert s_jx.output_names == s_np.output_names
    x = np.moveaxis(rng.rand(2, 129, 129, 1).astype(np.float32) - 0.5, -1, 1)
    out_np = s_np.run(None, {"x": x})
    out_jx = s_jx.run(None, {"x": x})
    for a, b in zip(out_np, out_jx):
        np.testing.assert_allclose(a, b, atol=2e-4)

    # quantized graph (QDQ ops) must run identically on both backends
    calib = [x]
    ranges = onnx_export.calibrate_conv_ranges(blob, calib)
    qblob = onnx_export.build_posenet_onnx(model, variables, quant_ranges=ranges)
    out_qnp = onnx_run.NumpyOnnxSession(qblob).run(None, {"x": x})
    out_qjx = onnx_run.JaxOnnxSession(qblob).run(None, {"x": x})
    for a, b in zip(out_qnp, out_qjx):
        np.testing.assert_allclose(a, b, atol=5e-3)


@pytest.mark.slow
def test_posenet_onnx_full_outputs(rng):
    model = NetworkWithPointHead(
        enable_point_head=True, enable_uncertainty=True, enable_face_detector=True,
        config="mobilenetv1",
    )
    variables = _init(model, (1, 129, 129, 1))
    # Non-trivial learned offsets for BOTH offset heads.
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    p = np.zeros((8, 4), np.float32)
    p[0] = [0.02, 0.08, -0.15, 0.25]
    params["local_pose_offset"]["p"] = jnp.asarray(p)
    pk = np.zeros((8, 4), np.float32)
    pk[0] = [0.0, -0.05, 0.1, -0.3]
    params["local_pose_offset_kpts"]["p"] = jnp.asarray(pk)
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    blob = onnx_export.build_posenet_onnx(model, variables, outputs="full")
    sess = onnx_run.NumpyOnnxSession(blob)
    assert set(sess.output_names) == {
        "coord", "pose", "roi", "unnormalized_quat", "pt3d_68", "shapeparam",
        "hasface_logits", "hasface",
        "coord_scales", "pose_scales_tril", "roi_scales",
        "pt3d_68_scales", "shapeparam_scales",
    }
    x_nhwc = (rng.rand(2, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    out = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
    for key in sess.output_names:
        np.testing.assert_allclose(
            out[key], np.asarray(ref[key]), atol=2e-4, err_msg=key
        )
    assert out["pt3d_68"].shape == (2, 68, 3)
    assert out["hasface"].shape == (2,)


@pytest.mark.slow
def test_posenet_onnx_blurpool_mobilenet(rng):
    model = NetworkWithPointHead(
        enable_point_head=True, config="mobilenetv1",
        backbone_args={"use_blurpool": True},
    )
    variables = _init(model, (1, 129, 129, 1))
    blob = onnx_export.build_posenet_onnx(model, variables)
    sess = onnx_run.NumpyOnnxSession(blob)
    x_nhwc = (rng.rand(2, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    out = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
    np.testing.assert_allclose(out["quat"], np.asarray(ref["pose"]), atol=1e-4)
    np.testing.assert_allclose(out["pos_size"], np.asarray(ref["coord"]), atol=1e-4)
    np.testing.assert_allclose(out["box"], np.asarray(ref["roi"]), atol=1e-4)


@pytest.mark.slow
def test_posenet_onnx_blurpool_resnet18(rng):
    model = NetworkWithPointHead(
        enable_point_head=True, config="resnet18",
        backbone_args={"use_blurpool": True},
    )
    variables = _init(model, (1, 129, 129, 1))
    blob = onnx_export.build_posenet_onnx(model, variables)
    sess = onnx_run.NumpyOnnxSession(blob)
    x_nhwc = (rng.rand(2, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    out = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
    np.testing.assert_allclose(out["quat"], np.asarray(ref["pose"]), atol=1e-4)
    np.testing.assert_allclose(out["pos_size"], np.asarray(ref["coord"]), atol=1e-4)
    np.testing.assert_allclose(out["box"], np.asarray(ref["roi"]), atol=1e-4)


@pytest.mark.slow
def test_posenet_onnx_6drot_full(rng):
    model = NetworkWithPointHead(
        enable_point_head=True, enable_6drot=True, config="mobilenetv1"
    )
    variables = _init(model, (1, 129, 129, 1))
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    p = np.zeros((8, 4), np.float32)
    p[0] = [0.0, 0.12, -0.1, 0.2]
    params["local_pose_offset"]["p"] = jnp.asarray(p)
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    blob = onnx_export.build_posenet_onnx(model, variables, outputs="full")
    sess = onnx_run.NumpyOnnxSession(blob)
    assert "unnormalized_6drepr" in sess.output_names
    x_nhwc = (rng.rand(3, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    out = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
    for key in ("coord", "pose", "roi", "unnormalized_6drepr", "pt3d_68", "shapeparam"):
        np.testing.assert_allclose(
            out[key], np.asarray(ref[key]), atol=2e-4, err_msg=key
        )
    # quaternion from the on-graph from_matrix must be normalized w/ positive real
    np.testing.assert_allclose(np.linalg.norm(out["pose"], axis=-1), 1.0, atol=1e-5)
    assert (out["pose"][:, 3] >= 0).all()


def test_posenet_onnx_6drot_opentrack(rng):
    model = NetworkWithPointHead(enable_point_head=False, enable_6drot=True, config="mobilenetv1")
    variables = _init(model, (1, 129, 129, 1))
    blob = onnx_export.build_posenet_onnx(model, variables)
    sess = onnx_run.NumpyOnnxSession(blob)
    x_nhwc = (rng.rand(2, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    out = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
    np.testing.assert_allclose(out["quat"], np.asarray(ref["pose"]), atol=2e-4)
    np.testing.assert_allclose(out["pos_size"], np.asarray(ref["coord"]), atol=1e-4)


@pytest.mark.slow
def test_posenet_onnx_efficientnet_b0(rng):
    model = NetworkWithPointHead(enable_point_head=True, config="efficientnet_b0")
    variables = _init(model, (1, 129, 129, 1))
    blob = onnx_export.build_posenet_onnx(model, variables)
    sess = onnx_run.NumpyOnnxSession(blob)
    x_nhwc = (rng.rand(1, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    out = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
    np.testing.assert_allclose(out["quat"], np.asarray(ref["pose"]), atol=2e-4)
    np.testing.assert_allclose(out["pos_size"], np.asarray(ref["coord"]), atol=2e-4)
    np.testing.assert_allclose(out["box"], np.asarray(ref["roi"]), atol=2e-4)


@pytest.mark.slow
def test_posenet_onnx_hybrid_vit(rng):
    """Transformer backbone export: attention decomposes to MatMul/Softmax,
    LayerNorm to ReduceMean/Sqrt; per-query features feed the right heads
    (reference exports this net via torch.onnx, `export_model.py:201-279`)."""
    model = NetworkWithPointHead(
        enable_point_head=True, enable_uncertainty=True, config="hybrid_vit"
    )
    variables = _init(model, (1, 129, 129, 1))
    blob = onnx_export.build_posenet_onnx(model, variables, outputs="full")
    sess = onnx_run.NumpyOnnxSession(blob)
    x_nhwc = (rng.rand(2, 129, 129, 1).astype(np.float32) - 0.5)
    ref = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    out = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
    for k in ("pose", "coord", "roi", "pt3d_68", "shapeparam",
              "coord_scales", "pose_scales_tril"):
        np.testing.assert_allclose(out[k], np.asarray(ref[k]), atol=2e-4, err_msg=k)


def test_onnx_rotation_math_emissions(rng):
    """The on-graph quat<->matrix conversions must match ops.quaternion for
    arbitrary rotations — including ones where from_matrix picks each of the
    four candidate solutions (near-180-degree rotations about each axis)."""
    from scipy.spatial.transform import Rotation

    from neuralnet_tracker_traincode_tpu.export import onnx_proto as P
    from neuralnet_tracker_traincode_tpu.ops import quaternion as Q

    quats = Rotation.random(256, random_state=7).as_quat().astype(np.float32)
    # Force all four candidate branches: rotations by ~179.9 deg about x/y/z
    # (and identity) make the w/i/j/k diagonals the best-conditioned choices.
    extremes = Rotation.from_rotvec(
        np.asarray([
            [np.pi * 0.9995, 0, 0], [0, np.pi * 0.9995, 0],
            [0, 0, np.pi * 0.9995], [0, 0, 0],
        ])
    ).as_quat().astype(np.float32)
    quats = np.concatenate([quats, extremes]).astype(np.float32)

    g = onnx_export.GraphBuilder()
    m = onnx_export._emit_quat_tomatrix(g, "q")
    q2 = onnx_export._emit_from_matrix(g, m)
    g.rename_output(m, "matrix")
    g.rename_output(q2, "quat_roundtrip")
    graph = P.graph_proto(
        "rotmath", g.nodes,
        [P.value_info_proto("q", P.FLOAT, ["batch", 4])],
        [P.value_info_proto("matrix", P.FLOAT, ["batch", 3, 3]),
         P.value_info_proto("quat_roundtrip", P.FLOAT, ["batch", 4])],
        g.initializers,
    )
    blob = P.model_proto(graph, opset_version=13, model_version=4)
    sess = onnx_run.NumpyOnnxSession(blob)
    mats, rt = sess.run(None, {"q": quats})

    ref_m = np.asarray(Q.tomatrix(jnp.asarray(quats)))
    np.testing.assert_allclose(mats, ref_m, atol=1e-5)
    ref_q = np.asarray(Q.from_matrix(jnp.asarray(ref_m)))
    np.testing.assert_allclose(rt, ref_q, atol=1e-4)
    # roundtrip = original up to sign (positivereal)
    sign = np.sign(quats[:, 3:4])
    sign[sign == 0] = 1.0
    np.testing.assert_allclose(rt, quats * sign, atol=1e-3)

    # 6d path roundtrip over the same rotations
    g2 = onnx_export.GraphBuilder()
    m6 = onnx_export._emit_6d_tomatrix(g2, "z6")
    g2.rename_output(m6, "matrix")
    graph2 = P.graph_proto(
        "rot6d", g2.nodes,
        [P.value_info_proto("z6", P.FLOAT, ["batch", 6])],
        [P.value_info_proto("matrix", P.FLOAT, ["batch", 3, 3])],
        g2.initializers,
    )
    from neuralnet_tracker_traincode_tpu.ops import rot6d

    z6 = ref_m[:, :2, :].reshape(-1, 6) + rng.randn(len(quats), 6).astype(np.float32) * 0.01
    (mats6,) = onnx_run.NumpyOnnxSession(
        P.model_proto(graph2, opset_version=13, model_version=4)
    ).run(None, {"z6": z6})
    ref6 = np.asarray(rot6d.tomatrix(jnp.asarray(z6)))
    np.testing.assert_allclose(mats6, ref6, atol=1e-5)
