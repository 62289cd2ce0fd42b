"""Typed schema conformance of every exported ONNX configuration.

Independent of the in-repo executors: the emitted bytes are decoded strictly
by onnx.proto3 field numbers and validated against the opset-13 operator
table (`export/onnx_conformance.py`) — attribute names/types, arities,
topological order, SSA, initializer sizes. This is the onnxruntime-less
stand-in for the reference's runtime check (`export_model.py:274-279`).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.export import onnx_conformance as C
from neuralnet_tracker_traincode_tpu.export import onnx_export, onnx_proto
from neuralnet_tracker_traincode_tpu.models.localizer import LocalizerNet
from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead


def _init(model, shape):
    rng = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rng, jnp.zeros(shape))
    return {"params": variables["params"], "batch_stats": variables["batch_stats"]}


def _build(config, **model_kw):
    model = NetworkWithPointHead(
        enable_point_head=True, enable_uncertainty=True, config=config, **model_kw
    )
    return model, _init(model, (1, 129, 129, 1))


@pytest.mark.parametrize(
    "config", ["mobilenetv1", "resnet18", "efficientnet_b0", "hybrid_vit"]
)
def test_backbone_configs_conform(config):
    model, variables = _build(config)
    blob = onnx_export.build_posenet_onnx(model, variables)
    m = C.validate_model(blob)
    assert m.opset_imports[""] == 13
    assert m.model_version == 4
    assert {vo.name for vo in m.graph.outputs} >= {"pos_size", "quat", "box"}


def test_full_outputs_conform():
    model, variables = _build("mobilenetv1")
    blob = onnx_export.build_posenet_onnx(model, variables, outputs="full")
    C.validate_model(blob)


def test_6drot_conforms():
    model, variables = _build("mobilenetv1", enable_6drot=True)
    C.validate_model(onnx_export.build_posenet_onnx(model, variables))


def test_blurpool_conforms():
    model, variables = _build("mobilenetv1", backbone_args={"use_blurpool": True})
    C.validate_model(onnx_export.build_posenet_onnx(model, variables))


def test_fp16_conforms():
    model, variables = _build("mobilenetv1")
    blob = onnx_export.build_posenet_onnx(model, variables, fp16=True)
    m = C.validate_model(blob)
    # fp16 models must still expose fp32 graph IO (the opentrack boundary)
    assert all(vi.elem_type == C.T_FLOAT for vi in m.graph.inputs)
    assert all(vo.elem_type == C.T_FLOAT for vo in m.graph.outputs)


def test_int8_ptq_conforms(rng):
    model, variables = _build("mobilenetv1")
    fp32_blob = onnx_export.build_posenet_onnx(model, variables)
    calib = [rng.rand(2, 1, 129, 129).astype(np.float32) - 0.5]
    ranges = onnx_export.calibrate_conv_ranges(fp32_blob, calib)
    blob = onnx_export.build_posenet_onnx(model, variables, quant_ranges=ranges)
    m = C.validate_model(blob)
    ops = {n.op_type for n in m.graph.nodes}
    assert "QuantizeLinear" in ops and "DequantizeLinear" in ops


def test_localizer_conforms():
    model = LocalizerNet()
    variables = _init(model, (1, 224, 288, 1))
    C.validate_model(onnx_export.build_localizer_onnx(model, variables))


# ---- negative cases: the checker must actually catch emission bugs ---------


def _mini_model(nodes_bytes: bytes, extra_graph: bytes = b"") -> bytes:
    inp = onnx_proto.value_info_proto("x", C.T_FLOAT, ["batch", 4])
    out = onnx_proto.value_info_proto("y", C.T_FLOAT, ["batch", 4])
    graph = (
        onnx_proto.field_string(2, "g")
        + nodes_bytes
        + onnx_proto.field_message(11, inp)
        + onnx_proto.field_message(12, out)
        + extra_graph
    )
    return onnx_proto.model_proto(graph)


def test_rejects_post13_attribute():
    # Reshape carrying allowzero (arrived at opset 14) under a 13 import
    shape_init = onnx_proto.tensor_proto("shape", np.asarray([0, 4], np.int64))
    node = onnx_proto.node_proto("Reshape", ["x", "shape"], ["y"], allowzero=1)
    blob = _mini_model(
        onnx_proto.field_message(1, node),
        extra_graph=onnx_proto.field_message(5, shape_init),
    )
    with pytest.raises(C.ConformanceError, match="allowzero"):
        C.validate_model(blob)


def test_rejects_wrong_attribute_type():
    # Concat axis must be INT; emit it as FLOAT
    node = onnx_proto.node_proto("Concat", ["x", "x"], ["y"], axis=0.0)
    with pytest.raises(C.ConformanceError, match="axis"):
        C.validate_model(_mini_model(onnx_proto.field_message(1, node)))


def test_rejects_missing_required_attribute():
    node = onnx_proto.node_proto("Cast", ["x"], ["y"])  # missing to=
    with pytest.raises(C.ConformanceError, match="to"):
        C.validate_model(_mini_model(onnx_proto.field_message(1, node)))


def test_rejects_use_before_def():
    n1 = onnx_proto.node_proto("Relu", ["t"], ["y"])  # t not yet produced
    n2 = onnx_proto.node_proto("Relu", ["x"], ["t"])
    blob = _mini_model(
        onnx_proto.field_message(1, n1) + onnx_proto.field_message(1, n2)
    )
    with pytest.raises(C.ConformanceError, match="topological"):
        C.validate_model(blob)


def test_rejects_ssa_violation():
    n1 = onnx_proto.node_proto("Relu", ["x"], ["y"])
    n2 = onnx_proto.node_proto("Abs", ["x"], ["y"])
    blob = _mini_model(
        onnx_proto.field_message(1, n1) + onnx_proto.field_message(1, n2)
    )
    with pytest.raises(C.ConformanceError, match="redefined"):
        C.validate_model(blob)


def test_rejects_wrong_arity():
    node = onnx_proto.node_proto("Add", ["x"], ["y"])  # Add needs 2 inputs
    with pytest.raises(C.ConformanceError, match="inputs"):
        C.validate_model(_mini_model(onnx_proto.field_message(1, node)))


def test_rejects_unknown_op():
    node = onnx_proto.node_proto("NotAnOp", ["x"], ["y"])
    with pytest.raises(C.ConformanceError, match="opset-13 table"):
        C.validate_model(_mini_model(onnx_proto.field_message(1, node)))


def test_rejects_bad_initializer_size():
    # raw_data shorter than dims x dtype size
    t = onnx_proto.field_string(8, "w")  # name
    t += onnx_proto.field_varint(2, C.T_FLOAT)  # data_type
    t += onnx_proto.field_varint(1, 4)  # dims: [4]
    t += onnx_proto.field_bytes(9, b"\x00" * 8)  # 8 bytes != 16
    node = onnx_proto.node_proto("Add", ["x", "w"], ["y"])
    blob = _mini_model(
        onnx_proto.field_message(1, node),
        extra_graph=onnx_proto.field_message(5, t),
    )
    with pytest.raises(C.ConformanceError, match="raw_data length"):
        C.validate_model(blob)


def test_rejects_unsqueeze_axes_attribute():
    # Unsqueeze axes must be an INPUT at opset 13, not an attribute
    axes_init = onnx_proto.tensor_proto("axes_in", np.asarray([0], np.int64))
    node = onnx_proto.node_proto("Unsqueeze", ["x", "axes_in"], ["y"], axes=[0])
    blob = _mini_model(
        onnx_proto.field_message(1, node),
        extra_graph=onnx_proto.field_message(5, axes_init),
    )
    with pytest.raises(C.ConformanceError, match="axes"):
        C.validate_model(blob)
