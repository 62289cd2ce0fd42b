"""Export trained networks to ONNX for the opentrack plugin.

Contract: `scripts/export_model.py` of the reference — opentrack output names
(coord->pos_size, pose->quat, roi->box, *_scales), opset 13, model_version 4,
denormal scrubbing, conv+BN fusion. The graph is emitted with the
self-contained writer in onnx_proto.py (neither onnx nor onnxruntime ship in
the training image); BatchNorm is folded into conv weights at export, so the
graph is already "simplified" (the reference runs onnxsim for this).

Supported: NetworkWithPointHead with the mobilenetv1 backbone (the deployed
configuration), with and without uncertainty heads; LocalizerNet. Inputs are
NCHW float32 like the reference's exports.
"""

import math
from typing import List, Optional, Sequence

import numpy as np

from neuralnet_tracker_traincode_tpu.export import onnx_proto as P

BN_EPS = 1e-5


def clear_denormals(tree, threshold=1e-20):
    """Zero out denormal weights (`export_model.py:36-50`)."""

    def scrub(x):
        x = np.asarray(x)
        if x.dtype in (np.float32, np.float64):
            x = np.where(np.abs(x) < threshold, 0.0, x)
        return x

    import jax

    return jax.tree_util.tree_map(scrub, tree)


def _np_smoothclip0(x):
    return np.where(x > 0, x + 1.0, np.exp(x))


class GraphBuilder:
    def __init__(self, fp16: bool = False):
        self.nodes: List[bytes] = []
        self.initializers: List[bytes] = []
        self._counter = 0
        # fp16 graphs store every float initializer as FLOAT16; callers cast
        # the graph input to fp16 and the outputs back to fp32 (same boundary
        # contract as the reference's onnxconverter fp16 pass,
        # reference export_model.py's --posehalf path).
        self.fp16 = fp16
        # Static PTQ (QDQ form): per-conv-index activation (min, max) ranges.
        # Mirrors the reference's backbone-only FX PTQ (quint8 per-tensor
        # activations, qint8 per-channel-symmetric weights, avgpool/heads
        # fp32; reference export_model.py:53-113) — the convs are exactly
        # the backbone here (heads are Gemm).
        self.quant_ranges: Optional[Sequence] = None
        self._conv_quant_idx = 0

    def fresh(self, hint="t"):
        self._counter += 1
        return f"{hint}_{self._counter}"

    def init_tensor(self, array, hint="const"):
        array = np.ascontiguousarray(array)
        if self.fp16 and array.dtype == np.float32:
            array = array.astype(np.float16)
        name = self.fresh(hint)
        self.initializers.append(P.tensor_proto(name, array))
        return name

    def node(self, op, inputs, n_out=1, hint=None, **attrs):
        outs = [self.fresh(hint or op.lower()) for _ in range(n_out)]
        self.nodes.append(P.node_proto(op, inputs, outs, name=self.fresh(op), **attrs))
        return outs[0] if n_out == 1 else outs

    def rename_output(self, src: str, dst: str):
        self.nodes.append(P.node_proto("Identity", [src], [dst], name=self.fresh("Identity")))
        return dst

    # --- quantization helpers ------------------------------------------------
    def _qdq_activation(self, x, lo, hi):
        scale = max((float(hi) - float(lo)) / 255.0, 1e-8)
        zp = int(np.clip(round(-float(lo) / scale), 0, 255))
        s = self.init_tensor(np.asarray(scale, np.float32), "qs")
        z = self.init_tensor(np.asarray(zp, np.uint8), "qz")
        q = self.node("QuantizeLinear", [x, s, z])
        return self.node("DequantizeLinear", [q, s, z])

    def _qdq_weight(self, w_oihw):
        absmax = np.abs(w_oihw).reshape(w_oihw.shape[0], -1).max(axis=1)
        scale = np.maximum(absmax / 127.0, 1e-12).astype(np.float32)
        wq = np.clip(
            np.rint(w_oihw / scale[:, None, None, None]), -127, 127
        ).astype(np.int8)
        s = self.init_tensor(scale, "wqs")
        z = self.init_tensor(np.zeros(w_oihw.shape[0], np.int8), "wqz")
        q = self.init_tensor(wq, "Wq")
        return self.node("DequantizeLinear", [q, s, z], axis=0)

    # --- common op helpers ---------------------------------------------------
    def conv(self, x, weight_oihw, bias, stride=1, group=1, pads=None):
        w_arr = weight_oihw.astype(np.float32)
        if self.quant_ranges is not None:
            lo, hi = self.quant_ranges[self._conv_quant_idx]
            self._conv_quant_idx += 1
            x = self._qdq_activation(x, lo, hi)
            w = self._qdq_weight(w_arr)
        else:
            w = self.init_tensor(w_arr, "W")
        inputs = [x, w]
        if bias is not None:
            inputs.append(self.init_tensor(bias.astype(np.float32), "B"))
        kh, kw = weight_oihw.shape[2], weight_oihw.shape[3]
        if pads is None:
            pads = [kh // 2, kw // 2, kh // 2, kw // 2]
        return self.node(
            "Conv", inputs, strides=[stride, stride], group=group, pads=pads,
            kernel_shape=[kh, kw],
        )

    def gemm(self, x, weight_in_out, bias):
        w = self.init_tensor(weight_in_out.T.astype(np.float32), "Wfc")  # (out, in)
        b = self.init_tensor(bias.astype(np.float32), "Bfc")
        return self.node("Gemm", [x, w, b], transB=1)

    def relu(self, x):
        return self.node("Relu", [x])

    def smoothclip0(self, x):
        e = self.node("Elu", [x], alpha=1.0)
        one = self.init_tensor(np.asarray([1.0], np.float32), "one")
        return self.node("Add", [e, one])

    def add(self, a, b):
        return self.node("Add", [a, b])

    def mul(self, a, b):
        return self.node("Mul", [a, b])

    def sub(self, a, b):
        return self.node("Sub", [a, b])

    def concat(self, xs, axis=1):
        return self.node("Concat", xs, axis=axis)

    def slice_(self, x, starts, ends, axes):
        s = self.init_tensor(np.asarray(starts, np.int64), "starts")
        e = self.init_tensor(np.asarray(ends, np.int64), "ends")
        a = self.init_tensor(np.asarray(axes, np.int64), "axes")
        return self.node("Slice", [x, s, e, a])

    def const_like_rowvec(self, ref2d, values):
        """Broadcast a constant (C,) row vector to ref2d's batch: ref*0 + const.

        ReduceMean keeps its axes ATTRIBUTE in opset 13 (ReduceSum does not).
        """
        zero = self.init_tensor(np.asarray([0.0], np.float32), "zero")
        z = self.mul(ref2d, zero)
        c = self.init_tensor(np.asarray(values, np.float32)[None, :], "rowconst")
        z1 = self.node("ReduceMean", [z], axes=[1], keepdims=1)
        return self.add(z1, c)


def _fold_bn(kernel_hwio, bn_scale, bn_bias, bn_mean, bn_var, depthwise=False):
    """Fold BatchNorm into the preceding conv. Returns (OIHW weight, bias)."""
    std = np.sqrt(bn_var + BN_EPS)
    factor = bn_scale / std  # (Cout,)
    w = np.transpose(kernel_hwio, (3, 2, 0, 1))  # HWIO -> OIHW
    w = w * factor[:, None, None, None]
    b = bn_bias - bn_mean * factor
    return w.astype(np.float32), b.astype(np.float32)


def _emit_mobilenet(g: GraphBuilder, x, params, stats, widen=1.0):
    """MobileNetV1 backbone (no blurpool) -> pooled feature vector node name."""

    def fold(conv_name, bn_name):
        k = np.asarray(params[conv_name]["kernel"])
        bn_p = params[bn_name]
        bn_s = stats[bn_name]
        return _fold_bn(
            k, np.asarray(bn_p["scale"]), np.asarray(bn_p["bias"]),
            np.asarray(bn_s["mean"]), np.asarray(bn_s["var"]),
        )

    w, b = fold("conv1", "bn1")
    x = g.conv(x, w, b, stride=2)
    x = g.relu(x)

    blocks = [
        ("dw2_1", 64, 1), ("dw2_2", 128, 2), ("dw3_1", 128, 1), ("dw3_2", 256, 2),
        ("dw4_1", 256, 1), ("dw4_2", 512, 2), ("dw5_1", 512, 1), ("dw5_2", 512, 1),
        ("dw5_3", 512, 1), ("dw5_4", 512, 1), ("dw5_5", 512, 1), ("dw5_6", 1024, 2),
        ("dw6", 1024, 1),
    ]
    channels = int(32 * widen)
    for name, planes, stride in blocks:
        planes = int(planes * widen)
        bp = params[name]
        bs = stats[name]
        wd, bd = _fold_bn(
            np.asarray(bp["conv_dw"]["kernel"]),
            np.asarray(bp["bn_dw"]["scale"]), np.asarray(bp["bn_dw"]["bias"]),
            np.asarray(bs["bn_dw"]["mean"]), np.asarray(bs["bn_dw"]["var"]),
        )
        residual = x
        h = g.conv(x, wd, bd, stride=stride, group=channels)
        h = g.relu(h)
        ws, bs_ = _fold_bn(
            np.asarray(bp["conv_sep"]["kernel"]),
            np.asarray(bp["bn_sep"]["scale"]), np.asarray(bp["bn_sep"]["bias"]),
            np.asarray(bs["bn_sep"]["mean"]), np.asarray(bs["bn_sep"]["var"]),
        )
        h = g.conv(h, ws, bs_, stride=1, group=1, pads=[0, 0, 0, 0])
        if stride == 1 and channels == planes:
            h = g.add(h, residual)
        x = g.relu(h)
        channels = planes

    pooled = g.node("GlobalAveragePool", [x])
    return g.node("Flatten", [pooled], axis=1)


def _emit_resnet18(g: GraphBuilder, x, params, stats):
    """ResNet-18 backbone (no blurpool) -> pooled 512-d feature node name.

    Mirrors `models/backbones/resnet.py` (torchvision resnet18 topology,
    1-channel 7x7 stem); BN folded into the convs.
    """

    def fold(scope_p, scope_s, conv_name, bn_name):
        return _fold_bn(
            np.asarray(scope_p[conv_name]["kernel"]),
            np.asarray(scope_p[bn_name]["scale"]), np.asarray(scope_p[bn_name]["bias"]),
            np.asarray(scope_s[bn_name]["mean"]), np.asarray(scope_s[bn_name]["var"]),
        )

    w, b = fold(params, stats, "conv1", "bn1")
    x = g.conv(x, w, b, stride=2, pads=[3, 3, 3, 3])
    x = g.relu(x)
    x = g.node("MaxPool", [x], kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1])

    for stage, num_blocks in enumerate([2, 2, 2, 2]):
        for blk in range(num_blocks):
            stride = 2 if (stage > 0 and blk == 0) else 1
            bp = params[f"layer{stage + 1}_{blk}"]
            bs = stats[f"layer{stage + 1}_{blk}"]
            identity = x
            w1, b1 = fold(bp, bs, "conv1", "bn1")
            h = g.relu(g.conv(x, w1, b1, stride=stride))
            w2, b2 = fold(bp, bs, "conv2", "bn2")
            h = g.conv(h, w2, b2, stride=1)
            if "downsample_conv" in bp:
                wd, bd = fold(bp, bs, "downsample_conv", "downsample_bn")
                identity = g.conv(x, wd, bd, stride=stride, pads=[0, 0, 0, 0])
            x = g.relu(g.add(h, identity))

    pooled = g.node("GlobalAveragePool", [x])
    return g.node("Flatten", [pooled], axis=1)


def _quat_mult_const_right(g: GraphBuilder, q, v_const):
    """Emit q' = mult(q, v_const): linear in q => single MatMul."""
    from neuralnet_tracker_traincode_tpu.ops import quaternion as Q
    import jax.numpy as jnp

    M = np.stack(
        [np.asarray(Q.mult(jnp.asarray(e, jnp.float32), jnp.asarray(v_const, jnp.float32)))
         for e in np.eye(4, dtype=np.float32)],
        axis=0,
    )  # row i = mult(e_i, v) => q' = q @ M
    m = g.init_tensor(M.astype(np.float32), "quat_offset_M")
    return g.node("MatMul", [q, m])


def _rotate_const_vector(g: GraphBuilder, q, t_const):
    """Emit rotate(q, t_const) (quadratic in q) via outer-product + Gemm."""
    from neuralnet_tracker_traincode_tpu.ops import quaternion as Q
    import jax.numpy as jnp

    def rot(qv):
        return np.asarray(Q.rotate(jnp.asarray(qv, jnp.float32), jnp.asarray(t_const, jnp.float32)))

    eye = np.eye(4, dtype=np.float32)
    C = np.zeros((16, 3), np.float32)
    for j in range(4):
        rj = rot(eye[j])
        C[j * 4 + j] = rj
        for k in range(j + 1, 4):
            cross = 0.5 * (rot(eye[j] + eye[k]) - rot(eye[j]) - rot(eye[k]))
            C[j * 4 + k] += cross
            C[k * 4 + j] += cross
    q_col = g.node("Unsqueeze", [q, g.init_tensor(np.asarray([2], np.int64), "ax2")])
    q_row = g.node("Unsqueeze", [q, g.init_tensor(np.asarray([1], np.int64), "ax1")])
    outer = g.mul(q_col, q_row)  # (N, 4, 4)
    flat = g.node("Reshape", [outer, g.init_tensor(np.asarray([-1, 16], np.int64), "shape16")])
    c = g.init_tensor(C, "rot_quadratic_C")
    return g.node("MatMul", [flat, c])  # (N, 3)


def _emit_triangular_scale(g: GraphBuilder, features, neck_params):
    """FeaturesAsTriangularScale(3) -> (N, 3, 3) lower-triangular output."""
    k = np.asarray(neck_params["lin"]["kernel"])
    b = np.asarray(neck_params["lin"]["bias"])
    z = g.gemm(features, k, b)  # (N, 7): [multiplier_raw, 6 values]
    mult = g.smoothclip0(g.slice_(z, [0], [1], [1]))
    diag = g.smoothclip0(g.slice_(z, [1], [4], [1]))
    off = g.slice_(z, [4], [7], [1])
    vals = g.concat([diag, off], axis=1)  # (N, 6)
    vals = g.mul(vals, mult)
    min_diag = g.init_tensor(
        np.asarray([[1e-6, 1e-6, 1e-6, 0.0, 0.0, 0.0]], np.float32), "min_diag"
    )
    vals = g.add(vals, min_diag)
    z0 = g.slice_(vals, [0], [1], [1])
    z1 = g.slice_(vals, [1], [2], [1])
    z2 = g.slice_(vals, [2], [3], [1])
    z3 = g.slice_(vals, [3], [4], [1])
    z4 = g.slice_(vals, [4], [5], [1])
    z5 = g.slice_(vals, [5], [6], [1])
    zero = g.mul(z0, g.init_tensor(np.asarray([0.0], np.float32), "zero"))
    flat = g.concat([z0, zero, zero, z3, z1, zero, z4, z5, z2], axis=1)  # (N, 9)
    return g.node(
        "Reshape", [flat, g.init_tensor(np.asarray([-1, 3, 3], np.int64), "shape33")]
    )


def build_posenet_onnx(
    model, variables, outputs: str = "opentrack", fp16: bool = False,
    quant_ranges: Optional[Sequence] = None,
) -> bytes:
    """Build the ONNX ModelProto bytes for a NetworkWithPointHead checkpoint.

    outputs='opentrack': pos_size, quat, box (+ *_scales with uncertainty).
    fp16=True stores all weights as FLOAT16 and runs the graph in half
    precision between boundary casts (fp32 input/outputs).
    quant_ranges: per-conv-index activation (min, max) from
    `calibrate_conv_ranges` -> QDQ int8 backbone (heads stay fp32).
    """
    assert not (fp16 and quant_ranges is not None), "pick one of fp16/quantize"
    assert model.config in ("mobilenetv1", "resnet18"), (
        f"ONNX export supports mobilenetv1/resnet18, got {model.config}"
    )
    assert not (model.backbone_args or {}).get("use_blurpool"), "blurpool export TODO"
    params = variables["params"]
    stats = variables["batch_stats"]
    res = model.input_resolution

    g = GraphBuilder(fp16=fp16)
    g.quant_ranges = quant_ranges
    # The graph is NCHW like the reference's exports; our NHWC flax weights
    # are transposed to OIHW at export time, so no runtime transposes appear.
    x = "x"
    if fp16:
        x = g.node("Cast", [x], to=P.FLOAT16)
    if model.config == "mobilenetv1":
        features = _emit_mobilenet(g, x, params["convnet"], stats["convnet"])
    else:
        features = _emit_resnet18(g, x, params["convnet"], stats["convnet"])

    # Heads.
    box_z = g.gemm(
        features, np.asarray(params["boxnet"]["linear"]["kernel"]),
        np.asarray(params["boxnet"]["linear"]["bias"]),
    )
    box_center = g.slice_(box_z, [0], [2], [1])
    box_size = g.smoothclip0(g.slice_(box_z, [2], [4], [1]))
    box = g.concat([g.sub(box_center, box_size), g.add(box_center, box_size)], axis=1)

    xy = g.gemm(
        features, np.asarray(params["posnet"]["linear_xy"]["kernel"]),
        np.asarray(params["posnet"]["linear_xy"]["bias"]),
    )
    size = g.smoothclip0(
        g.gemm(
            features, np.asarray(params["posnet"]["linear_size"]["kernel"]),
            np.asarray(params["posnet"]["linear_size"]["bias"]),
        )
    )
    coord = g.concat([xy, size], axis=1)

    quat_z = g.gemm(
        features, np.asarray(params["quatnet"]["linear"]["kernel"]),
        np.asarray(params["quatnet"]["linear"]["bias"]),
    )
    quat_ijk = g.slice_(quat_z, [0], [3], [1])
    quat_w = g.smoothclip0(g.slice_(quat_z, [3], [4], [1]))
    unnorm = g.concat([quat_ijk, quat_w], axis=1)
    norm = g.node("ReduceL2", [unnorm], axes=[1], keepdims=1)
    norm = g.node(
        "Clip",
        [norm, g.init_tensor(np.asarray(1e-6, np.float32), "minclip"), ""],
    )
    quat = g.node("Div", [unnorm, norm])

    if model.use_local_pose_offset:
        p = np.asarray(params["local_pose_offset"]["p"])[0]
        angle = p[1]
        offset_quat = np.asarray(
            [math.sin(0.5 * angle), 0.0, 0.0, math.cos(0.5 * angle)], np.float32
        )
        offset_transl = np.asarray([0.0, p[1], p[2]], np.float32)
        offset_scale = float(_np_smoothclip0(np.asarray(p[3])))
        pred_quat = _quat_mult_const_right(g, quat, offset_quat)
        scale = g.mul(size, g.init_tensor(np.asarray([offset_scale], np.float32), "oscale"))
        rotated = _rotate_const_vector(g, quat, offset_transl)  # (N, 3)
        pos_corr = g.mul(g.slice_(rotated, [0], [2], [1]), scale)
        screen = g.add(pos_corr, xy)
        coord = g.concat([screen, scale], axis=1)
        quat = pred_quat

    output_infos = [
        ("pos_size", coord, 3),
        ("quat", quat, 4),
        ("box", box, 4),
    ]
    if model.enable_uncertainty:
        coord_scales = _emit_triangular_scale(
            g, features, params["posnet"]["uncertainty_scales"]["neck"]
        )
        pose_scales = _emit_triangular_scale(
            g, features, params["quatnet"]["uncertainty_net"]["neck"]
        )
        hidden = np.asarray(params["boxnet"]["uncertainty_scales"]["hidden_scale"])
        roi_scales_const = (
            _np_smoothclip0(hidden[:1]) * _np_smoothclip0(hidden[1:]) + 1e-6
        )
        roi_scales = g.const_like_rowvec(box, roi_scales_const)
        output_infos += [
            ("pos_size_scales", coord_scales, (3, 3)),
            ("rotaxis_scales_tril", pose_scales, (3, 3)),
            ("box_scales", roi_scales, 4),
        ]

    out_protos = []
    for name, src, dims in output_infos:
        if fp16:
            src = g.node("Cast", [src], to=P.FLOAT)
        g.rename_output(src, name)
        shape = ["batch"] + (list(dims) if isinstance(dims, tuple) else [dims])
        out_protos.append(P.value_info_proto(name, P.FLOAT, shape))

    input_proto = P.value_info_proto("x", P.FLOAT, ["batch", 1, res, res])
    graph = P.graph_proto(
        "posenet", g.nodes, [input_proto], out_protos, g.initializers,
        doc_string="NetworkWithPointHead (TPU traincode export)",
    )
    return P.model_proto(graph, opset_version=13, model_version=4)


def build_localizer_onnx(model, variables) -> bytes:
    """LocalizerNet -> ONNX: outputs logit_box (N, 5) = [logit, x0, y0, x1, y1]."""
    params = variables["params"]
    stats = variables["batch_stats"]
    g = GraphBuilder()
    H, W = model.input_resolution
    x = "x"
    ps_p, ps_s = params["initial_bn"], stats["initial_bn"]
    w, b = _fold_bn(
        np.asarray(params["initial_conv"]["kernel"]),
        np.asarray(ps_p["scale"]), np.asarray(ps_p["bias"]),
        np.asarray(ps_s["mean"]), np.asarray(ps_s["var"]),
    )
    h = g.relu(g.conv(x, w, b, stride=2))
    ps_p, ps_s = params["dsconv_bn1"], stats["dsconv_bn1"]
    w, b = _fold_bn(
        np.asarray(params["dsconv_dw"]["kernel"]),
        np.asarray(ps_p["scale"]), np.asarray(ps_p["bias"]),
        np.asarray(ps_s["mean"]), np.asarray(ps_s["var"]),
    )
    h = g.relu(g.conv(h, w, b, stride=1, group=8))
    ps_p, ps_s = params["dsconv_bn2"], stats["dsconv_bn2"]
    w, b = _fold_bn(
        np.asarray(params["dsconv_pw"]["kernel"]),
        np.asarray(ps_p["scale"]), np.asarray(ps_p["bias"]),
        np.asarray(ps_s["mean"]), np.asarray(ps_s["var"]),
    )
    h = g.conv(h, w, b, stride=1, pads=[0, 0, 0, 0])

    ir_cfg = [
        (12, 3, 2, 2), (12, 3, 1, 2), (20, 3, 2, 4), (20, 3, 1, 4), (20, 3, 1, 4),
        (32, 5, 2, 2), (32, 5, 1, 2), (32, 3, 1, 2), (32, 3, 1, 2),
        (56, 3, 2, 2), (56, 3, 1, 2), (56, 3, 1, 2),
    ]
    in_ch = 8
    for i, (out_ch, ksz, stride, expf) in enumerate(ir_cfg):
        bp, bs = params[f"ir{i}"], stats[f"ir{i}"]
        mid = in_ch * expf
        w, b = _fold_bn(
            np.asarray(bp["expand"]["kernel"]), np.asarray(bp["bn1"]["scale"]),
            np.asarray(bp["bn1"]["bias"]), np.asarray(bs["bn1"]["mean"]), np.asarray(bs["bn1"]["var"]),
        )
        t = g.relu(g.conv(h, w, b, pads=[0, 0, 0, 0]))
        w, b = _fold_bn(
            np.asarray(bp["depthwise"]["kernel"]), np.asarray(bp["bn2"]["scale"]),
            np.asarray(bp["bn2"]["bias"]), np.asarray(bs["bn2"]["mean"]), np.asarray(bs["bn2"]["var"]),
        )
        t = g.relu(g.conv(t, w, b, stride=stride, group=mid))
        w, b = _fold_bn(
            np.asarray(bp["project"]["kernel"]), np.asarray(bp["bn3"]["scale"]),
            np.asarray(bp["bn3"]["bias"]), np.asarray(bs["bn3"]["mean"]), np.asarray(bs["bn3"]["var"]),
        )
        t = g.conv(t, w, b, pads=[0, 0, 0, 0])
        if stride == 1 and in_ch == out_ch:
            t = g.add(t, h)
        h = t
        in_ch = out_ch

    w = np.transpose(np.asarray(params["final_conv"]["kernel"]), (3, 2, 0, 1))
    h = g.conv(h, w, np.asarray(params["final_conv"]["bias"]), pads=[0, 0, 0, 0])

    logit = g.node("ReduceMean", [g.slice_(h, [0], [1], [1])], axes=[1, 2, 3], keepdims=0)
    logit = g.node("Unsqueeze", [logit, g.init_tensor(np.asarray([1], np.int64), "uax")])
    attn = g.slice_(h, [1], [2], [1])  # (N, 1, h, w)
    fh, fw = H // 32, W // 32  # initial s2 conv + four stride-2 IR stages
    flat = g.node("Reshape", [attn, g.init_tensor(np.asarray([-1, fh * fw], np.int64), "fshape")])
    sm = g.node("Softmax", [flat], axis=1)
    px = np.linspace(-1, 1, fw, dtype=np.float32)
    py = np.linspace(-1, 1, fh, dtype=np.float32)
    pos = np.stack(
        [np.broadcast_to(px[None, :], (fh, fw)), np.broadcast_to(py[:, None], (fh, fw))]
    ).reshape(2, -1)  # (2, hw)
    half_size = float(np.asarray(params["boxstddev_half_size"]))
    mean = g.node("MatMul", [sm, g.init_tensor((half_size * pos.T).astype(np.float32), "poscode")])
    # Reference CenterOfMassAndStd subtracts the half_size-SCALED mean from the
    # UNSCALED position code (`modelcomponents.py:128-133`):
    # var = sum attn p^2 - (2/hs) mean^2 + mean^2.
    sq = g.node("MatMul", [sm, g.init_tensor((pos.T**2).astype(np.float32), "possq")])
    msq = g.mul(mean, mean)
    var = g.add(sq, g.mul(msq, g.init_tensor(
        np.asarray([1.0 - 2.0 / half_size], np.float32), "mixcoef")))
    eps = g.init_tensor(np.asarray([1e-4], np.float32), "eps")
    std = g.node("Sqrt", [g.add(var, eps)])
    pred = g.concat([logit, g.sub(mean, std), g.add(mean, std)], axis=1)
    g.rename_output(pred, "logit_box")

    input_proto = P.value_info_proto("x", P.FLOAT, ["batch", 1, H, W])
    out_proto = P.value_info_proto("logit_box", P.FLOAT, ["batch", 5])
    graph = P.graph_proto("localizer", g.nodes, [input_proto], [out_proto], g.initializers)
    return P.model_proto(graph, opset_version=13, model_version=4)


def calibrate_conv_ranges(model_bytes: bytes, batches_nchw) -> List:
    """Collect (min, max) of every Conv input over calibration batches.

    Runs the fp32 graph with the bundled numpy executor; conv order matches
    a subsequent `build_posenet_onnx(..., quant_ranges=...)` build by
    construction (the reference instead attaches torch observers and runs 20
    train batches, export_model.py:108-110).
    """
    from neuralnet_tracker_traincode_tpu.export import onnx_run

    model = onnx_run.load_model(model_bytes)
    names = [n.inputs[0] for n in model.nodes if n.op_type == "Conv"]
    lo = {n: np.inf for n in names}
    hi = {n: -np.inf for n in names}
    for x in batches_nchw:
        out = onnx_run.run(model, {"x": np.asarray(x, np.float32)}, collect=names)
        for n in names:
            lo[n] = min(lo[n], float(out[n].min()))
            hi[n] = max(hi[n], float(out[n].max()))
    return [(lo[n], hi[n]) for n in names]
