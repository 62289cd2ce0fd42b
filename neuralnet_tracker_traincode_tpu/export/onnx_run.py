"""Decode + execute the ONNX models emitted by onnx_export (numpy reference).

Serves two purposes:
 1. Semantic verification of the self-contained exporter: tests run the
    exported graph with this executor and compare against the flax forward
    (the reference uses onnxruntime for its parity check,
    `export_model.py:274-279`; onnxruntime is not in this image).
 2. Fallback runtime for `.onnx` evaluation when onnxruntime is unavailable.

Only the ops the exporter emits are implemented.
"""

import struct
from typing import Any, Dict, List, NamedTuple, Optional

import numpy as np

from neuralnet_tracker_traincode_tpu.export import onnx_proto as P

_ONNX_TO_NP = {
    P.FLOAT: np.float32,
    P.UINT8: np.uint8,
    P.INT8: np.int8,
    P.INT32: np.int32,
    P.INT64: np.int64,
    P.BOOL: np.bool_,
    P.FLOAT16: np.float16,
}


class Node(NamedTuple):
    op_type: str
    inputs: List[str]
    outputs: List[str]
    attrs: Dict[str, Any]


class OnnxModel(NamedTuple):
    nodes: List[Node]
    initializers: Dict[str, np.ndarray]
    input_names: List[str]
    output_names: List[str]
    model_version: int
    input_dims: Dict[str, List[Optional[int]]]  # symbolic dims -> None


def _parse_tensor(data: bytes) -> (str, np.ndarray):
    dims, dtype, name, raw = [], P.FLOAT, "", b""
    for field, wt, v in P.decode_raw(data):
        if field == 1:
            if wt == 0:
                dims.append(v)
            else:  # packed
                i = 0
                while i < len(v):
                    val, i = P._read_varint(v, i)
                    dims.append(val)
        elif field == 2:
            dtype = v
        elif field == 8:
            name = v.decode()
        elif field == 9:
            raw = v
    arr = np.frombuffer(raw, dtype=_ONNX_TO_NP[dtype]).reshape(dims)
    return name, arr


def _parse_attr(data: bytes):
    name, value = "", None
    ints, floats = [], []
    for field, wt, v in P.decode_raw(data):
        if field == 1:
            name = v.decode()
        elif field == 2:
            value = struct.unpack("<f", struct.pack("<I", v))[0]
        elif field == 3:
            value = v if v < (1 << 63) else v - (1 << 64)
        elif field == 4:
            value = v.decode()
        elif field == 5:
            value = _parse_tensor(v)[1]
        elif field == 7:
            floats.append(struct.unpack("<f", struct.pack("<I", v))[0])
        elif field == 8:
            ints.append(v if v < (1 << 63) else v - (1 << 64))
    if ints:
        value = ints
    elif floats:
        value = floats
    return name, value


def _parse_node(data: bytes) -> Node:
    inputs, outputs, op_type, attrs = [], [], "", {}
    for field, wt, v in P.decode_raw(data):
        if field == 1:
            inputs.append(v.decode())
        elif field == 2:
            outputs.append(v.decode())
        elif field == 4:
            op_type = v.decode()
        elif field == 5:
            k, val = _parse_attr(v)
            attrs[k] = val
    return Node(op_type, inputs, outputs, attrs)


def _parse_value_info(data: bytes):
    """ValueInfoProto -> (name, dims); symbolic/absent dims parse as None."""
    name, dims = "", []
    for field, wt, v in P.decode_raw(data):
        if field == 1:
            name = v.decode()
        elif field == 2:  # TypeProto
            for f2, _, v2 in P.decode_raw(v):
                if f2 != 1:  # tensor_type
                    continue
                for f3, _, v3 in P.decode_raw(v2):
                    if f3 != 2:  # shape
                        continue
                    for f4, _, v4 in P.decode_raw(v3):
                        if f4 != 1:  # dim
                            continue
                        dim = None
                        for f5, _, v5 in P.decode_raw(v4):
                            if f5 == 1:  # dim_value
                                dim = int(v5)
                        dims.append(dim)
    return name, dims


def load_model(model_bytes: bytes) -> OnnxModel:
    graph = None
    model_version = 0
    for field, wt, v in P.decode_raw(model_bytes):
        if field == 7:
            graph = v
        elif field == 5:
            model_version = v
    assert graph is not None, "no graph in model"
    nodes, initializers, inputs, outputs, input_dims = [], {}, [], [], {}
    for field, wt, v in P.decode_raw(graph):
        if field == 1:
            nodes.append(_parse_node(v))
        elif field == 5:
            name, arr = _parse_tensor(v)
            initializers[name] = arr
        elif field == 11:
            name, dims = _parse_value_info(v)
            inputs.append(name)
            input_dims[name] = dims
        elif field == 12:
            outputs.append(_parse_value_info(v)[0])
    return OnnxModel(nodes, initializers, inputs, outputs, model_version, input_dims)


def _conv(x, w, b, strides, pads, group):
    N, C, H, W = x.shape
    O, I, KH, KW = w.shape
    ph0, pw0, ph1, pw1 = pads
    xp = np.pad(x, ((0, 0), (0, 0), (ph0, ph1), (pw0, pw1)))
    sh, sw = strides
    OH = (xp.shape[2] - KH) // sh + 1
    OW = (xp.shape[3] - KW) // sw + 1
    cin_per_group = C // group
    cout_per_group = O // group
    # im2col per group
    out = np.empty((N, O, OH, OW), np.float32)
    for gidx in range(group):
        xs = xp[:, gidx * cin_per_group : (gidx + 1) * cin_per_group]
        cols = np.empty((N, cin_per_group * KH * KW, OH * OW), np.float32)
        idx = 0
        for ky in range(KH):
            for kx in range(KW):
                patch = xs[:, :, ky : ky + OH * sh : sh, kx : kx + OW * sw : sw]
                cols[:, idx * cin_per_group : (idx + 1) * cin_per_group] = patch.reshape(
                    N, cin_per_group, -1
                )
                idx += 1
        wg = w[gidx * cout_per_group : (gidx + 1) * cout_per_group]
        # reorder weight to match cols layout (ky, kx, cin)
        wg2 = wg.transpose(0, 2, 3, 1).reshape(cout_per_group, -1)
        res = wg2 @ cols  # (N,) broadcast: cols (N, K, P)
        out[:, gidx * cout_per_group : (gidx + 1) * cout_per_group] = res.reshape(
            N, cout_per_group, OH, OW
        )
    if b is not None:
        out += b[None, :, None, None]
    return out


def run(
    model: OnnxModel,
    feeds: Dict[str, np.ndarray],
    collect: Optional[List[str]] = None,
) -> Dict[str, np.ndarray]:
    """Execute the graph. With `collect`, also return those intermediate
    tensors (used for PTQ calibration range collection)."""
    env: Dict[str, np.ndarray] = dict(model.initializers)
    env.update({k: np.asarray(v) for k, v in feeds.items()})
    for node in model.nodes:
        i = [env[n] if n else None for n in node.inputs]
        a = node.attrs
        op = node.op_type
        if op == "Conv":
            y = _conv(
                i[0].astype(np.float32), i[1], i[2] if len(i) > 2 else None,
                a.get("strides", [1, 1]), a.get("pads", [0, 0, 0, 0]), a.get("group", 1),
            )
        elif op == "Relu":
            y = np.maximum(i[0], 0)
        elif op == "Elu":
            alpha = a.get("alpha", 1.0)
            y = np.where(i[0] > 0, i[0], alpha * (np.exp(np.minimum(i[0], 0.0)) - 1))
        elif op == "Add":
            y = i[0] + i[1]
        elif op == "Sub":
            y = i[0] - i[1]
        elif op == "Mul":
            y = i[0] * i[1]
        elif op == "Div":
            y = i[0] / i[1]
        elif op == "Sqrt":
            y = np.sqrt(i[0])
        elif op == "Sigmoid":
            y = 1.0 / (1.0 + np.exp(-i[0]))
        elif op == "Abs":
            y = np.abs(i[0])
        elif op == "Sign":
            y = np.sign(i[0])
        elif op == "Greater":
            y = i[0] > i[1]
        elif op == "Equal":
            y = i[0] == i[1]
        elif op == "Where":
            y = np.where(i[0], i[1], i[2])
        elif op == "ReduceMax":
            y = i[0].max(axis=tuple(a["axes"]), keepdims=bool(a.get("keepdims", 1)))
        elif op == "ArgMax":
            y = np.argmax(i[0], axis=a.get("axis", 0)).astype(np.int64)
            if a.get("keepdims", 1):
                y = np.expand_dims(y, a.get("axis", 0))
        elif op == "Gemm":
            w = i[1].T if a.get("transB", 0) else i[1]
            y = i[0] @ w + (i[2] if len(i) > 2 else 0)
        elif op == "MatMul":
            y = i[0] @ i[1]
        elif op == "Concat":
            y = np.concatenate(i, axis=a["axis"])
        elif op == "Slice":
            starts, ends, axes = i[1], i[2], i[3]
            sl = [slice(None)] * i[0].ndim
            for s_, e_, ax in zip(starts, ends, axes):
                sl[int(ax)] = slice(int(s_), int(e_))
            y = i[0][tuple(sl)]
        elif op == "Reshape":
            shape = [int(d) for d in i[1]]
            shape = [i[0].shape[k] if d == 0 else d for k, d in enumerate(shape)]
            y = i[0].reshape(shape)
        elif op == "Unsqueeze":
            y = np.expand_dims(i[0], tuple(int(d) for d in i[1]))
        elif op == "Flatten":
            y = i[0].reshape(i[0].shape[0], -1)
        elif op == "GlobalAveragePool":
            y = i[0].mean(axis=(2, 3), keepdims=True)
        elif op == "ReduceMean":
            y = i[0].mean(axis=tuple(a["axes"]), keepdims=bool(a.get("keepdims", 1)))
        elif op == "ReduceL2":
            y = np.sqrt(
                np.square(i[0]).sum(axis=tuple(a["axes"]), keepdims=bool(a.get("keepdims", 1)))
            )
        elif op == "Clip":
            lo = i[1] if len(i) > 1 and i[1] is not None else -np.inf
            hi = i[2] if len(i) > 2 and i[2] is not None else np.inf
            y = np.clip(i[0], lo, hi)
        elif op == "Softmax":
            ax = a.get("axis", -1)
            e = np.exp(i[0] - i[0].max(axis=ax, keepdims=True))
            y = e / e.sum(axis=ax, keepdims=True)
        elif op == "Identity":
            y = i[0]
        elif op == "Transpose":
            y = np.transpose(i[0], a["perm"])
        elif op == "Cast":
            y = i[0].astype(_ONNX_TO_NP[a["to"]])
        elif op == "QuantizeLinear":
            scale, zp = i[1], i[2]
            info = np.iinfo(zp.dtype)
            y = np.clip(np.rint(i[0] / scale) + zp, info.min, info.max).astype(zp.dtype)
        elif op == "DequantizeLinear":
            scale, zp = i[1], i[2]
            if scale.ndim == 1 and scale.size > 1:  # per-channel
                ax = a.get("axis", 1)
                shape = [1] * i[0].ndim
                shape[ax] = scale.size
                scale = scale.reshape(shape)
                zp = zp.reshape(shape)
            y = (i[0].astype(np.float32) - zp.astype(np.float32)) * scale
        elif op == "MaxPool":
            kh, kw = a["kernel_shape"]
            sh, sw = a.get("strides", [1, 1])
            pt, pl, pb, pr = a.get("pads", [0, 0, 0, 0])
            xp = np.pad(
                i[0], ((0, 0), (0, 0), (pt, pb), (pl, pr)),
                constant_values=-np.inf,
            )
            N, C, H, W = xp.shape
            oh = (H - kh) // sh + 1
            ow = (W - kw) // sw + 1
            y = np.full((N, C, oh, ow), -np.inf, xp.dtype)
            for dy in range(kh):
                for dx in range(kw):
                    y = np.maximum(y, xp[:, :, dy:dy + oh * sh:sh, dx:dx + ow * sw:sw])
        else:
            raise NotImplementedError(f"op {op}")
        env[node.outputs[0]] = np.asarray(y, np.float32) if y.dtype == np.float64 else y
    out = {name: env[name] for name in model.output_names}
    if collect is not None:
        out.update({name: env[name] for name in collect})
    return out


class NumpyOnnxSession:
    """onnxruntime-like facade over the numpy executor."""

    def __init__(self, path_or_bytes):
        if isinstance(path_or_bytes, (str,)):
            with open(path_or_bytes, "rb") as f:
                path_or_bytes = f.read()
        self.model = load_model(path_or_bytes)

    @property
    def output_names(self):
        return self.model.output_names

    @property
    def model_version(self):
        return self.model.model_version

    @property
    def input_dims(self):
        return self.model.input_dims

    def run(self, output_names, feeds):
        out = run(self.model, feeds)
        names = output_names or self.model.output_names
        return [out[n] for n in names]


def _jax_exec(model: OnnxModel, inits, feeds):
    """Trace the decoded graph with jnp/lax (called under jax.jit).

    All contractions run at float32 precision: ONNX semantics are exact f32
    (onnxruntime), and the TPU's default bf16 matmul precision is enough to
    flip threshold branches baked into exported graphs — measured: the 6d
    rotation head's orthonormality fallback (|M M^T - I| > 1e-3) triggered on
    bf16 noise and silently replaced trained rotations with identity.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    env = dict(inits)
    env.update(feeds)
    for node in model.nodes:
        i = [env[n] if n else None for n in node.inputs]
        a = node.attrs
        op = node.op_type
        if op == "Conv":
            y = lax.conv_general_dilated(
                i[0].astype(jnp.float32), i[1].astype(jnp.float32),
                window_strides=a.get("strides", [1, 1]),
                padding=[(p0, p1) for p0, p1 in zip(
                    a.get("pads", [0, 0, 0, 0])[:2], a.get("pads", [0, 0, 0, 0])[2:]
                )],
                feature_group_count=a.get("group", 1),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
            if len(i) > 2 and i[2] is not None:
                y = y + i[2].astype(jnp.float32)[None, :, None, None]
        elif op == "Relu":
            y = jnp.maximum(i[0], 0)
        elif op == "Elu":
            alpha = a.get("alpha", 1.0)
            y = jnp.where(i[0] > 0, i[0], alpha * (jnp.exp(jnp.minimum(i[0], 0.0)) - 1))
        elif op == "Add":
            y = i[0] + i[1]
        elif op == "Sub":
            y = i[0] - i[1]
        elif op == "Mul":
            y = i[0] * i[1]
        elif op == "Div":
            y = i[0] / i[1]
        elif op == "Sqrt":
            y = jnp.sqrt(i[0])
        elif op == "Sigmoid":
            y = jax.nn.sigmoid(i[0])
        elif op == "Abs":
            y = jnp.abs(i[0])
        elif op == "Sign":
            y = jnp.sign(i[0])
        elif op == "Greater":
            y = i[0] > i[1]
        elif op == "Equal":
            y = i[0] == i[1]
        elif op == "Where":
            y = jnp.where(i[0], i[1], i[2])
        elif op == "ReduceMax":
            y = i[0].max(axis=tuple(a["axes"]), keepdims=bool(a.get("keepdims", 1)))
        elif op == "ArgMax":
            y = jnp.argmax(i[0], axis=a.get("axis", 0)).astype(jnp.int64)
            if a.get("keepdims", 1):
                y = jnp.expand_dims(y, a.get("axis", 0))
        elif op == "Gemm":
            w = i[1].T if a.get("transB", 0) else i[1]
            y = i[0] @ w + (i[2] if len(i) > 2 else 0)
        elif op == "MatMul":
            y = i[0] @ i[1]
        elif op == "Concat":
            y = jnp.concatenate(i, axis=a["axis"])
        elif op == "Slice":
            starts, ends, axes = (np.asarray(x) for x in (i[1], i[2], i[3]))
            sl = [slice(None)] * i[0].ndim
            for s_, e_, ax in zip(starts, ends, axes):
                sl[int(ax)] = slice(int(s_), int(e_))
            y = i[0][tuple(sl)]
        elif op == "Reshape":
            shape = [int(d) for d in np.asarray(i[1])]
            shape = [i[0].shape[k] if d == 0 else d for k, d in enumerate(shape)]
            y = i[0].reshape(shape)
        elif op == "Unsqueeze":
            y = jnp.expand_dims(i[0], tuple(int(d) for d in np.asarray(i[1])))
        elif op == "Flatten":
            y = i[0].reshape(i[0].shape[0], -1)
        elif op == "GlobalAveragePool":
            y = i[0].mean(axis=(2, 3), keepdims=True)
        elif op == "ReduceMean":
            y = i[0].mean(axis=tuple(a["axes"]), keepdims=bool(a.get("keepdims", 1)))
        elif op == "ReduceL2":
            y = jnp.sqrt(
                jnp.square(i[0]).sum(axis=tuple(a["axes"]), keepdims=bool(a.get("keepdims", 1)))
            )
        elif op == "Clip":
            lo = i[1] if len(i) > 1 and i[1] is not None else -jnp.inf
            hi = i[2] if len(i) > 2 and i[2] is not None else jnp.inf
            y = jnp.clip(i[0], lo, hi)
        elif op == "Softmax":
            y = jax.nn.softmax(i[0], axis=a.get("axis", -1))
        elif op == "Identity":
            y = i[0]
        elif op == "Transpose":
            y = jnp.transpose(i[0], a["perm"])
        elif op == "Cast":
            y = i[0].astype(_ONNX_TO_NP[a["to"]])
        elif op == "QuantizeLinear":
            scale, zp = i[1], i[2]
            info = np.iinfo(zp.dtype)
            y = jnp.clip(jnp.round(i[0] / scale) + zp, info.min, info.max).astype(zp.dtype)
        elif op == "DequantizeLinear":
            scale, zp = jnp.asarray(i[1]), jnp.asarray(i[2])
            if scale.ndim == 1 and scale.size > 1:
                ax = a.get("axis", 1)
                shape = [1] * i[0].ndim
                shape[ax] = scale.size
                scale = scale.reshape(shape)
                zp = zp.reshape(shape)
            y = (i[0].astype(jnp.float32) - zp.astype(jnp.float32)) * scale
        elif op == "MaxPool":
            kh, kw = a["kernel_shape"]
            sh, sw = a.get("strides", [1, 1])
            pt, pl, pb, pr = a.get("pads", [0, 0, 0, 0])
            y = lax.reduce_window(
                i[0], -jnp.inf, lax.max, (1, 1, kh, kw), (1, 1, sh, sw),
                ((0, 0), (0, 0), (pt, pb), (pl, pr)),
            )
        else:
            raise NotImplementedError(f"op {op} (jax backend)")
        env[node.outputs[0]] = y
    return {name: env[name] for name in model.output_names}


class JaxOnnxSession:
    """Execute a decoded ONNX graph on the JAX default device (jit per shape).

    Same facade as NumpyOnnxSession; used by the evaluation path so `.onnx`
    models run on the TPU instead of the single-core-host numpy executor
    (which remains the backend-independent verification reference).
    Slice/Reshape index tensors stay host-side constants; no gather-prone
    constants reach the compiled program.
    """

    def __init__(self, path_or_bytes):
        import jax

        if isinstance(path_or_bytes, (str,)):
            with open(path_or_bytes, "rb") as f:
                path_or_bytes = f.read()
        self.model = load_model(path_or_bytes)
        # Index tensors (int64 slice/shape operands) must stay host-side;
        # everything else ships to the device as arguments.
        self._host_inits = {
            k: v for k, v in self.model.initializers.items() if v.dtype == np.int64
        }
        self._dev_inits = {
            k: v for k, v in self.model.initializers.items() if v.dtype != np.int64
        }

        def fn(dev_inits, feeds):
            with jax.default_matmul_precision("float32"):
                return _jax_exec(self.model, {**self._host_inits, **dev_inits}, feeds)

        self._fn = jax.jit(fn)

    @property
    def output_names(self):
        return self.model.output_names

    @property
    def model_version(self):
        return self.model.model_version

    @property
    def input_dims(self):
        return self.model.input_dims

    def run(self, output_names, feeds):
        out = self._fn(self._dev_inits, {k: np.asarray(v) for k, v in feeds.items()})
        names = output_names or self.model.output_names
        return [np.asarray(out[n]) for n in names]
