"""Export our flax parameter trees as reference-format torch state dicts.

Inverse of `models/torch_interop.py`: checkpoints trained here become loadable
by the reference implementation (`trackertraincode/neuralnets/models.py` +
`io.py` self-describing format), so a reference user can adopt this framework
and still publish/consume checkpoints with their existing tooling. All
mappings are pure transposes:
 - flax Conv kernel HWIO -> torch Conv2d OIHW (depthwise (k,k,1,C) -> (C,1,k,k))
 - flax Dense kernel (in, out) -> torch Linear (out, in)
 - BatchNorm scale/bias + batch_stats mean/var -> weight/bias/running_*
 - flax MultiHeadDotProductAttention q/k/v/out -> packed in_proj + out_proj

Saving a loadable reference checkpoint additionally needs torch (CPU build is
in the image); the conversion itself is numpy-only.
"""

from typing import Any, Dict

import numpy as np


def _conv(kernel) -> np.ndarray:
    return np.transpose(np.asarray(kernel), (3, 2, 0, 1))  # HWIO -> OIHW


def _depthwise(kernel) -> np.ndarray:
    # flax (k, k, 1, C) -> torch (C, 1, k, k)
    return np.transpose(np.asarray(kernel), (3, 2, 0, 1))


def _dense(sd, prefix: str, p: Dict[str, Any]):
    sd[prefix + ".weight"] = np.transpose(np.asarray(p["kernel"]), (1, 0))
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _bn(sd, prefix: str, p: Dict[str, Any], s: Dict[str, Any]):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])
    sd[prefix + ".running_mean"] = np.asarray(s["mean"])
    sd[prefix + ".running_var"] = np.asarray(s["var"])
    sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _neck(sd, prefix: str, p: Dict[str, Any]):
    _dense(sd, prefix + ".lin", p["lin"])


def _layer_norm(sd, prefix: str, p: Dict[str, Any]):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _mha(sd, prefix: str, p: Dict[str, Any]):
    """flax q/k/v/out projections -> torch packed in_proj_{weight,bias} + out_proj."""
    def unproj(pr):
        k = np.asarray(pr["kernel"])  # (d, h, hd)
        d = k.shape[0]
        w = k.reshape(d, -1).T  # (d_out, d_in)
        b = np.asarray(pr["bias"]).reshape(-1)
        return w, b

    qw, qb = unproj(p["query"])
    kw, kb = unproj(p["key"])
    vw, vb = unproj(p["value"])
    sd[prefix + ".in_proj_weight"] = np.concatenate([qw, kw, vw], axis=0)
    sd[prefix + ".in_proj_bias"] = np.concatenate([qb, kb, vb], axis=0)
    ok = np.asarray(p["out"]["kernel"])  # (h, hd, d)
    d = ok.shape[-1]
    sd[prefix + ".out_proj.weight"] = ok.reshape(-1, d).T
    sd[prefix + ".out_proj.bias"] = np.asarray(p["out"]["bias"])


def _pascal3() -> np.ndarray:
    """get_pascal_kernel_2d(3, norm=True): the BlurPool2D `kernel` buffer."""
    k = np.asarray([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]], np.float32)
    return k / k.sum()


def _min_diag3() -> np.ndarray:
    """FeaturesAsTriangularScale `min_diag` buffer for dim 3
    (`negloglikelihood.py:232-236`)."""
    v = np.zeros((6,), np.float32)
    v[:3] = 1e-6
    return v


# ------------------------------------------------------------- backbones ---


def _mobilenet(sd, p, s, backbone_args):
    use_blurpool = bool((backbone_args or {}).get("use_blurpool"))
    sd["convnet.conv1.weight"] = _conv(p["conv1"]["kernel"])
    _bn(sd, "convnet.bn1", p["bn1"], s["bn1"])
    strides = {"dw2_2": 2, "dw3_2": 2, "dw4_2": 2, "dw5_6": 2}
    for name in "dw2_1 dw2_2 dw3_1 dw3_2 dw4_1 dw4_2 dw5_1 dw5_2 dw5_3 dw5_4 dw5_5 dw5_6 dw6".split():
        bp, bs = p[name], s[name]
        if use_blurpool and strides.get(name) == 2:
            sd[f"convnet.{name}.conv_dw.0.kernel"] = _pascal3()  # BlurPool buffer
            dw_key = f"convnet.{name}.conv_dw.1.weight"
        else:
            dw_key = f"convnet.{name}.conv_dw.weight"
        sd[dw_key] = _depthwise(bp["conv_dw"]["kernel"])
        _bn(sd, f"convnet.{name}.bn_dw", bp["bn_dw"], bs["bn_dw"])
        sd[f"convnet.{name}.conv_sep.weight"] = _conv(bp["conv_sep"]["kernel"])
        _bn(sd, f"convnet.{name}.bn_sep", bp["bn_sep"], bs["bn_sep"])


def _resnet18(sd, p, s, backbone_args):
    use_blurpool = bool((backbone_args or {}).get("use_blurpool"))
    sd["convnet.layers.0.weight"] = _conv(p["conv1"]["kernel"])
    _bn(sd, "convnet.layers.1", p["bn1"], s["bn1"])
    if use_blurpool:
        sd["convnet.layers.3.kernel"] = _pascal3()  # stem maxpool -> BlurPool
    for stage in range(4):
        for b in range(2):
            name = f"layer{stage + 1}_{b}"
            bp, bs = p[name], s[name]
            t = f"convnet.layers.{4 + stage}.{b}"
            if use_blurpool:
                sd[t + ".conv1.0.kernel"] = _pascal3()
                c1 = t + ".conv1.1.weight"
            else:
                c1 = t + ".conv1.weight"
            sd[c1] = _conv(bp["conv1"]["kernel"])
            _bn(sd, t + ".bn1", bp["bn1"], bs["bn1"])
            sd[t + ".conv2.weight"] = _conv(bp["conv2"]["kernel"])
            _bn(sd, t + ".bn2", bp["bn2"], bs["bn2"])
            if "downsample_conv" in bp:
                sd[t + ".downsample.0.weight"] = _conv(bp["downsample_conv"]["kernel"])
                _bn(sd, t + ".downsample.1", bp["downsample_bn"], bs["downsample_bn"])


def _efficientnet(kind):
    def export(sd, p, s, backbone_args):
        from neuralnet_tracker_traincode_tpu.models.backbones.efficientnet import scaled_settings

        settings, _ = scaled_settings(kind)
        sd["convnet.to_3chn_input.weight"] = _conv(p["to_3chn_input"]["kernel"])
        sd["convnet.to_3chn_input.bias"] = np.asarray(p["to_3chn_input"]["bias"])
        sd["convnet.layers.0.0.weight"] = _conv(p["stem_conv"]["kernel"])
        _bn(sd, "convnet.layers.0.1", p["stem_bn"], s["stem_bn"])
        for stage_idx, cfg in enumerate(settings):
            for j in range(cfg.num_layers):
                bp, bs = p[f"stage{stage_idx + 1}_{j}"], s[f"stage{stage_idx + 1}_{j}"]
                t = f"convnet.layers.{stage_idx + 1}.{j}.block"
                k = 0
                if cfg.expand_ratio != 1:
                    sd[f"{t}.0.0.weight"] = _conv(bp["expand_conv"]["kernel"])
                    _bn(sd, f"{t}.0.1", bp["expand_bn"], bs["expand_bn"])
                    k = 1
                sd[f"{t}.{k}.0.weight"] = _depthwise(bp["dw_conv"]["kernel"])
                _bn(sd, f"{t}.{k}.1", bp["dw_bn"], bs["dw_bn"])
                for fc in ("fc1", "fc2"):
                    sd[f"{t}.{k + 1}.{fc}.weight"] = _conv(bp["se"][fc]["kernel"])
                    sd[f"{t}.{k + 1}.{fc}.bias"] = np.asarray(bp["se"][fc]["bias"])
                sd[f"{t}.{k + 2}.0.weight"] = _conv(bp["project_conv"]["kernel"])
                _bn(sd, f"{t}.{k + 2}.1", bp["project_bn"], bs["project_bn"])
        sd["convnet.layers.8.0.weight"] = _conv(p["head_conv"]["kernel"])
        _bn(sd, "convnet.layers.8.1", p["head_bn"], s["head_bn"])

    return export


def _hybrid_vit(sd, p, s, backbone_args):
    sd["convnet.convnet.0.weight"] = _conv(p["stem"]["kernel"])
    for stage in range(4):
        for b in range(2):
            name = f"layer{stage + 1}_{b}"
            bp, bs = p[name], s[name]
            t = f"convnet.convnet.{stage + 1}.{b}"
            sd[t + ".conv1.weight"] = _conv(bp["conv1"]["kernel"])
            _bn(sd, t + ".bn1", bp["bn1"], bs["bn1"])
            sd[t + ".conv2.weight"] = _conv(bp["conv2"]["kernel"])
            _bn(sd, t + ".bn2", bp["bn2"], bs["bn2"])
            if "downsample_conv" in bp:
                sd[t + ".downsample.0.weight"] = _conv(bp["downsample_conv"]["kernel"])
                _bn(sd, t + ".downsample.1", bp["downsample_bn"], bs["downsample_bn"])
    sd["convnet.proj.0.weight"] = _conv(p["proj_conv"]["kernel"])
    _bn(sd, "convnet.proj.1", p["proj_bn"], s["proj_bn"])
    sd["convnet.position"] = np.transpose(np.asarray(p["position"]), (0, 3, 1, 2))
    sd["convnet.queries"] = np.asarray(p["queries"])
    sd["convnet.cls_token"] = np.asarray(p["cls_token"])
    enc = "convnet.transformer.encoder.layers.0"
    e = p["transformer_encoder"]
    _mha(sd, enc + ".self_attn", e["self_attn"])
    _dense(sd, enc + ".linear1", e["linear1"])
    _dense(sd, enc + ".linear2", e["linear2"])
    _layer_norm(sd, enc + ".norm1", e["norm1"])
    _layer_norm(sd, enc + ".norm2", e["norm2"])
    _layer_norm(sd, "convnet.transformer.encoder.norm", p["transformer_encoder_norm"])
    dec = "convnet.transformer.decoder.layers.0"
    d = p["transformer_decoder"]
    _mha(sd, dec + ".self_attn", d["self_attn"])
    _mha(sd, dec + ".multihead_attn", d["cross_attn"])
    _dense(sd, dec + ".linear1", d["linear1"])
    _dense(sd, dec + ".linear2", d["linear2"])
    _layer_norm(sd, dec + ".norm1", d["norm1"])
    _layer_norm(sd, dec + ".norm2", d["norm2"])
    _layer_norm(sd, dec + ".norm3", d["norm3"])
    _layer_norm(sd, "convnet.transformer.decoder.norm", p["transformer_decoder_norm"])


_BACKBONE_EXPORTERS = {
    "mobilenetv1": _mobilenet,
    "resnet18": _resnet18,
    "hybrid_vit": _hybrid_vit,
}
for _kind in ("b0", "b1", "b2", "b3", "b4"):
    _BACKBONE_EXPORTERS["efficientnet_" + _kind] = _efficientnet(_kind)


def export_posenet_state_dict(variables: Dict[str, Any], config: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax variables -> reference NetworkWithPointHead state dict (numpy)."""
    backbone = config.get("config", "mobilenetv1")
    if backbone not in _BACKBONE_EXPORTERS:
        raise NotImplementedError(f"no torch export for backbone {backbone!r}")
    p = variables["params"]
    s = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    _BACKBONE_EXPORTERS[backbone](sd, p["convnet"], s.get("convnet", {}), config.get("backbone_args"))

    uncertainty = bool(config.get("enable_uncertainty", False))
    _dense(sd, "boxnet.linear", p["boxnet"]["linear"])
    if uncertainty:
        sd["boxnet.scales.hidden_scale"] = np.asarray(
            p["boxnet"]["uncertainty_scales"]["hidden_scale"]
        )
    _dense(sd, "posnet.linear_xy", p["posnet"]["linear_xy"])
    _dense(sd, "posnet.linear_size", p["posnet"]["linear_size"])
    if uncertainty:
        _neck(sd, "posnet.scales.neck", p["posnet"]["uncertainty_scales"]["neck"])
        sd["posnet.scales.min_diag"] = _min_diag3()
    _dense(sd, "quatnet.linear", p["quatnet"]["linear"])
    if uncertainty:
        _neck(sd, "quatnet.uncertainty_net.neck", p["quatnet"]["uncertainty_net"]["neck"])
        sd["quatnet.uncertainty_net.min_diag"] = _min_diag3()
    if config.get("use_local_pose_offset", True):
        sd["local_pose_offset.p"] = np.asarray(p["local_pose_offset"]["p"])
        if config.get("enable_point_head", True):
            sd["local_pose_offset_kpts.p"] = np.asarray(p["local_pose_offset_kpts"]["p"])
    if config.get("enable_point_head", True):
        _dense(sd, "landmarks.shapenet", p["landmarks"]["shapenet"])
        # DeformableHeadKeypoints buffers: the 68-keypoint BFM tables
        # (`modelcomponents.py:59-68`). Constant data, same derived subset the
        # rest of this framework uses.
        from neuralnet_tracker_traincode_tpu.facemodel.bfm import BFMModel

        bfm = BFMModel()
        sd["landmarks.deformablekeypoints.keypts"] = np.asarray(bfm.keypts, np.float32)
        sd["landmarks.deformablekeypoints.keyeigvecs"] = np.asarray(
            bfm.scaled_bases[:50], np.float32
        )
        if uncertainty:
            sd["landmarks.point_distrib_scales.hidden_scale"] = np.asarray(
                p["landmarks"]["uncertainty_points"]["hidden_scale"]
            )
            sd["landmarks.shape_distrib_scales.hidden_scale"] = np.asarray(
                p["landmarks"]["uncertainty_shape"]["hidden_scale"]
            )
    if config.get("enable_face_detector", False):
        _dense(sd, "face_detector", p["face_detector"])
    return sd


def save_reference_checkpoint(filename: str, model, variables: Dict[str, Any]):
    """Write a reference-format torch checkpoint ({state_dict, class_name,
    config}; `trackertraincode/neuralnets/io.py:19-27`) from our model."""
    import torch

    config = model.get_config()
    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in export_posenet_state_dict(variables, config).items()
    }
    torch.save(
        {"state_dict": sd, "class_name": "NetworkWithPointHead", "config": config},
        filename,
    )
