"""Import reference PyTorch checkpoints into this framework's parameter trees.

The reference publishes trained checkpoints in its self-describing format
({state_dict, class_name, config}; `trackertraincode/neuralnets/io.py`). This
converter maps those state dicts onto our flax variables so published models
can be evaluated / exported here for bit-parity work. Conventions:
 - torch Conv2d weight OIHW -> flax HWIO
 - torch Linear weight (out, in) -> flax Dense kernel (in, out)
 - BatchNorm weight/bias -> scale/bias params; running_mean/var -> batch_stats
Requires torch (CPU build is part of the baked image) only when called.
"""

from typing import Any, Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _dense(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _bn(prefix: str, sd, params: Dict, stats: Dict, name: str):
    params[name] = {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }
    stats[name] = {
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }


def _depthwise(w) -> np.ndarray:
    # torch (C, 1, k, k) -> flax (k, k, 1, C)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _convbn_block(sd, prefix: str, params: Dict, stats: Dict):
    """MobileNet DepthWiseBlock: conv_dw/bn_dw/conv_sep/bn_sep.

    With `use_blurpool`, stride-2 blocks wrap the depthwise conv in
    Sequential(BlurPool2D, Conv2d) so its torch key becomes `conv_dw.1.weight`
    (`trackertraincode/backbones/mobilenet_v1.py:43-54`); BlurPool itself has
    only a fixed-kernel buffer, which our flax module computes inline.
    """
    p, s = {}, {}
    dw_key = prefix + ".conv_dw.weight"
    if dw_key not in sd:
        dw_key = prefix + ".conv_dw.1.weight"
    p["conv_dw"] = {"kernel": _depthwise(sd[dw_key])}
    _bn(prefix + ".bn_dw", sd, p, s, "bn_dw")
    p["conv_sep"] = {"kernel": _conv(sd[prefix + ".conv_sep.weight"])}
    _bn(prefix + ".bn_sep", sd, p, s, "bn_sep")
    name = prefix.split(".")[-1]
    params[name] = p
    stats[name] = s


def _mobilenet(sd, params: Dict, stats: Dict):
    p, s = {}, {}
    p["conv1"] = {"kernel": _conv(sd["convnet.conv1.weight"])}
    _bn("convnet.bn1", sd, p, s, "bn1")
    for name in (
        "dw2_1 dw2_2 dw3_1 dw3_2 dw4_1 dw4_2 dw5_1 dw5_2 dw5_3 dw5_4 dw5_5 dw5_6 dw6".split()
    ):
        _convbn_block(sd, f"convnet.{name}", p, s)
    params["convnet"] = p
    stats["convnet"] = s


def _resnet18(sd, params: Dict, stats: Dict):
    """Reference ResNetBackbone (`trackertraincode/backbones/resnet.py:52-104`).

    The torch module is Sequential(conv1, bn1, relu, maxpool|BlurPool,
    layer1..4, avgpool, Flatten) so keys are index-based: layers.0 = stem conv,
    layers.1 = stem bn, layers.4..7 = the four stages. With blurpool, each
    stage block's conv1 becomes Sequential(BlurPool2D, conv3x3) -> `conv1.1`.
    """
    p, s = {}, {}
    p["conv1"] = {"kernel": _conv(sd["convnet.layers.0.weight"])}
    _bn("convnet.layers.1", sd, p, s, "bn1")
    n_blocks = [2, 2, 2, 2]
    for stage in range(4):
        for b in range(n_blocks[stage]):
            tprefix = f"convnet.layers.{4 + stage}.{b}"
            bp, bs = _basic_block(sd, tprefix)
            name = f"layer{stage + 1}_{b}"
            p[name] = bp
            s[name] = bs
    params["convnet"] = p
    stats["convnet"] = s


def _basic_block(sd, tprefix: str) -> Tuple[Dict, Dict]:
    """torchvision BasicBlock (conv1/bn1/conv2/bn2[/downsample]) -> flax."""
    bp, bs = {}, {}
    c1_key = tprefix + ".conv1.weight"
    if c1_key not in sd:
        c1_key = tprefix + ".conv1.1.weight"  # blurpool variant
    bp["conv1"] = {"kernel": _conv(sd[c1_key])}
    _bn(tprefix + ".bn1", sd, bp, bs, "bn1")
    bp["conv2"] = {"kernel": _conv(sd[tprefix + ".conv2.weight"])}
    _bn(tprefix + ".bn2", sd, bp, bs, "bn2")
    if tprefix + ".downsample.0.weight" in sd:
        bp["downsample_conv"] = {"kernel": _conv(sd[tprefix + ".downsample.0.weight"])}
        _bn(tprefix + ".downsample.1", sd, bp, bs, "downsample_bn")
    return bp, bs


def _efficientnet(kind: str, sd, params: Dict, stats: Dict):
    """Reference EfficientNetBackbone (`trackertraincode/backbones/
    efficientnet.py:14-77`): torchvision efficientnet features under
    `convnet.layers` plus the 1->3 channel input adapter. torchvision MBConv
    naming: block.0/1 = expand/depthwise Conv2dNormActivation (block.0 is the
    depthwise when expand_ratio == 1), SqueezeExcitation fc1/fc2, final
    project Conv2dNormActivation."""
    from neuralnet_tracker_traincode_tpu.models.backbones.efficientnet import scaled_settings

    settings, _ = scaled_settings(kind)
    p, s = {}, {}
    p["to_3chn_input"] = {
        "kernel": _conv(sd["convnet.to_3chn_input.weight"]),
        "bias": np.asarray(sd["convnet.to_3chn_input.bias"]),
    }
    p["stem_conv"] = {"kernel": _conv(sd["convnet.layers.0.0.weight"])}
    _bn("convnet.layers.0.1", sd, p, s, "stem_bn")
    for stage_idx, cfg in enumerate(settings):
        for j in range(cfg.num_layers):
            t = f"convnet.layers.{stage_idx + 1}.{j}.block"
            bp, bs = {}, {}
            k = 0
            if cfg.expand_ratio != 1:
                bp["expand_conv"] = {"kernel": _conv(sd[f"{t}.0.0.weight"])}
                _bn(f"{t}.0.1", sd, bp, bs, "expand_bn")
                k = 1
            bp["dw_conv"] = {"kernel": _depthwise(sd[f"{t}.{k}.0.weight"])}
            _bn(f"{t}.{k}.1", sd, bp, bs, "dw_bn")
            bp["se"] = {
                fc: {
                    "kernel": _conv(sd[f"{t}.{k + 1}.{fc}.weight"]),
                    "bias": np.asarray(sd[f"{t}.{k + 1}.{fc}.bias"]),
                }
                for fc in ("fc1", "fc2")
            }
            bp["project_conv"] = {"kernel": _conv(sd[f"{t}.{k + 2}.0.weight"])}
            _bn(f"{t}.{k + 2}.1", sd, bp, bs, "project_bn")
            name = f"stage{stage_idx + 1}_{j}"
            p[name], s[name] = bp, bs
    p["head_conv"] = {"kernel": _conv(sd["convnet.layers.8.0.weight"])}
    _bn("convnet.layers.8.1", sd, p, s, "head_bn")
    params["convnet"], stats["convnet"] = p, s


def _mha(sd, prefix: str, d_model: int, nhead: int) -> Dict[str, Any]:
    """torch nn.MultiheadAttention (packed in_proj) -> flax
    MultiHeadDotProductAttention (query/key/value/out)."""
    hd = d_model // nhead
    w = np.asarray(sd[prefix + ".in_proj_weight"])  # (3d, d)
    b = np.asarray(sd[prefix + ".in_proj_bias"])  # (3d,)
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)

    def proj(wmat, bvec):
        return {
            "kernel": np.ascontiguousarray(wmat.T).reshape(d_model, nhead, hd),
            "bias": bvec.reshape(nhead, hd),
        }

    ow = np.asarray(sd[prefix + ".out_proj.weight"])  # (d, d)
    return {
        "query": proj(qw, qb),
        "key": proj(kw, kb),
        "value": proj(vw, vb),
        "out": {
            "kernel": np.ascontiguousarray(ow.T).reshape(nhead, hd, d_model),
            "bias": np.asarray(sd[prefix + ".out_proj.bias"]),
        },
    }


def _layer_norm(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[prefix + ".weight"]), "bias": np.asarray(sd[prefix + ".bias"])}


def _hybrid_vit(sd, params: Dict, stats: Dict):
    """Reference HybridVitBackbone (`trackertraincode/backbones/
    hybrid_vit.py:8-96`): Sequential(stem conv, resnet layer1..4) front,
    1x1 projection + BN, learned position/cls/query embeddings, and a
    1+1 layer torch nn.Transformer (post-LN, relu, final norms)."""
    d_model, nhead = 256, 8
    p, s = {}, {}
    p["stem"] = {"kernel": _conv(sd["convnet.convnet.0.weight"])}
    for stage in range(4):
        for b in range(2):
            bp, bs = _basic_block(sd, f"convnet.convnet.{stage + 1}.{b}")
            name = f"layer{stage + 1}_{b}"
            p[name], s[name] = bp, bs
    p["proj_conv"] = {"kernel": _conv(sd["convnet.proj.0.weight"])}
    _bn("convnet.proj.1", sd, p, s, "proj_bn")
    p["position"] = np.transpose(np.asarray(sd["convnet.position"]), (0, 2, 3, 1))
    p["queries"] = np.asarray(sd["convnet.queries"])
    p["cls_token"] = np.asarray(sd["convnet.cls_token"])

    enc = "convnet.transformer.encoder.layers.0"
    p["transformer_encoder"] = {
        "self_attn": _mha(sd, enc + ".self_attn", d_model, nhead),
        "linear1": _linear(sd, enc + ".linear1"),
        "linear2": _linear(sd, enc + ".linear2"),
        "norm1": _layer_norm(sd, enc + ".norm1"),
        "norm2": _layer_norm(sd, enc + ".norm2"),
    }
    p["transformer_encoder_norm"] = _layer_norm(sd, "convnet.transformer.encoder.norm")
    dec = "convnet.transformer.decoder.layers.0"
    p["transformer_decoder"] = {
        "self_attn": _mha(sd, dec + ".self_attn", d_model, nhead),
        "cross_attn": _mha(sd, dec + ".multihead_attn", d_model, nhead),
        "linear1": _linear(sd, dec + ".linear1"),
        "linear2": _linear(sd, dec + ".linear2"),
        "norm1": _layer_norm(sd, dec + ".norm1"),
        "norm2": _layer_norm(sd, dec + ".norm2"),
        "norm3": _layer_norm(sd, dec + ".norm3"),
    }
    p["transformer_decoder_norm"] = _layer_norm(sd, "convnet.transformer.decoder.norm")
    params["convnet"], stats["convnet"] = p, s


_BACKBONE_CONVERTERS = {
    "mobilenetv1": _mobilenet,
    "resnet18": _resnet18,
    "hybrid_vit": _hybrid_vit,
}
for _kind in ("b0", "b1", "b2", "b3", "b4"):
    _BACKBONE_CONVERTERS["efficientnet_" + _kind] = (
        lambda sd, params, stats, _k=_kind: _efficientnet(_k, sd, params, stats)
    )


def _linear(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _dense(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _neck(sd, prefix: str) -> Dict[str, Any]:
    return {"lin": _linear(sd, prefix + ".lin")}


def convert_posenet_state_dict(sd: Dict[str, Any], config: Dict[str, Any]):
    """Reference NetworkWithPointHead state dict -> our flax variables."""
    backbone = config.get("config", "mobilenetv1")
    if backbone not in _BACKBONE_CONVERTERS:
        raise NotImplementedError(
            f"no state-dict mapping for backbone {backbone!r}; "
            f"available: {sorted(_BACKBONE_CONVERTERS)}"
        )
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _BACKBONE_CONVERTERS[backbone](sd, params, stats)

    uncertainty = bool(config.get("enable_uncertainty", False))
    boxnet = {"linear": _linear(sd, "boxnet.linear")}
    if uncertainty:
        boxnet["uncertainty_scales"] = {
            "hidden_scale": np.asarray(sd["boxnet.scales.hidden_scale"])
        }
    params["boxnet"] = boxnet

    posnet = {
        "linear_xy": _linear(sd, "posnet.linear_xy"),
        "linear_size": _linear(sd, "posnet.linear_size"),
    }
    if uncertainty:
        posnet["uncertainty_scales"] = {"neck": _neck(sd, "posnet.scales.neck")}
    params["posnet"] = posnet

    quatnet = {"linear": _linear(sd, "quatnet.linear")}
    if uncertainty:
        quatnet["uncertainty_net"] = {"neck": _neck(sd, "quatnet.uncertainty_net.neck")}
    params["quatnet"] = quatnet

    if config.get("use_local_pose_offset", True):
        params["local_pose_offset"] = {"p": np.asarray(sd["local_pose_offset.p"])}
        if config.get("enable_point_head", True):
            params["local_pose_offset_kpts"] = {
                "p": np.asarray(sd["local_pose_offset_kpts.p"])
            }

    if config.get("enable_point_head", True):
        landmarks = {"shapenet": _linear(sd, "landmarks.shapenet")}
        if uncertainty:
            landmarks["uncertainty_points"] = {
                "hidden_scale": np.asarray(sd["landmarks.point_distrib_scales.hidden_scale"])
            }
            landmarks["uncertainty_shape"] = {
                "hidden_scale": np.asarray(sd["landmarks.shape_distrib_scales.hidden_scale"])
            }
        params["landmarks"] = landmarks

    if config.get("enable_face_detector", False):
        params["face_detector"] = _linear(sd, "face_detector")

    return {"params": params, "batch_stats": stats}


def convert_localizer_state_dict(sd: Dict[str, Any]):
    """Reference LocalizerNet state dict -> our flax variables.

    Torch layout (`trackertraincode/neuralnets/models.py:30-72`): convnet is a
    Sequential of [initial_stage(conv,bn,relu), ds-sep conv(Sequential of 5),
    12x mnasnet _InvertedResidual (each with .layers.{0,1,3,4,6,7}), final 1x1
    conv]; plus boxstddev.half_size (a trainable scalar).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["initial_conv"] = {"kernel": _conv(sd["convnet.0.0.weight"])}
    _bn("convnet.0.1", sd, params, stats, "initial_bn")

    params["dsconv_dw"] = {"kernel": _depthwise(sd["convnet.1.0.weight"])}
    _bn("convnet.1.1", sd, params, stats, "dsconv_bn1")
    params["dsconv_pw"] = {"kernel": _conv(sd["convnet.1.3.weight"])}
    _bn("convnet.1.4", sd, params, stats, "dsconv_bn2")

    for i in range(12):
        tprefix = f"convnet.{i + 2}.layers"
        p, s = {}, {}
        p["expand"] = {"kernel": _conv(sd[tprefix + ".0.weight"])}
        _bn(tprefix + ".1", sd, p, s, "bn1")
        p["depthwise"] = {"kernel": _depthwise(sd[tprefix + ".3.weight"])}
        _bn(tprefix + ".4", sd, p, s, "bn2")
        p["project"] = {"kernel": _conv(sd[tprefix + ".6.weight"])}
        _bn(tprefix + ".7", sd, p, s, "bn3")
        params[f"ir{i}"] = p
        stats[f"ir{i}"] = s

    params["final_conv"] = {
        "kernel": _conv(sd["convnet.14.weight"]),
        "bias": np.asarray(sd["convnet.14.bias"]),
    }
    params["boxstddev_half_size"] = np.asarray(sd["boxstddev.half_size"])
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(filename: str):
    """Load a reference checkpoint file -> (our model instance, variables)."""
    import torch

    from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead

    blob = torch.load(filename, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob and "config" in blob:
        sd, config = blob["state_dict"], blob["config"]
    else:  # plain state dict (legacy)
        sd, config = blob, {}
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    variables = convert_posenet_state_dict(sd, config)
    known = {
        k: config[k]
        for k in (
            "enable_point_head", "enable_face_detector", "config", "enable_uncertainty",
            "use_local_pose_offset", "backbone_args", "enable_6drot",
        )
        if k in config
    }
    model = NetworkWithPointHead(**known)
    return model, variables
