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


def _convbn_block(sd, prefix: str, params: Dict, stats: Dict):
    """MobileNet DepthWiseBlock: conv_dw/bn_dw/conv_sep/bn_sep."""
    p, s = {}, {}
    # Depthwise torch weight (C, 1, k, k) -> flax (k, k, 1, C)
    p["conv_dw"] = {"kernel": np.transpose(np.asarray(sd[prefix + ".conv_dw.weight"]), (2, 3, 1, 0))}
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


def _linear(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _dense(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _neck(sd, prefix: str) -> Dict[str, Any]:
    return {"lin": _linear(sd, prefix + ".lin")}


def convert_posenet_state_dict(sd: Dict[str, Any], config: Dict[str, Any]):
    """Reference NetworkWithPointHead state dict -> our flax variables."""
    assert config.get("config", "mobilenetv1") == "mobilenetv1", (
        "only the mobilenetv1 backbone mapping is implemented"
    )
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _mobilenet(sd, params, stats)

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
