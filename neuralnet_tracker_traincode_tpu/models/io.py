"""Self-describing model checkpoints.

Contract: `trackertraincode/neuralnets/io.py`: files carry
{variables, class_name, config} so `load_model` can reconstruct the module
without CLI flags. Serialized with flax msgpack; arrays stored as numpy.
"""

import json
from typing import Any, Dict, List, Tuple, Type

import flax.serialization
import jax
import numpy as np

MAGIC = b"NNTTPU1\n"


class InvalidFileFormatError(RuntimeError):
    pass


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_model(model, variables: Dict[str, Any], filename: str):
    """Save a flax module + its variables collection ({'params', 'batch_stats', ...})."""
    header = {
        "class_name": type(model).__name__,
        "config": model.get_config(),
    }
    blob = flax.serialization.msgpack_serialize(_to_numpy_tree(variables))
    with open(filename, "wb") as f:
        f.write(MAGIC)
        hdr = json.dumps(header).encode("utf-8")
        f.write(len(hdr).to_bytes(8, "little"))
        f.write(hdr)
        f.write(blob)


def load_model(filename: str, classes: List[Type]) -> Tuple[Any, Dict[str, Any]]:
    """Returns (module instance, variables)."""
    with open(filename, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise InvalidFileFormatError(f"Bad magic in {filename}")
        hdr_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(hdr_len).decode("utf-8"))
        blob = f.read()
    class_by_name = {c.__name__: c for c in classes}
    if header["class_name"] not in class_by_name:
        raise InvalidFileFormatError(
            f"Unknown model class {header['class_name']}; known: {list(class_by_name)}"
        )
    cls = class_by_name[header["class_name"]]
    config = dict(header["config"])
    model = cls(**config)
    variables = flax.serialization.msgpack_restore(blob)
    return model, variables


def load_posenet(filename: str):
    """Convenience: load a pose network checkpoint."""
    from neuralnet_tracker_traincode_tpu.models.localizer import LocalizerNet
    from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead

    return load_model(filename, [NetworkWithPointHead, LocalizerNet])
