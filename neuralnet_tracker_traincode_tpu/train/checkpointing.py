"""Full training-state checkpointing for mid-run resume.

The reference relies on Lightning's checkpoint/resume (never exercised by its
scripts; SURVEY.md section 5). Here the complete TrainState (params, batch
stats, optimizer state, SWA accumulators, step counter) round-trips through a
single msgpack file, so a killed run continues bit-exactly up to data order.
"""

import json
import os
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np


def save_train_state(state, filename: str, extra: Optional[Dict[str, Any]] = None):
    host_state = jax.tree_util.tree_map(lambda x: np.asarray(x), state)
    blob = flax.serialization.to_bytes(host_state)
    header = json.dumps({"extra": extra or {}}).encode()
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)
    os.replace(tmp, filename)  # atomic


def load_train_state(template_state, filename: str):
    """Restore into the pytree structure of `template_state`; returns (state, extra)."""
    with open(filename, "rb") as f:
        hdr_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(hdr_len).decode())
        blob = f.read()
    state = flax.serialization.from_bytes(template_state, blob)
    return state, header.get("extra", {})
