"""CPU-tier (interpret-mode) oracle test of the equalize Pallas kernel.

`equalize_pallas` must agree with `intensity.equalize` (the kornia-exact XLA
formulation, itself pinned against numpy oracles in
tests/test_intensity_oracles.py) to fp-noise. The compiled-on-device check
lives in tests/test_pallas_on_device.py (accelerator-gated); this module runs
the identical comparison in interpret mode so default CI executes the kernel
body: histogram/LUT construction, the step==0 identity, and the per-sample
gate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from neuralnet_tracker_traincode_tpu.augmentation.equalize_pallas import equalize_pallas
from neuralnet_tracker_traincode_tpu.augmentation.intensity import equalize


def _images(B=16, S=65, seed=7):
    rng = np.random.RandomState(seed)
    imgs = []
    for i in range(B):
        if i % 4 == 0:  # constant image: step == 0 -> identity
            imgs.append(np.full((S, S), rng.rand(), np.float32))
        elif i % 4 == 1:  # smooth gradient
            g = np.linspace(0, 1, S, dtype=np.float32)
            imgs.append(np.outer(g, g))
        else:  # gamma-skewed noise
            imgs.append(rng.rand(S, S).astype(np.float32) ** (0.3 + rng.rand()))
    return np.stack(imgs), rng


def test_equalize_pallas_matches_xla_oracle():
    x, rng = _images()
    B, S, _ = x.shape
    gate = rng.rand(B) < 0.7
    ref = np.asarray(jax.jit(equalize)(jnp.asarray(x)[..., None]))[..., 0]
    ref = np.where(gate[:, None, None], ref, x)
    out = np.asarray(
        equalize_pallas(jnp.asarray(x.reshape(B, -1)), jnp.asarray(gate), interpret=True)
    ).reshape(B, S, S)
    assert np.abs(ref - out).max() < 1e-5


def test_gate_off_is_identity():
    x, _ = _images(B=4)
    B, S, _ = x.shape
    out = np.asarray(
        equalize_pallas(
            jnp.asarray(x.reshape(B, -1)), jnp.zeros(B, bool), interpret=True
        )
    ).reshape(B, S, S)
    assert np.array_equal(out, x)
