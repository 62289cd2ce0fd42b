"""Pins the fused Pallas warp kernel (`warp_pallas.warp_roi_rotate_pallas`)
against the portable XLA formulation (`warp_fast.warp_roi_rotate`).

Runs in Pallas interpret mode on the CPU test platform; the SAME kernel code
compiles on TPU (exercised by `tests/test_pallas_on_device.py` against an
f32-matmul-precision XLA oracle). On CPU both paths accumulate full f32, so
the contract here is tight (~0.02 gray levels of reassociation noise,
measured 0.004); on device the oracle MUST pin
jax.default_matmul_precision('float32') — at the TPU default (bf16) the
oracle's einsums truncate the f32 resample weights to 8 significand bits,
which alone moves outputs by ~255 * 2^-9 ~ 1 gray level (the round-4 red
gate) — see docs/PERFORMANCE.md.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.augmentation import warp_fast
from neuralnet_tracker_traincode_tpu.augmentation.warp_pallas import warp_roi_rotate_pallas


def _data(B=4, H=112, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, size=(B, H, H, 1)).astype(np.uint8)
    roi = jnp.asarray(
        [[10.0, 5.0, 90.0, 85.0], [0.0, 0.0, float(H), float(H)],
         [20.0, 20.0, 70.0, 70.0], [5.5, 8.25, 100.5, 103.25]][:B]
    )
    ang = jnp.asarray([0.2, -0.4, 0.0, 0.45][:B])
    return jnp.asarray(img), roi, ang


def _xla_warp(img, roi, ang, S, theta, **kw):
    os.environ["NNTC_WARP_IMPL"] = "xla"
    try:
        return warp_fast.warp_roi_rotate(img, roi, ang, S, theta, **kw)
    finally:
        os.environ.pop("NNTC_WARP_IMPL", None)


@pytest.mark.parametrize("skip_rotation", [False, True])
def test_pallas_matches_xla(skip_rotation):
    img, roi, ang = _data()
    S, theta = 49, 30.0
    ref = np.asarray(_xla_warp(img, roi, ang, S, theta, skip_rotation=skip_rotation))[..., 0]
    out = np.asarray(
        warp_roi_rotate_pallas(img[..., 0], roi, ang, S, theta,
                               skip_rotation=skip_rotation, interpret=True)
    )
    d = np.abs(ref - out)
    assert d.max() < 0.02 and d.mean() < 0.002, (d.max(), d.mean())


def test_dispatcher_uses_pallas_when_forced():
    """NNTC_WARP_IMPL=pallas routes the public entry through the kernel
    (interpret mode on CPU) including the fliprot permutations."""
    img, roi, ang = _data(B=2)
    do_flip = jnp.asarray([True, False])
    rot_dir = jnp.asarray([1.0, -1.0])
    ref = _xla_warp(img, roi, ang, 33, 30.0, do_flip=do_flip, rot_dir=rot_dir)
    os.environ["NNTC_WARP_IMPL"] = "pallas"
    try:
        out = warp_fast.warp_roi_rotate(img, roi, ang, 33, 30.0, do_flip=do_flip, rot_dir=rot_dir)
    finally:
        os.environ.pop("NNTC_WARP_IMPL", None)
    d = np.abs(np.asarray(ref) - np.asarray(out))
    assert d.max() < 0.02, d.max()


def test_multichannel_falls_back_to_xla():
    """C>1 has no kernel path; the dispatcher must stay on XLA and agree."""
    img, roi, ang = _data(B=2)
    img3 = jnp.concatenate([img, img], axis=-1)
    out = warp_fast.warp_roi_rotate(img3, roi, ang, 33, 30.0)
    assert out.shape == (2, 33, 33, 2)
