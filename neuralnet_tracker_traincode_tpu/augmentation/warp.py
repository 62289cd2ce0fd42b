"""Batched affine image warping on device (XLA gather + bilinear filtering).

Replaces the reference's per-sample cv2.warpAffine / crop+resize host path
(`datatransformation/tensors/image_geometric_cv2.py`). The transform `tr` maps
SOURCE pixel coordinates to OUTPUT pixel coordinates (same convention as the
reference); sampling therefore uses tr^-1. Out-of-bounds reads are zero
(cv2 BORDER_CONSTANT 0).

Anti-aliasing: the reference uses cv2's area/gaussian down-filtering. Here the
warp samples an `oversample` x `oversample` subpixel grid per output pixel and
averages — equivalent to warping at higher resolution then box-downfiltering,
which approximates the area filter for the typical 2-4x downscale factors of
face crops. All of it fuses into one XLA program.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d
from neuralnet_tracker_traincode_tpu.ops.mathfn import affinevecmul


def _bilinear_gather(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample one (H, W, C) image at float pixel-center coords; zero padding."""
    H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        vals = img[yc, xc, :]  # gather, shape coords.shape + (C,)
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def warp_affine(
    images: jax.Array,
    tr: Affine2d,
    out_size: int,
    oversample: int = 2,
) -> jax.Array:
    """Warp (B, H, W, C) images with per-sample source->output transforms.

    Returns (B, out_size, out_size, C) float32. Pixel centers at integer + 0.5
    (cv2 convention: output pixel (i, j) samples source at tr^-1 (j+0.5, i+0.5)
    minus the half-pixel, matching cv2.warpAffine's corner-based grid).
    """
    B = images.shape[0]
    assert tr.shape == (B,), f"Need one transform per image, got {tr.shape}"
    inv = tr.inv()
    s = oversample
    out_h, out_w = (out_size, out_size) if isinstance(out_size, int) else out_size
    nh, nw = out_h * s, out_w * s
    # Continuous coordinates with pixel centers at i + 0.5, the SAME convention
    # the label transforms use (after offset_points_by_half_pixel). Output
    # pixel j is sampled at continuous coord j + 0.5 (subpixel-jittered when
    # oversampling); the inverse transform yields source continuous coords,
    # and the -0.5 converts those to array indices for the gather. This makes
    # the image warp exactly consistent with the point transforms — the
    # reference's cv2 path is 0.5 px off in some branches.
    # PERFORMANCE: when XLA:TPU can trace the gather indices back to a pure
    # iota/constant expression it lowers the gather to a serial slow path —
    # measured 3000x slower (93 ms vs 0.03 ms for batch 128). The harmless
    # runtime dependence on the transform plus the optimization barriers below
    # force the fast vectorized gather. Do not "simplify" these away.
    fake_dep = 0.0 * jax.lax.stop_gradient(inv.m.reshape(-1)[0])
    coords_x = (jnp.arange(nw, dtype=jnp.float32) + 0.5) / s + fake_dep
    coords_y = (jnp.arange(nh, dtype=jnp.float32) + 0.5) / s + fake_dep
    gx = jnp.broadcast_to(coords_x[None, :], (nh, nw))
    gy = jnp.broadcast_to(coords_y[:, None], (nh, nw))

    def warp_one(img, m):
        # Elementwise affine (a batched 2x2 matmul over the grid compiles to a
        # pathologically slow tiny-matmul loop on TPU); -0.5 converts the
        # continuous coords to array indices.
        sx = m[0, 0] * gx + m[0, 1] * gy + m[0, 2] - 0.5
        sy = m[1, 0] * gx + m[1, 1] * gy + m[1, 2] - 0.5
        sx = jax.lax.optimization_barrier(sx)
        sy = jax.lax.optimization_barrier(sy)
        out = _bilinear_gather(img.astype(jnp.float32), sx, sy)
        if s > 1:
            C = out.shape[-1]
            out = out.reshape(out_h, s, out_w, s, C).mean(axis=(1, 3))
        return out

    return jax.vmap(warp_one)(images, inv.tensor())


def croprescale(
    images: jax.Array,
    roi: jax.Array,
    out_size: int,
    oversample: int = 2,
) -> jax.Array:
    """Axis-aligned crop + rescale: roi (B, 4) in source pixels -> out_size^2.

    Equivalent to warp_affine with the roi-to-output range remap; provided for
    parity with the reference's croprescale path (`image_geometric_cv2.py:138-155`).
    """
    B = images.shape[0]
    tr = Affine2d.range_remap_2d(
        roi[..., :2],
        roi[..., 2:],
        jnp.zeros((B, 2), jnp.float32),
        jnp.full((B, 2), float(out_size), jnp.float32),
    )
    return warp_affine(images, tr, out_size, oversample)
