"""Gather-free similarity warp for the training augmentation (TPU fast path).

The generic `warp.warp_affine` realizes the crop as a per-pixel bilinear
gather. XLA:TPU lowers element-granular gathers to a near-serial path —
honestly measured (value-readback timing, see docs/PERFORMANCE.md) at
~17 cycles per tap, i.e. **2.36 s** for a batch of 512 448^2 -> 129^2 crops
with 2x oversampling. That is 99% of the whole training step.

This module replaces it for the train pipeline with a formulation that maps
onto the MXU/VPU instead of the gather unit, exploiting the structure of the
crop transform (`geometric.py`: `focus_roi_transform` = center-rotation @
axis-aligned range remap, composed with an optional square-canvas flip/rot90):

1. **Separable axis-aligned resample** of the source onto a rotation-margin
   canvas: two batched matmuls with per-sample triangle-filter weight
   matrices (built on the fly from the view ROI; antialiased by scaling the
   filter support with the downscale factor — the moral equivalent of the
   reference's cv2 area filtering, `image_geometric_cv2.py`).
2. **In-plane rotation by three shear passes** (Paeth decomposition
   R(phi) = Shx(-tan(phi/2)) Shy(sin phi) Shx(-tan(phi/2))). Each shear
   shifts rows (or columns) by a per-row fractional amount; it is computed
   as a masked accumulation over statically-shifted slices — pure VPU
   multiply-adds, no gather, ~tan(theta_max/2)*C static shift candidates.
3. **Center crop + flip/rot90 as array symmetries** (exact permutations,
   selected per sample).

The label transforms continue to use the exact composed `Affine2d`; the
image path here realizes the *same* geometric map by construction (pinned by
tests/test_warp_fast.py against the gather warp).

Filtering differs from the gather path (triangle antialias + three bilinear
shear taps vs. 2x-oversampled bilinear): equally valid resampling for
training augmentation; the deterministic eval/export paths keep the gather
(and cv2) implementations bit-compatible with the reference.
"""

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def canvas_size(out_size: int, theta_max_deg: float) -> int:
    """Canvas big enough that the final out_size^2 crop only ever pulls
    in-canvas content through the three shear passes (pull-chain bound)."""
    a = abs(math.tan(math.radians(theta_max_deg) / 2.0))
    b = abs(math.sin(math.radians(theta_max_deg)))
    hx = hy = out_size / 2.0
    hx = hx + a * hy  # innermost x-shear
    hy = hy + b * hx  # y-shear
    hx = hx + a * hy  # outermost x-shear
    h = int(math.ceil(max(hx, hy))) + 1
    c = 2 * h
    # keep (C - S) even so the crop sits centered on whole pixels
    if (c - out_size) % 2:
        c += 1
    return c


def _resample_weights(
    start: jax.Array,  # (B,) continuous source coord of canvas index -0.5... i.e. p(j) = start + scale*(j+0.5)
    scale: jax.Array,  # (B,) source pixels per canvas pixel
    n_out: int,
    n_src: int,
) -> jax.Array:
    """(B, n_out, n_src) triangle-filter weights, antialiased for minification.

    Source pixel centers sit at integer + 0.5 (the codebase-wide convention).
    Out-of-source support is zero-padded (cv2 BORDER_CONSTANT) — weights are
    normalized over the in-range lattice only, which matters solely beyond
    the already-zero-padded image margins.
    """
    j = jnp.arange(n_out, dtype=jnp.float32)
    h = jnp.arange(n_src, dtype=jnp.float32)
    p = start[:, None] + scale[:, None] * (j[None, :] + 0.5)  # (B, n_out)
    supp = jnp.maximum(jnp.abs(scale), 1.0)[:, None, None]  # antialias when minifying
    t = (h[None, None, :] + 0.5 - p[:, :, None]) / supp
    w = jnp.maximum(0.0, 1.0 - jnp.abs(t))
    return w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-8)


def _shear_pull_lanes(img: jax.Array, coef: jax.Array, c0: float, m_max: int) -> jax.Array:
    """out[b, y, j] = img(b, y, j + coef_b * (y + 0.5 - c0)) with 2-tap interp.

    `img` is (B, H, W); the shift varies per row. The fractional part is a
    single 2-tap lerp of adjacent columns; the integer part is a per-row
    barrel shifter: ceil(log2(2*m_max+2)) conditional power-of-two shifts,
    each a statically-sliced copy selected per row — pure VPU select/copy
    traffic (~7 canvas passes), never a gather. (A naive masked accumulation
    over all 2*m_max+1 static offsets costs ~8x more HBM traffic; measured
    52.6 ms -> see docs/PERFORMANCE.md.)
    """
    B, H, W = img.shape
    yc = jnp.arange(H, dtype=jnp.float32) + 0.5
    s = coef[:, None] * (yc[None, :] - c0)  # (B, H) continuous shift, |s| < m_max
    i0 = jnp.floor(s)
    f = (s - i0)[:, :, None]
    t = i0.astype(jnp.int32) + (m_max + 1)  # per-row left-shift in [1, 2*m_max]
    buf = jnp.pad(img, ((0, 0), (0, 0), (m_max + 1, m_max + 1)))
    # merge the 2-tap pair first so only ONE barrel pass is needed:
    # lerped[j] = (1-f)*buf[j] + f*buf[j+1]; then out[j] = lerped[j + t].
    x = (1.0 - f) * buf[:, :, :-1] + f * buf[:, :, 1:]
    for k in range((2 * m_max + 1).bit_length()):
        step = 1 << k
        bit = ((t >> k) & 1).astype(bool)[:, :, None]
        shifted = jnp.pad(x[:, :, step:], ((0, 0), (0, 0), (0, step)))
        x = jnp.where(bit, shifted, x)
    return x[:, :, :W]


def _shear_pull_sublanes(img: jax.Array, coef: jax.Array, c0: float, m_max: int) -> jax.Array:
    """out[b, i, x] = img(b, i + coef_b * (x + 0.5 - c0), x) — column shifts,
    same barrel-shifter construction as `_shear_pull_lanes` along sublanes."""
    B, H, W = img.shape
    xc = jnp.arange(W, dtype=jnp.float32) + 0.5
    s = coef[:, None] * (xc[None, :] - c0)  # (B, W)
    i0 = jnp.floor(s)
    f = (s - i0)[:, None, :]
    t = i0.astype(jnp.int32) + (m_max + 1)  # (B, W)
    buf = jnp.pad(img, ((0, 0), (m_max + 1, m_max + 1), (0, 0)))
    x = (1.0 - f) * buf[:, :-1, :] + f * buf[:, 1:, :]
    for k in range((2 * m_max + 1).bit_length()):
        step = 1 << k
        bit = ((t >> k) & 1).astype(bool)[:, None, :]
        shifted = jnp.pad(x[:, step:, :], ((0, 0), (0, step), (0, 0)))
        x = jnp.where(bit, shifted, x)
    return x[:, :H, :]


def apply_fliprot(
    crop: jax.Array,  # (B, S, S, C)
    do_flip: Optional[jax.Array],  # (B,) bool
    rot_dir: Optional[jax.Array],  # (B,) in {-1, 0, +1} (float or int)
) -> jax.Array:
    """Square-canvas horizontal flip then +-90deg rotation, per sample.

    Exact pixel permutations matching the Affine2d composition
    `random_flip_rot90_transform` builds (`geometric.py:160-190`): flip is
    x -> S-x (applied first), rot_dir=+1 rotates by +90deg.
    """
    x = crop
    if do_flip is not None:
        x = jnp.where(do_flip[:, None, None, None], x[:, :, ::-1, :], x)
    if rot_dir is not None:
        d = jnp.transpose(x, (0, 2, 1, 3))
        rp = d[:, :, ::-1, :]  # +90
        rm = d[:, ::-1, :, :]  # -90
        rd = rot_dir[:, None, None, None]
        x = jnp.where(rd > 0, rp, jnp.where(rd < 0, rm, x))
    return x


def _masked_transpose(crop: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Per-sample transpose of the square (B, S, S, C) crop where mask holds
    — the residue of the folded ±90° rotations (see `warp_roi_rotate`)."""
    if mask is None:
        return crop
    return jnp.where(mask[:, None, None, None], jnp.swapaxes(crop, 1, 2), crop)


def warp_roi_rotate(
    images: jax.Array,  # (B, H, W, C) uint8/float
    view_roi: jax.Array,  # (B, 4) x0 y0 x1 y1 source pixels (square)
    angles: jax.Array,  # (B,) radians, |angle| <= theta_max
    out_size: int,
    theta_max_deg: float,
    do_flip: Optional[jax.Array] = None,
    rot_dir: Optional[jax.Array] = None,
    skip_rotation: bool = False,
) -> jax.Array:
    """Crop `view_roi` -> out_size^2 with in-plane rotation about the crop
    center, gather-free. Returns (B, S, S, C) float32.

    Realizes exactly `warp_affine(images, fliprot @ center_rot(angle) @
    range_remap(view_roi -> [0,S]^2))` up to resampling filter choice.
    `skip_rotation` statically removes the shear passes (deterministic /
    rotation-free configs).

    On TPU backends the single-channel case dispatches to the fused Pallas
    kernel (`warp_pallas.py` — one HBM round trip per sample instead of one
    per stage); the pure-XLA formulation below is the portable reference
    path (CPU tests, multi-channel). Override with NNTC_WARP_IMPL=xla|pallas.
    """
    B, H, W, C = images.shape
    S = int(out_size)

    transpose_mask = None
    if do_flip is not None or rot_dir is not None:
        # Fold flip/rot90 into the resample parameters instead of post-warp
        # permutation passes. A horizontal flip equals sampling x along the
        # REVERSED roi range (x1 -> x0, negative scale — `_resample_weights`
        # and the Pallas kernel only ever use |scale|), with the in-plane
        # rotation negated (F∘R(φ) = R(−φ)∘F; the canvas reversal is a
        # reflection about the shear center, so the center crop commutes).
        # The ±90° rotations decompose into transpose ∘ axis-flip in
        # `apply_fliprot`'s convention (rot+90 = T∘flip_y, rot−90 = T∘flip_x),
        # so their flip halves fold the same way (composing with do_flip) and
        # only a per-sample conditional TRANSPOSE of the crop remains — one
        # pass instead of the old flip select + transpose + two reversed
        # selects (docs/PERFORMANCE.md).
        Bv = view_roi.shape[0]
        flip = do_flip if do_flip is not None else jnp.zeros((Bv,), bool)
        rd = rot_dir if rot_dir is not None else jnp.zeros((Bv,), jnp.float32)
        swap_x = jnp.logical_xor(flip, rd < 0)
        swap_y = rd > 0
        negate = jnp.logical_xor(flip, rd != 0)
        x0f = jnp.where(swap_x, view_roi[:, 2], view_roi[:, 0])
        x1f = jnp.where(swap_x, view_roi[:, 0], view_roi[:, 2])
        y0f = jnp.where(swap_y, view_roi[:, 3], view_roi[:, 1])
        y1f = jnp.where(swap_y, view_roi[:, 1], view_roi[:, 3])
        view_roi = jnp.stack([x0f, y0f, x1f, y1f], axis=-1)
        angles = jnp.where(negate, -angles, angles)
        if rot_dir is not None:
            transpose_mask = rd != 0
        do_flip = rot_dir = None

    impl = os.environ.get("NNTC_WARP_IMPL", "auto")
    if impl != "xla" and C == 1 and (impl == "pallas" or jax.default_backend() != "cpu"):
        from neuralnet_tracker_traincode_tpu.augmentation.warp_pallas import (
            warp_roi_rotate_pallas,
        )

        crop = warp_roi_rotate_pallas(
            images[..., 0],
            view_roi,
            angles,
            S,
            theta_max_deg,
            skip_rotation=skip_rotation,
            interpret=jax.default_backend() == "cpu",
            # "float32" = multi-pass f32 MXU dots; used by the on-device
            # equality gate to remove bf16 truncation from the comparison.
            precision=os.environ.get("NNTC_WARP_PRECISION", "default"),
        )[..., None]
        return _masked_transpose(crop, transpose_mask)
    if skip_rotation:
        CS = S
        m = 0.0
    else:
        CS = canvas_size(S, theta_max_deg)
        m = (CS - S) / 2.0

    x0 = view_roi[:, 0]
    y0 = view_roi[:, 1]
    sigma_x = (view_roi[:, 2] - x0) / float(S)
    sigma_y = (view_roi[:, 3] - y0) / float(S)
    # canvas index j has crop coord (j + 0.5 - m); source coord x0 + sigma*that
    wy = _resample_weights(y0 - sigma_y * m, sigma_y, CS, H)
    wx = _resample_weights(x0 - sigma_x * m, sigma_x, CS, W)

    img = images.astype(jnp.float32)
    # (B, CS, H) @ (B, H, W*C) -> (B, CS, W*C); then columns.
    flat = img.reshape(B, H, W * C) if C > 1 else img[..., 0]
    mid = jnp.einsum("bch,bhw->bcw", wy, flat.reshape(B, H, -1))
    if C > 1:
        mid = mid.reshape(B, CS, W, C)
        canvas = jnp.einsum("bjw,bcwk->bcjk", wx, mid)  # (B, CS, CS, C)
        chans = [canvas[..., i] for i in range(C)]
    else:
        canvas = jnp.einsum("bjw,bcw->bcj", wx, mid)  # (B, CS, CS)
        chans = [canvas]

    if not skip_rotation:
        phi = -angles  # image pull-rotation is the inverse of the label map
        # Paeth: R(phi) = Shx(-tan(phi/2)) Shy(sin phi) Shx(-tan(phi/2))
        a = -jnp.tan(phi / 2.0)
        b = jnp.sin(phi)
        c0 = CS / 2.0
        m1 = int(math.ceil(abs(math.tan(math.radians(theta_max_deg) / 2.0)) * c0)) + 1
        m2 = int(math.ceil(abs(math.sin(math.radians(theta_max_deg))) * c0)) + 1
        out_chans = []
        for ch in chans:
            t = _shear_pull_lanes(ch, a, c0, m1)
            t = _shear_pull_sublanes(t, b, c0, m2)
            t = _shear_pull_lanes(t, a, c0, m1)
            out_chans.append(t)
        chans = out_chans
        lo = int(m)
        chans = [ch[:, lo : lo + S, lo : lo + S] for ch in chans]

    crop = jnp.stack(chans, axis=-1)
    return _masked_transpose(crop, transpose_mask)
