"""Pallas TPU kernel fusing the gather-free crop warp into ONE pass.

`warp_fast.warp_roi_rotate`'s pure-XLA formulation round-trips every
intermediate (resample weight matrices, canvas, each barrel-shift stage)
through HBM — honest slope timing puts it at ~30 ms for b512 448^2 -> 129^2
(docs/PERFORMANCE.md). All of those intermediates are per-sample small
(canvas ~193^2 f32 = 149 KB), so the whole chain fits in VMEM: this kernel
runs one grid step per sample, DMA-ing the uint8 source tile in and the
S^2 crop out, with

  1. triangle-filter weight construction (VPU, broadcasted_iota),
  2. separable resample as two MXU matmuls (f32 accumulate),
  3. the three Paeth shear passes as in-VMEM fractional lerp +
     per-row barrel shifter (vector selects, never a gather),

all on-chip. HBM traffic: 448^2 u8 in + 129^2 f32 out per sample
(~0.14 MB vs the XLA path's ~15 MB of intermediate traffic per sample).

Semantics are pinned against `warp_fast`'s XLA implementation by
`tests/test_warp_pallas.py` (interpret mode on CPU, compiled on TPU); the
public entry `warp_roi_rotate` in `warp_fast.py` dispatches here on TPU
backends for single-channel images.

Reference counterpart being replaced: host-side cv2 warpAffine
(`/root/reference/trackertraincode/datatransformation/image_geometric_cv2.py`)
— redesigned device-side, not ported.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralnet_tracker_traincode_tpu.augmentation.warp_fast import canvas_size


def _tri_weights(start, scale, n_out: int, n_src: int):
    """(n_out, n_src) triangle-filter weights; matches `_resample_weights`
    for a single sample (same center convention and zero-padding norm)."""
    # Mosaic's tpu.iota is integer-only; cast after generation.
    c = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_src), 0).astype(jnp.float32)
    h = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_src), 1).astype(jnp.float32)
    p = start + scale * (c + 0.5)
    supp = jnp.maximum(jnp.abs(scale), 1.0)
    t = (h + 0.5 - p) / supp
    w = jnp.maximum(0.0, 1.0 - jnp.abs(t))
    return w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-8)


def _barrel_shear_rows(x, coef, c0: float, m: int):
    """out[y, j] = x(y, j + coef*(y+0.5-c0)): fractional lerp + barrel shift.

    Same construction as `warp_fast._shear_pull_lanes`, single sample, on
    VMEM-resident values."""
    H, W = x.shape
    yc = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0).astype(jnp.float32) + 0.5
    s = coef * (yc - c0)  # (H, 1)
    i0 = jnp.floor(s)
    f = s - i0
    t = i0.astype(jnp.int32) + (m + 1)
    buf = jnp.pad(x, ((0, 0), (m + 1, m + 1)))
    out = (1.0 - f) * buf[:, :-1] + f * buf[:, 1:]
    for k in range((2 * m + 1).bit_length()):
        step = 1 << k
        bit = (t >> k) & 1
        shifted = jnp.pad(out[:, step:], ((0, 0), (0, step)))
        out = jnp.where(bit > 0, shifted, out)
    return out[:, :W]


def _barrel_shear_cols(x, coef, c0: float, m: int):
    """out[i, x'] = x(i + coef*(x'+0.5-c0), x') — along sublanes."""
    H, W = x.shape
    xc = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32) + 0.5
    s = coef * (xc - c0)  # (1, W)
    i0 = jnp.floor(s)
    f = s - i0
    t = i0.astype(jnp.int32) + (m + 1)
    buf = jnp.pad(x, ((m + 1, m + 1), (0, 0)))
    out = (1.0 - f) * buf[:-1, :] + f * buf[1:, :]
    for k in range((2 * m + 1).bit_length()):
        step = 1 << k
        bit = (t >> k) & 1
        shifted = jnp.pad(out[step:, :], ((0, step), (0, 0)))
        out = jnp.where(bit > 0, shifted, out)
    return out[:H, :]


def _warp_kernel(params_ref, img_ref, out_ref, *, H, W, S, CS, m1, m2, rotate, G,
                 precision):
    """G samples per grid step; params is the FULL (B, 8) f32 array in SMEM
    (blocked SMEM specs are rejected by the Mosaic lowering), row-indexed by
    program id: [y0', sy, x0', sx, a, b, _, _].

    G > 1 amortizes the fixed per-grid-step cost (measured ~2 us/step on
    v5e — at b512 that fixed term was over half the kernel's 2.25 ms); the
    per-sample computation is unchanged, so outputs are bit-identical to
    G=1."""
    b_idx = pl.program_id(0)
    for i in range(G):
        row = b_idx * G + i
        ystart = params_ref[row, 0]
        sy = params_ref[row, 1]
        xstart = params_ref[row, 2]
        sx = params_ref[row, 3]

        img = img_ref[i].astype(jnp.float32)  # (H, W); input is bf16 (see caller)
        wy = _tri_weights(ystart, sy, CS, H)  # (CS, H)
        mid = jnp.dot(wy, img, preferred_element_type=jnp.float32,
                      precision=precision)  # (CS, W)
        wxt = _tri_weights(xstart, sx, CS, W).T  # (W, CS)
        canvas = jnp.dot(mid, wxt, preferred_element_type=jnp.float32,
                         precision=precision)  # (CS, CS)

        if rotate:
            a = params_ref[row, 4]
            b = params_ref[row, 5]
            c0 = CS / 2.0
            canvas = _barrel_shear_rows(canvas, a, c0, m1)
            canvas = _barrel_shear_cols(canvas, b, c0, m2)
            canvas = _barrel_shear_rows(canvas, a, c0, m1)
            lo = (CS - S) // 2
            out_ref[i] = canvas[lo : lo + S, lo : lo + S]
        else:
            out_ref[i] = canvas


@functools.partial(jax.jit, static_argnames=("out_size", "theta_max_deg", "skip_rotation", "interpret", "precision"))
def warp_roi_rotate_pallas(
    images: jax.Array,  # (B, H, W) uint8/float — single channel
    view_roi: jax.Array,  # (B, 4)
    angles: jax.Array,  # (B,)
    out_size: int,
    theta_max_deg: float,
    skip_rotation: bool = False,
    interpret: bool = False,
    precision: str = "default",
) -> jax.Array:
    """Fused-kernel equivalent of `warp_fast.warp_roi_rotate` (pre-fliprot),
    returning (B, S, S) float32.

    `precision` selects the MXU mode for the two resample dots:
    "default" (production — weights truncate to bf16 in the systolic array,
    ≤ ~255 * 2^-8 per pass against exact arithmetic) or "float32" (multi-pass
    f32 — used by the on-device equality gate `tests/test_pallas_on_device.py`
    to compare against the XLA oracle under
    `jax.default_matmul_precision("float32")` at a tight tolerance)."""
    B, H, W = images.shape
    S = int(out_size)
    # Mosaic has no uint8->float cast; bf16 carries 0..255 exactly and keeps
    # the HBM read at 2 B/px (the cast fuses into the XLA program upstream).
    if images.dtype != jnp.bfloat16:
        images = images.astype(jnp.bfloat16)
    if skip_rotation:
        CS, m1, m2 = S, 0, 0
    else:
        CS = canvas_size(S, theta_max_deg)
        c0 = CS / 2.0
        m1 = int(math.ceil(abs(math.tan(math.radians(theta_max_deg) / 2.0)) * c0)) + 1
        m2 = int(math.ceil(abs(math.sin(math.radians(theta_max_deg))) * c0)) + 1

    x0 = view_roi[:, 0]
    y0 = view_roi[:, 1]
    sx = (view_roi[:, 2] - x0) / float(S)
    sy = (view_roi[:, 3] - y0) / float(S)
    m = (CS - S) / 2.0
    phi = -angles
    params = jnp.stack(
        [
            y0 - sy * m,
            sy,
            x0 - sx * m,
            sx,
            -jnp.tan(phi / 2.0),
            jnp.sin(phi),
            jnp.zeros_like(sx),
            jnp.zeros_like(sx),
        ],
        axis=-1,
    ).astype(jnp.float32)  # (B, 8)

    # Largest sample block that divides B (bounded by VMEM: the G-sample
    # input block is G*H*W*2 B, double-buffered by the pipeline).
    G = next(g for g in (8, 4, 2, 1) if B % g == 0)
    prec = {"default": None, "float32": jax.lax.Precision.HIGHEST}[precision]
    kernel = functools.partial(
        _warp_kernel, H=H, W=W, S=S, CS=CS, m1=m1, m2=m2, rotate=not skip_rotation, G=G,
        precision=prec,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((G, H, W), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, S, S), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, S), jnp.float32),
        interpret=interpret,
    )(params, images)
