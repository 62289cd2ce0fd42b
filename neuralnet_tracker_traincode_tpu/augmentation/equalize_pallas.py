"""Pallas TPU kernel for per-image histogram equalization.

The XLA formulation (`intensity.equalize`) factorizes the 256-bin histogram
and LUT lookup through hi/lo-nibble one-hots; even in bf16 those are
(P, 16) materializations that round-trip HBM — the dominant term of the
intensity stage (~1.5 ms of the 2.26 ms stage-1 marginal at b512 129^2).
Here the whole op runs per sample in VMEM:

  1. hi/lo one-hots built as (16, P) comparisons against broadcasted_iota
     (never leave VMEM),
  2. hist(16,16) = hi1h . lo1h^T as ONE MXU contraction over pixels,
  3. the torchvision LUT built in row-major (16,16) form: cumsum along
     lanes + a prefix of row totals (tiny VPU work),
  4. lookup: U = lut^T-contracted with hi-lookup one-hots on the MXU, then
     an elementwise mul + 16-row reduction against the lo one-hots.

The caller passes images flattened to (B, P): collapsing (S, S) -> (P,)
is free-ish in XLA but unsupported for unaligned S inside Mosaic.

Math is IDENTICAL to `intensity.equalize` (kornia/torchvision semantics:
floor(x*256) histogram bin, floored half-step LUT, floor(x*255) lookup,
identity when step == 0) — pinned by tests/test_pallas_on_device.py on the
real backend; the XLA path remains the CPU/oracle implementation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _floor_div_exact(x, y):
    """floor(x / y) for nonnegative integer-valued f32 x and y >= 1.

    Mosaic lowers f32 division via an approximate reciprocal: exact
    quotients can come out a hair low and floor() then drops a whole unit
    (measured: 16575/255 -> 64.9999 -> 64 instead of 65). Correct the
    candidate with the EXACT f32 remainder (products here stay far below
    2^24); two rounds cover a +-1 candidate error with margin."""
    q = jnp.floor(x / y)
    for _ in range(2):
        r = x - q * y
        q = q + (r >= y).astype(jnp.float32) - (r < 0).astype(jnp.float32)
    return q


def _equalize_kernel(gate_ref, img_ref, out_ref):
    b = pl.program_id(0)
    x = img_ref[0]  # (1, P) float32 in [0, 1] -- keep 2D throughout
    P = x.shape[-1]

    hist_idx = jnp.clip(jnp.floor(x * 256.0), 0.0, 255.0).astype(jnp.int32)  # (1, P)
    hi = hist_idx >> 4
    lo = hist_idx & 15
    rows16 = jax.lax.broadcasted_iota(jnp.int32, (16, P), 0)
    hi1h = (rows16 == hi).astype(jnp.float32)  # (16, P)
    lo1h = (rows16 == lo).astype(jnp.float32)
    hist = jax.lax.dot_general(
        hi1h, lo1h, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, 16): hist[a, b] = count of value 16a + b

    # last nonzero bin + its count (torchvision drops it from the step sum)
    cols16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
    rows16s = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
    flat_idx = rows16s * 16 + cols16
    nz = hist > 0.0
    last_nz = jnp.max(jnp.where(nz, flat_idx, -1))
    last_count = jnp.sum(jnp.where(flat_idx == last_nz, hist, 0.0))
    total = jnp.sum(hist)
    step = _floor_div_exact(total - last_count, 255.0)

    # Row-major cumsum over the (16, 16) layout via log-shift ADDS (exact
    # f32 on the VPU). Matmuls are NOT usable here: Mosaic truncates MXU
    # inputs to bf16 regardless of precision=HIGHEST, and cumulative counts
    # exceed bf16's 256 integer-exact bound (measured: LUT off by 1 level).
    # The 0/1 one-hot dots above are safe — their inputs are exactly 0/1.
    # (Mosaic also rejects pads/concats on 1-lane vectors, so every shifted
    # operand is kept at the full (16, 16) width.)
    within = hist
    for k in (1, 2, 4, 8):  # inclusive prefix along lanes (bins within a row)
        within = within + jnp.pad(within, ((0, 0), (k, 0)))[:, :16]
    row_tot16 = jnp.broadcast_to(within[:, 15:16], (16, 16))  # per-row totals
    rows_incl = row_tot16
    for k in (1, 2, 4, 8):  # inclusive prefix along sublanes (rows)
        rows_incl = rows_incl + jnp.pad(rows_incl, ((k, 0), (0, 0)))[:16, :]
    cum = within + (rows_incl - row_tot16)  # (16, 16) row-major cumulative hist

    lut = _floor_div_exact(cum + jnp.floor(step / 2.0), jnp.maximum(step, 1.0))
    # shift by one in row-major order: lut[v] = clip(lut_cum[v-1]), lut[0] = 0
    shifted = jnp.pad(lut, ((0, 0), (1, 0)))[:, :16]  # lut[a, b-1], 0 at b=0
    lutlast16 = jnp.broadcast_to(lut[:, 15:16], (16, 16))
    carry = jnp.pad(lutlast16, ((1, 0), (0, 0)))[:16, :]  # lut[a-1, 15]
    lut = jnp.where(cols16 == 0, carry, shifted)
    lut = jnp.clip(lut, 0.0, 255.0)  # (16, 16) row-major LUT

    look_idx = jnp.floor(x * 255.0).astype(jnp.int32)  # (1, P)
    hi_l = (rows16 == (look_idx >> 4)).astype(jnp.float32)  # (16, P)
    lo_l = (rows16 == (look_idx & 15)).astype(jnp.float32)
    # U[b, p] = sum_a lut[a, b] * hi_l[a, p]
    U = jax.lax.dot_general(
        lut, hi_l, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, P)
    eq = jnp.sum(U * lo_l, axis=0, keepdims=True) / 255.0  # (1, P)

    apply = jnp.logical_and(gate_ref[b] != 0, step != 0.0)
    out_ref[0] = jnp.where(apply, eq, x)


@functools.partial(jax.jit, static_argnames=("interpret",))
def equalize_pallas(
    images_flat: jax.Array,  # (B, P) float32 in [0, 1] (single channel, flattened)
    gate: jax.Array,  # (B,) bool/int32 — per-sample bernoulli application mask
    interpret: bool = False,
) -> jax.Array:
    B, P = images_flat.shape
    # Mosaic requires the LAST TWO block dims to divide (8, 128) or equal
    # the array dims; a (1, P) block over (B, P) violates that, so carry a
    # singleton middle axis: blocks of (1, 1, P) over (B, 1, P).
    out = pl.pallas_call(
        _equalize_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, P), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, P), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, P), jnp.float32),
        interpret=interpret,
    )(gate.astype(jnp.int32), images_flat[:, None, :])
    return out[:, 0, :]
