"""Pallas TPU kernel for the gaussian-noise augmentation stage.

The XLA formulation (`intensity.intensity_augmentation_noise`) draws
B*S*S threefry normals with `jax.random.normal` — honest slope timing puts
that at ~4.1 ms/step at b512 129^2 on v5e, nearly half the intensity stack
(docs/PERFORMANCE.md). Threefry is a software PRNG; the TPU has a hardware
per-core generator exposed as `pltpu.prng_random_bits`. This kernel fuses

  1. per-sample seeding from a host-side threefry-derived seed,
  2. uniform bits -> Box-Muller -> standard normals (VPU transcendentals),
  3. scale by the per-sample combined sigma, add, clip to [0, 1]

into one pass over the crop while it is in VMEM: HBM traffic is one read +
one write of the (B, S, S) image, no 8-bit-per-pixel random tensor ever
exists in HBM.

Semantics: statistically identical to the reference's stacked kornia
RandomGaussianNoise (`pipelines.py:508-528` via `intensity.py:43-64` of
`/root/reference/trackertraincode/datatransformation/batch/intensity.py`):
the Bernoulli gates and sigma combination stay in `jax.random` (bit-exact
with the XLA path); only the per-pixel normal stream comes from the hardware
generator — a different (still key-deterministic) stream than threefry.

Testing: `pltpu.prng_seed`/`prng_random_bits` have no CPU interpret rule
(and the TPU-semantics interpreter is far too slow for CI), so the
bits->normals->apply math is factored into `_apply_noise_from_bits`, shared
verbatim by the hardware kernel and by `add_gaussian_noise_from_bits`, an
injected-bits variant that DOES interpret on CPU.
`tests/test_noise_pallas.py` pins moments, sigma scaling, clipping, and the
sigma=0 passthrough of that shared body in interpret mode;
`tests/test_pallas_on_device.py` re-checks the compiled hardware-PRNG kernel
(determinism, seed independence) on the real chip.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_noise_from_bits(bits1, bits2, x, sigma):
    """Shared kernel body: raw int32 bits -> Box-Muller normals -> add+clip.

    `bits1`/`bits2` are int32 arrays of x's shape (only the low 24 bits are
    used — Mosaic has no uint32->f32 cast, so callers pre-mask to 24 bits).
    """
    # 24-bit uniforms; +1 keeps u1 in (0, 1] so log never sees 0
    # (bounds r at sqrt(2*24*ln2) ~ 5.77 sigma, beyond fp-visible tails).
    u1 = (bits1 + 1).astype(jnp.float32) * (1.0 / (1 << 24))
    u2 = bits2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    z = r * jnp.cos((2.0 * jnp.pi) * u2)
    return jnp.clip(x + sigma * z, 0.0, 1.0)


def _noise_kernel(seeds_ref, sigma_ref, img_ref, out_ref):
    b = pl.program_id(0)
    pltpu.prng_seed(seeds_ref[b])
    x = img_ref[0]  # (S, S) float32 in [0, 1]
    S0, S1 = x.shape
    bits1 = pltpu.bitcast(pltpu.prng_random_bits((S0, S1)), jnp.int32) & 0xFFFFFF
    bits2 = pltpu.bitcast(pltpu.prng_random_bits((S0, S1)), jnp.int32) & 0xFFFFFF
    out_ref[0] = _apply_noise_from_bits(bits1, bits2, x, sigma_ref[b])


def _noise_kernel_from_bits(sigma_ref, img_ref, bits1_ref, bits2_ref, out_ref):
    b = pl.program_id(0)
    out_ref[0] = _apply_noise_from_bits(
        bits1_ref[0] & 0xFFFFFF, bits2_ref[0] & 0xFFFFFF, img_ref[0], sigma_ref[b]
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def add_gaussian_noise_pallas(
    images: jax.Array,  # (B, S, S) float32 in [0, 1]
    seeds: jax.Array,  # (B,) int32 per-sample hardware-PRNG seeds
    sigma: jax.Array,  # (B,) float32 combined noise sigma (0 = passthrough)
    interpret: bool = False,
) -> jax.Array:
    B, S0, S1 = images.shape
    return pl.pallas_call(
        _noise_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S0, S1), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S0, S1), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S0, S1), jnp.float32),
        interpret=interpret,
    )(seeds, sigma, images)


@functools.partial(jax.jit, static_argnames=("interpret",))
def add_gaussian_noise_from_bits(
    images: jax.Array,  # (B, S, S) float32 in [0, 1]
    bits1: jax.Array,  # (B, S, S) int32 raw bits (low 24 used)
    bits2: jax.Array,  # (B, S, S) int32 raw bits (low 24 used)
    sigma: jax.Array,  # (B,) float32 combined noise sigma (0 = passthrough)
    interpret: bool = False,
) -> jax.Array:
    """Injected-bits variant running the exact `_apply_noise_from_bits` body
    — the CPU-interpretable test surface for the hardware kernel's math."""
    B, S0, S1 = images.shape
    blk = pl.BlockSpec((1, S0, S1), lambda b: (b, 0, 0))
    return pl.pallas_call(
        _noise_kernel_from_bits,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, S0, S1), jnp.float32),
        interpret=interpret,
    )(sigma, images, bits1, bits2)
