"""CPU-tier (interpret-mode) coverage of the gaussian-noise kernel math.

`noise_pallas.add_gaussian_noise_pallas` is the TPU fast path of
`intensity.intensity_augmentation_noise`. Its hardware-PRNG primitives
(`pltpu.prng_seed`/`prng_random_bits`) have no CPU interpret rule, so this
module drives `add_gaussian_noise_from_bits` — a Pallas entry running the
IDENTICAL shared body (`_apply_noise_from_bits`: 24-bit uniforms ->
Box-Muller -> scale/add/clip) with the bit stream injected — in interpret
mode. The compiled hardware kernel's determinism/seed-independence/statistics
are pinned on the real chip by tests/test_pallas_on_device.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from neuralnet_tracker_traincode_tpu.augmentation.noise_pallas import (
    add_gaussian_noise_from_bits,
)


def _run(x, sigma, seed=0):
    x = jnp.asarray(x)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    bits1 = jax.random.bits(k1, x.shape, jnp.uint32).astype(jnp.int32)
    bits2 = jax.random.bits(k2, x.shape, jnp.uint32).astype(jnp.int32)
    return np.asarray(
        add_gaussian_noise_from_bits(
            x, bits1, bits2, jnp.asarray(sigma, jnp.float32), interpret=True
        )
    )


def test_sigma_zero_is_exact_passthrough():
    x = np.random.RandomState(0).rand(3, 40, 129).astype(np.float32)
    out = _run(x, np.zeros(3))
    assert np.array_equal(out, x)


def test_moments_and_per_sample_sigma_scaling():
    B, S = 48, 64
    x = np.full((B, S, S), 0.5, np.float32)
    sigma = np.full(B, 0.1, np.float32)
    sigma[B // 2 :] = 0.05
    out = _run(x, sigma)
    z = (out - 0.5) / sigma[:, None, None]  # far from the [0,1] clip
    assert abs(z.mean()) < 6e-3, z.mean()
    assert abs(z.std() - 1.0) < 2e-2, z.std()
    # the two sigma groups produce matching standardized stats
    assert abs(z[: B // 2].std() - z[B // 2 :].std()) < 2e-2
    # deterministic for a fixed bit stream
    assert np.array_equal(out, _run(x, sigma))
    # different bit streams -> different fields
    assert np.abs(out - _run(x, sigma, seed=1)).max() > 1e-3


def test_output_clipped_to_unit_range():
    B, S = 8, 32
    x = np.random.RandomState(1).rand(B, S, S).astype(np.float32)
    out = _run(x, np.full(B, 2.0))  # huge sigma forces clipping
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert (out == 0.0).any() and (out == 1.0).any()


def test_forced_pallas_impl_rejected_on_cpu(monkeypatch):
    """NNTC_NOISE_IMPL=pallas must fail with a clear message on CPU backends
    (the hardware PRNG cannot run or be interpreted there), not a Mosaic
    lowering error."""
    import pytest

    if jax.default_backend() != "cpu":
        pytest.skip("CPU-backend contract")
    from neuralnet_tracker_traincode_tpu.augmentation import intensity

    monkeypatch.setenv("NNTC_NOISE_IMPL", "pallas")
    with pytest.raises(ValueError, match="requires a TPU backend"):
        intensity.intensity_augmentation_noise(
            jax.random.PRNGKey(0), jnp.full((2, 16, 16, 1), 0.5, jnp.float32)
        )
