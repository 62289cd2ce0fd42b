"""Intensity (photometric) augmentations, batched on device.

Contract: the kornia pipeline of `pipelines.py:508-528` and
`datatransformation/batch/intensity.py`:
  stage 1 (random_apply=4 of 6): equalize p=.2, posterize(4-6) p=.01,
           gamma(.5-2) p=.2, contrast(.7-1.5) p=.2, brightness(.7-1.5) p=.2,
           gaussian blur 5x5 sigma 1.5 p=.1
  stage 2: stacked gaussian noise sigma in {4,16,32,64}/255 at p=.25^k, clip.

Sampling matches kornia's AugmentationSequential: `random_apply=4` draws a
random 4-subset of the 6 ops in random order per BATCH (one `lax.switch` per
slot under a `fori_loop` — exactly 4 ops execute), then each selected op
gates per sample with its own full probability. The per-op math is
kornia-exact and pinned against numpy oracles (tests/test_intensity_oracles).
Images are floats in [0, 1], shape (B, H, W, C).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np


def _per_sample_where(mask, a, b):
    return jnp.where(mask[:, None, None, None], a, b)


def equalize(images: jax.Array) -> jax.Array:
    """Histogram equalization, kornia-exact per channel, branch-free.

    Kornia's `equalize` float path (`kornia/enhance/equalization` public
    semantics; reference uses it via `RandomEqualize`) scales to [0, 255],
    histograms with `torch.histc(256, 0, 255)` — bin width 255/256, so the
    bin index is floor(x*256) — builds the torchvision LUT with FLOORED
    half-step `(cumsum + step//2) // step`, and looks pixels up by `.long()`
    truncation, i.e. floor(x*255). The two index scales differ by design;
    both are reproduced here.

    The histogram is a one-hot contraction rather than a scatter-add — XLA:TPU
    lowers scatters to a serial loop, while one-hot matmuls ride the MXU.
    The 256-wide one-hot is FACTORIZED through the 8-bit index's hi/lo
    nibbles: hist[16a+b] = sum_p hi1h[p,a] * lo1h[p,b] is a (16, P) @ (P, 16)
    matmul, and the LUT lookup is lut[idx[p]] = sum_b lo1h[p,b] *
    (hi1h @ LUT2)[p,b] — 16x less one-hot materialization/traffic than the
    naive (P, 256) form (measured 9 ms -> <1 ms at b512 129^2). Exact: every
    product is 0/1 * integer <= 255 with one nonzero per row, accumulated
    in f32.
    """

    def eq_channel(img):  # (H, W) float [0, 1]
        P = img.size
        hist_idx = jnp.clip(jnp.floor(img * 256.0), 0.0, 255.0).astype(jnp.int32).reshape(-1)
        # bf16 one-hots are EXACT (values 0/1; LUT entries are integers
        # <= 255, below bf16's 256 integer-exact bound) and halve the
        # dominant cost of this op: the (P, 16) one-hot materialization
        # traffic. Accumulation stays f32 on the MXU via
        # preferred_element_type.
        hi = jax.nn.one_hot(hist_idx // 16, 16, dtype=jnp.bfloat16)  # (P, 16)
        lo = jax.nn.one_hot(hist_idx % 16, 16, dtype=jnp.bfloat16)  # (P, 16)
        hist = jnp.einsum(
            "pa,pb->ab", hi, lo, preferred_element_type=jnp.float32
        ).reshape(256)
        nonzero = hist > 0
        idx = jnp.arange(256)
        last_nz = jnp.max(jnp.where(nonzero, idx, -1))
        last_count = jnp.sum(jnp.where(idx == last_nz, hist, 0.0))
        step = jnp.floor((jnp.sum(hist) - last_count) / 255.0)
        cum = jnp.cumsum(hist)
        lut = jnp.floor((cum + jnp.floor(step / 2.0)) / jnp.maximum(step, 1.0))
        lut = jnp.clip(jnp.concatenate([jnp.zeros((1,)), lut[:-1]]), 0.0, 255.0)
        look_idx = jnp.floor(img * 255.0).astype(jnp.int32).reshape(-1)  # .long() truncation
        hi_l = jax.nn.one_hot(look_idx // 16, 16, dtype=jnp.bfloat16)
        lo_l = jax.nn.one_hot(look_idx % 16, 16, dtype=jnp.bfloat16)
        t = jnp.matmul(
            hi_l, lut.reshape(16, 16).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (P, 16) — exact: lut holds integers <= 255
        out = jnp.sum(t * lo_l.astype(jnp.float32), axis=-1).reshape(img.shape) / 255.0
        return jnp.where(step == 0, img, out)

    return jax.vmap(jax.vmap(eq_channel, in_axes=-1, out_axes=-1))(images)


def posterize(images: jax.Array, bits: jax.Array) -> jax.Array:
    """Keep the top `bits` bits of each 8-bit pixel; bits shape (B,)."""
    x = jnp.clip(images * 255.0, 0.0, 255.0).astype(jnp.int32)
    shift = (8 - bits).astype(jnp.int32)[:, None, None, None]
    x = jnp.right_shift(x, shift)
    x = jnp.left_shift(x, shift)
    return x.astype(jnp.float32) / 255.0


def adjust_gamma(images: jax.Array, gamma: jax.Array) -> jax.Array:
    """kornia adjust_gamma with gain 1: plain pow, no clamp (inputs are
    non-negative; pow(0, g) = 0 for the g > 0 range used here)."""
    return jnp.power(jnp.maximum(images, 0.0), gamma[:, None, None, None])


def adjust_contrast(images: jax.Array, factor: jax.Array) -> jax.Array:
    """Multiplicative contrast (kornia adjust_contrast), clamped to [0, 1]."""
    return jnp.clip(images * factor[:, None, None, None], 0.0, 1.0)


def adjust_brightness(images: jax.Array, factor: jax.Array) -> jax.Array:
    """Additive brightness shift of (factor - 1) (kornia RandomBrightness), clamped."""
    return jnp.clip(images + (factor - 1.0)[:, None, None, None], 0.0, 1.0)


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(images: jax.Array, ksize: int = 5, sigma: float = 1.5) -> jax.Array:
    """Separable depthwise gaussian blur with reflect padding (kornia default)."""
    C = images.shape[-1]
    k = jnp.asarray(_gaussian_kernel1d(ksize, sigma))
    pad = ksize // 2
    x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kern_h = jnp.tile(k[:, None, None, None], (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, kern_h, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    kern_w = jnp.tile(k[None, :, None, None], (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    return x


def _stage1_op(op_id: jax.Array, key: jax.Array, x: jax.Array) -> jax.Array:
    """Apply op `op_id` (traced) with its kornia per-sample probability."""
    B = x.shape[0]
    k_mask, k_param = jax.random.split(key)

    def gated(p, fn):
        m = jax.random.bernoulli(k_mask, p, (B,))
        return _per_sample_where(m, fn(), x)

    def do_equalize(x):
        impl = os.environ.get("NNTC_EQUALIZE_IMPL", "auto")
        if impl != "xla" and x.shape[-1] == 1 and (
            impl == "pallas" or jax.default_backend() != "cpu"
        ):
            # Per-sample VMEM kernel: histogram + LUT one-hots never touch
            # HBM (equalize_pallas.py). Same bernoulli draw as the XLA path.
            from neuralnet_tracker_traincode_tpu.augmentation.equalize_pallas import (
                equalize_pallas,
            )

            m = jax.random.bernoulli(k_mask, 0.2, (B,))
            flat = x[..., 0].reshape(B, -1)
            # NNTC_EQUALIZE_IMPL=pallas on a CPU backend runs the kernel in
            # interpret mode (no Mosaic lowering exists there).
            return equalize_pallas(
                flat, m, interpret=jax.default_backend() == "cpu"
            ).reshape(x.shape)
        return gated(0.2, lambda: equalize(x))

    def do_posterize(x):
        # kornia PosterizeGenerator truncates a continuous uniform(4, 6) draw
        # to int32, so bits land in {4, 5} (6 with probability zero).
        bits = jnp.floor(
            jax.random.uniform(k_param, (B,), minval=4.0, maxval=6.0)
        ).astype(jnp.int32)
        return gated(0.01, lambda: posterize(x, bits))

    def do_gamma(x):
        gamma = jax.random.uniform(k_param, (B,), minval=0.5, maxval=2.0)
        return gated(0.2, lambda: adjust_gamma(x, gamma))

    def do_contrast(x):
        contrast = jax.random.uniform(k_param, (B,), minval=0.7, maxval=1.5)
        return gated(0.2, lambda: adjust_contrast(x, contrast))

    def do_brightness(x):
        brightness = jax.random.uniform(k_param, (B,), minval=0.7, maxval=1.5)
        return gated(0.2, lambda: adjust_brightness(x, brightness))

    def do_blur(x):
        return gated(0.1, lambda: gaussian_blur(x, 5, 1.5))

    return jax.lax.switch(
        op_id, [do_equalize, do_posterize, do_gamma, do_contrast, do_brightness, do_blur], x
    )


def intensity_augmentation_stage1(
    key: jax.Array, images: jax.Array, random_apply: int = 4
) -> jax.Array:
    """Equalize/posterize/gamma/contrast/brightness/blur, kornia
    AugmentationSequential(random_apply=4) semantics: random op subset +
    order per batch, per-sample gating inside each selected op."""
    k_perm, k_ops = jax.random.split(key)
    perm = jax.random.permutation(k_perm, 6)

    def body(i, x):
        op = perm[i]
        return _stage1_op(op, jax.random.fold_in(k_ops, op), x)

    return jax.lax.fori_loop(0, random_apply, body, images)


def intensity_augmentation_noise(key: jax.Array, images: jax.Array) -> jax.Array:
    """Stacked gaussian noise at sigma 4/16/32/64 (over 255) with p = 0.25^k, then clip.

    The k independent gaussian layers sum to one gaussian with combined
    variance, so a single noise draw scaled per-sample by
    sqrt(sum(applied sigma_k^2)) is statistically identical to the reference's
    stacked kornia RandomGaussianNoise ops — one RNG pass instead of four.

    On TPU backends the per-pixel normal draw + add + clip run in a fused
    Pallas kernel on the hardware PRNG (`noise_pallas.py`; honest marginal
    cost 0.48 ms vs 1.84 ms threefry at b512 129^2) — same Bernoulli gating
    and sigma combination, a different (still key-deterministic) bit stream.
    Override with NNTC_NOISE_IMPL=xla|pallas.
    """
    B = images.shape[0]
    k_mask, k_noise = jax.random.split(key)
    sigmas = jnp.asarray([4.0, 16.0, 32.0, 64.0]) / 255.0
    probs = jnp.asarray([0.25, 0.25**2, 0.25**3, 0.25**4])
    applied = jax.random.bernoulli(k_mask, probs[None, :], (B, 4))
    sigma_combined = jnp.sqrt(jnp.sum(jnp.square(sigmas)[None, :] * applied, axis=-1))
    impl = os.environ.get("NNTC_NOISE_IMPL", "auto")
    if impl != "xla" and images.shape[-1] == 1 and (
        impl == "pallas" or jax.default_backend() != "cpu"
    ):
        if jax.default_backend() == "cpu":
            # The hardware-PRNG primitives (pltpu.prng_seed/prng_random_bits)
            # have no CPU interpret rule; the kernel MATH is CPU-covered via
            # the injected-bits variant (tests/test_noise_pallas.py).
            raise ValueError(
                "NNTC_NOISE_IMPL=pallas requires a TPU backend: the noise "
                "kernel uses the TPU hardware PRNG, which cannot run or be "
                "interpreted on CPU. Use NNTC_NOISE_IMPL=xla (or auto)."
            )
        from neuralnet_tracker_traincode_tpu.augmentation.noise_pallas import (
            add_gaussian_noise_pallas,
        )

        # One 32-bit draw + arange instead of B independent draws: B
        # independent seeds collide within a batch at ~B^2/2^33 per step
        # (~1 expected per 30k steps at b512), handing two samples the same
        # hardware-PRNG noise field. base + i is still key-deterministic
        # and collision-free within the batch by construction.
        base = jax.random.bits(k_noise, (), jnp.uint32)
        seeds = (base + jnp.arange(B, dtype=jnp.uint32)).astype(jnp.int32)
        return add_gaussian_noise_pallas(
            images[..., 0], seeds, sigma_combined
        )[..., None]
    # bf16 normals: half the threefry bit generation (the dominant cost of
    # this stage at b512: 2.8 ms -> ~1.4 ms); bf16's ~2.8 significant digits
    # are far below the smallest sigma (4/255), so the noise statistics are
    # unaffected.
    noise = jax.random.normal(k_noise, images.shape, dtype=jnp.bfloat16).astype(jnp.float32)
    x = images + noise * sigma_combined[:, None, None, None]
    return jnp.clip(x, 0.0, 1.0)


def intensity_augmentation(key: jax.Array, images: jax.Array) -> jax.Array:
    """Full intensity stack. The optimization barriers around stage1 are
    load-bearing: letting XLA:TPU fuse stage1 into the upstream warp gather
    (and the downstream noise) triggers a pathological lowering costing
    ~43 ms/step at batch 512 vs 0.4 ms with the barriers (measured on v5e;
    same family as the constant-gather slow path documented in warp.py).
    Barriers are identity ops — numerics are unchanged. Do not remove."""
    k1, k2 = jax.random.split(key)
    x = intensity_augmentation_stage1(k1, jax.lax.optimization_barrier(images))
    x = jax.lax.optimization_barrier(x)
    return intensity_augmentation_noise(k2, x)
