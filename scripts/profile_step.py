#!/usr/bin/env python
"""Slope-timing profile of the training-step components on the real chip.

Methodology (docs/PERFORMANCE.md): through the tunneled runtime the only
trustworthy fence is a value fetch, and per-program cost is the slope of
wall time over dispatch count with per-dispatch distinct arguments (the
runtime elides fully-identical dispatches). Run sections selectively:

    python scripts/profile_step.py step aug model dwconv
"""

import os
import sys
import time
from os.path import dirname, realpath

sys.path.insert(0, dirname(dirname(realpath(__file__))))

CACHE_DIR = os.path.join(dirname(dirname(realpath(__file__))), ".cache", "jax")

import jax

os.makedirs(CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("PROF_BATCH", 512))
REPS = int(os.environ.get("PROF_REPS", 30))


def slope(fn, make_args, n=REPS):
    """Seconds per call: enqueue n calls with distinct args, fence on a value.

    A single-leaf fence suffices: fn is a fixed jit returning every output,
    so the one compiled program completes as a whole — no DCE risk (that
    caveat applies to hand-built chains that thread only one leaf)."""
    out = fn(*make_args(0))
    leaves = [a for a in jax.tree_util.tree_leaves(out) if hasattr(a, "ravel")]
    if leaves:
        jax.device_get(leaves[0].ravel()[0])
    t0 = time.perf_counter()
    last = None
    for i in range(n):
        last = fn(*make_args(i + 1))
    leaf = jax.tree_util.tree_leaves(last)[0]
    jax.device_get(leaf.ravel()[0])
    return (time.perf_counter() - t0) / n


def section_dwconv():
    """XLA depthwise conv fwd/bwd vs shifted-add formulation, per-layer sizes."""
    sizes = [(65, 64), (33, 128), (17, 256), (9, 512), (5, 1024)]

    def conv_dw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )

    def shift_dw(x, w):
        # 3x3 depthwise as 9 shifted multiply-adds (VPU path, no conv lowering)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        H, W = x.shape[1], x.shape[2]
        acc = jnp.zeros_like(x)
        for i in range(3):
            for j in range(3):
                acc = acc + xp[:, i : i + H, j : j + W, :] * w[i, j, 0, :]
        return acc

    for hw, c in sizes:
        x0 = jnp.asarray(np.random.rand(B, hw, hw, c), jnp.bfloat16)
        w0 = jnp.asarray(np.random.rand(3, 3, 1, c), jnp.bfloat16)

        for name, f in (("conv", conv_dw), ("shift", shift_dw)):
            fwd = jax.jit(f)
            g = jax.jit(jax.grad(lambda x, w: jnp.sum(f(x, w).astype(jnp.float32)), argnums=(0, 1)))
            # multiplicative perturbation >= bf16 ulp so every buffer differs
            # (additive 1e-6 is below bf16 resolution for rand() data)
            tf = slope(fwd, lambda i: (x0 * (1 + jnp.bfloat16(i * 1e-2)), w0))
            tg = slope(g, lambda i: (x0 * (1 + jnp.bfloat16(i * 1e-2)), w0))
            print(f"dw {hw}x{hw}x{c:4d} {name:5s}: fwd {tf*1e3:7.3f} ms  grad {tg*1e3:7.3f} ms")


def _trainer():
    from neuralnet_tracker_traincode_tpu.augmentation.pipeline import TrainAugmentationConfig
    from neuralnet_tracker_traincode_tpu.data.fields import Tag
    from neuralnet_tracker_traincode_tpu.data.loader import LABEL_CATEGORIES
    from neuralnet_tracker_traincode_tpu.losses import losses as L, nll as NLL
    from neuralnet_tracker_traincode_tpu.losses.criterion import (
        Criterion,
        CriterionGroup,
        MaskedMultiTaskCriterion,
    )
    from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead
    from neuralnet_tracker_traincode_tpu.parallel.mesh import make_mesh, shard_batch
    from neuralnet_tracker_traincode_tpu.train.loop import PoseTrainer, TrainerConfig

    model = NetworkWithPointHead(
        enable_point_head=True, enable_uncertainty=True, config="mobilenetv1",
        dtype=jnp.bfloat16,
    )
    criterion = MaskedMultiTaskCriterion(
        {
            Tag.POSE_WITH_LANDMARKS: CriterionGroup(
                [
                    Criterion("nllrot", NLL.QuatPoseNLLLoss(), 0.005),
                    Criterion("nllcoord", NLL.CorrelatedCoordPoseNLLLoss(), 0.005),
                    Criterion("rot", L.QuatPoseLoss("approx_distance"), 1.0),
                    Criterion("xy", L.PoseXYLoss("l2"), 0.25),
                    Criterion("sz", L.PoseSizeLoss("l2"), 0.25),
                    Criterion("points3d", L.Points3dLoss("l2", chin_weight=0.8), 0.5),
                    Criterion("box", L.BoxLoss("l2"), 0.01),
                    Criterion("quatreg", L.QuaternionNormalizationSoftConstraint(), 1e-6),
                ]
            )
        },
        [Tag.POSE_WITH_LANDMARKS],
    )
    cfg = TrainerConfig(
        batchsize=B, epochs=100, samples_per_epoch=10240,
        aug=TrainAugmentationConfig(inputsize=129, enable_image_aug=True),
    )
    mesh = make_mesh()
    trainer = PoseTrainer(model, criterion, cfg, LABEL_CATEGORIES, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (129, 129, 1))
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 256, size=(B, 448, 448, 1), dtype=np.uint8),
        "pose": np.tile(np.asarray([0.0, 0, 0, 1], np.float32), (B, 1)),
        "coord": (rng.rand(B, 3) * 100 + 100).astype(np.float32),
        "roi": np.tile(np.asarray([100.0, 100, 350, 350], np.float32), (B, 1)),
        "pt3d_68": (rng.rand(B, 68, 3) * 200 + 100).astype(np.float32),
        "shapeparam": rng.randn(B, 50).astype(np.float32),
        "hasface": np.full((B,), 0.9, np.float32),
        "coord_convention_id": np.zeros((B,), np.int32),
        "tag_id": np.zeros((B,), np.int32),
        "dataset_weight": np.ones((B,), np.float32),
        "param_index": np.arange(B, dtype=np.int32),
    }
    sharded = shard_batch(batch, mesh)
    return trainer, state, sharded, mesh


def section_step():
    trainer, state, sharded, _ = _trainer()
    W = trainer.weight_matrix(50)
    key = jax.random.PRNGKey(7)

    # train_step donates the state (donate_argnums=(0,)), so the returned
    # state must be threaded through — reusing the original raises
    # 'Array has been deleted' on the second call.
    def run(i):
        nonlocal state
        state, m = trainer.train_step(state, sharded, W, jax.random.fold_in(key, i))
        return m["loss"]

    t = slope(lambda i: run(i), lambda i: (i,))
    print(f"full train_step: {t*1e3:.2f} ms  ({B/t:.0f} img/s)")


def section_aug():
    from neuralnet_tracker_traincode_tpu.augmentation.pipeline import (
        TrainAugmentationConfig,
        augment_batch_for_training,
    )
    from neuralnet_tracker_traincode_tpu.augmentation import intensity as I
    from neuralnet_tracker_traincode_tpu.data.loader import LABEL_CATEGORIES

    cfg = TrainAugmentationConfig(inputsize=129, enable_image_aug=True)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, size=(B, 448, 448, 1), dtype=np.uint8))
    labels = {
        "pose": jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (B, 1)),
        "coord": jnp.asarray(rng.rand(B, 3) * 100 + 100, jnp.float32),
        "roi": jnp.tile(jnp.asarray([100.0, 100, 350, 350]), (B, 1)),
        "pt3d_68": jnp.asarray(rng.rand(B, 68, 3) * 200 + 100, jnp.float32),
    }
    cats = {k: LABEL_CATEGORIES[k] for k in labels}
    key = jax.random.PRNGKey(3)

    f = jax.jit(lambda k: augment_batch_for_training(k, img, labels, cats, cfg)[0])
    t = slope(f, lambda i: (jax.random.fold_in(key, i),))
    print(f"aug program:     {t*1e3:.2f} ms")

    x129 = jnp.asarray(rng.rand(B, 129, 129, 1), jnp.float32)
    f1 = jax.jit(lambda k: I.intensity_augmentation_stage1(k, jax.lax.optimization_barrier(x129)))
    t1 = slope(f1, lambda i: (jax.random.fold_in(key, i),))
    print(f"intensity stage1:{t1*1e3:.2f} ms")
    f2 = jax.jit(lambda k: I.intensity_augmentation_noise(k, x129))
    t2 = slope(f2, lambda i: (jax.random.fold_in(key, i),))
    print(f"intensity noise: {t2*1e3:.2f} ms")


def section_model():
    trainer, state, sharded, _ = _trainer()
    from neuralnet_tracker_traincode_tpu.augmentation.pipeline import (
        augment_batch_for_training,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 129, 129, 1), jnp.float32)
    cid = jnp.zeros((B,), jnp.int32)

    def fwd(params, x):
        return trainer.model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x, cid, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )

    jf = jax.jit(fwd)
    t = slope(jf, lambda i: (state.params, x + i * 1e-6))
    print(f"model fwd:       {t*1e3:.2f} ms")

    def loss_of(params, x):
        out, _ = fwd(params, x)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(out))

    jg = jax.jit(jax.grad(loss_of))
    tg = slope(jg, lambda i: (state.params, x + i * 1e-6))
    print(f"model fwd+bwd:   {tg*1e3:.2f} ms")


def section_layout():
    """NHWC vs NCHW per-layer conv timing + stem input-channel padding.

    VERDICT r4 weak #5: the two unexplored perf hypotheses on the model
    program. Times every distinct MobileNetV1 conv shape (b512, 129^2 input)
    fwd and fwd+bwd under both feature layouts, and the 1-channel stem vs an
    8-channel zero-padded stem (checkpoint-convertible: pad weights on load,
    slice on save — numerically identical up to fp). Projected whole-model
    deltas are the shape-count-weighted sums.

    Methodology: per-layer costs here are ~0.03-3 ms — far below the ~2-7 ms
    per-dispatch noise floor, so slope-over-dispatch is useless (a first cut
    measured fwd > fwd+bwd). Each number is the CHAINED in-program marginal
    (docs/PERFORMANCE.md round-4 refinement): K applications inside ONE jit,
    serialized through a scalar accumulator folded into the WEIGHTS (cheap —
    perturbing x would add a full read+write of the activation per link),
    K=1 vs K=9 slope. The grad chain accumulates sum(y^2) so the cotangent
    is dense and data-dependent (sum(y) lets XLA constant-fold the backward).
    """
    rng = np.random.RandomState(0)
    K_LO, K_HI = 1, 9

    def conv(x, w, stride, dn, groups=1):
        pad = [(w.shape[0] // 2, w.shape[0] // 2)] * 2
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad, dimension_numbers=dn,
            feature_group_count=groups,
        )

    def chain_fwd(K, stride, dn, groups):
        def run(x, w):
            acc = jnp.float32(0.0)
            for _ in range(K):
                wk = jax.lax.optimization_barrier(
                    w * (1 + acc * 1e-20).astype(w.dtype))
                y = conv(x, wk, stride, dn, groups)
                acc = jnp.sum(y.astype(jnp.float32))
            return acc
        return run

    def chain_loss(K, stride, dn, groups):
        def run(x, w):
            acc = jnp.float32(0.0)
            for _ in range(K):
                wk = jax.lax.optimization_barrier(
                    w * (1 + acc * 1e-20).astype(w.dtype))
                y = conv(x, wk, stride, dn, groups)
                acc = jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
            return acc
        return run

    def chained_ms(make, x, w):
        """(t[K_HI] - t[K_LO]) / (K_HI - K_LO) in ms, min of 2 rounds."""
        fns = {K: jax.jit(make(K)) for K in (K_LO, K_HI)}
        times = {}
        for _ in range(2):
            for K, f in fns.items():
                t = slope(f, lambda i: (x * (1 + jnp.bfloat16(i * 1e-2)), w),
                          n=max(4, REPS // 6))
                times[K] = min(times.get(K, float("inf")), t)
        return (times[K_HI] - times[K_LO]) / (K_HI - K_LO) * 1e3

    def time_pair(S, cin, cout, k, stride, groups, count):
        """Returns {(layout): (fwd_ms, fwdbwd_ms)} for one conv shape."""
        res = {}
        for layout in ("NHWC", "NCHW"):
            if layout == "NHWC":
                dn = ("NHWC", "HWIO", "NHWC")
                xs = (B, S, S, cin)
            else:
                dn = ("NCHW", "HWIO", "NCHW")
                xs = (B, cin, S, S)
            ws = (k, k, cin // groups, cout)
            # bf16, matching the model program's dtype (posenet dtype=bfloat16)
            x = jnp.asarray(rng.rand(*xs), jnp.bfloat16)
            w = jnp.asarray(rng.rand(*ws) * 0.01, jnp.bfloat16)
            tf = chained_ms(lambda K: chain_fwd(K, stride, dn, groups), x, w)
            tg = chained_ms(
                lambda K: jax.grad(chain_loss(K, stride, dn, groups), argnums=(0, 1)),
                x, w)
            res[layout] = (tf, tg)
        return res

    # (S_in, cin, cout, k, stride, groups, occurrences) — every distinct
    # MobileNetV1 conv shape at width 1.0 (mobilenet_v1.py:90-116).
    shapes = [
        ("stem 5x5 s2", 129, 1, 32, 5, 2, 1, 1),
        ("stem 5x5 s2 pad8", 129, 8, 32, 5, 2, 1, 1),
        ("dw 65^2 c32", 65, 32, 32, 3, 1, 32, 1),
        ("pw 65^2 32->64", 65, 32, 64, 1, 1, 1, 1),
        ("dw 65^2 c64 s2", 65, 64, 64, 3, 2, 64, 1),
        ("pw 33^2 64->128", 33, 64, 128, 1, 1, 1, 1),
        ("dw 33^2 c128", 33, 128, 128, 3, 1, 128, 1),
        ("pw 33^2 128->128", 33, 128, 128, 1, 1, 1, 1),
        ("dw 33^2 c128 s2", 33, 128, 128, 3, 2, 128, 1),
        ("pw 17^2 128->256", 17, 128, 256, 1, 1, 1, 1),
        ("dw 17^2 c256", 17, 256, 256, 3, 1, 256, 1),
        ("pw 17^2 256->256", 17, 256, 256, 1, 1, 1, 1),
        ("dw 17^2 c256 s2", 17, 256, 256, 3, 2, 256, 1),
        ("pw 9^2 256->512", 9, 256, 512, 1, 1, 1, 1),
        ("dw 9^2 c512", 9, 512, 512, 3, 1, 512, 5),
        ("pw 9^2 512->512", 9, 512, 512, 1, 1, 1, 5),
        ("dw 9^2 c512 s2", 9, 512, 512, 3, 2, 512, 1),
        ("pw 5^2 512->1024", 5, 512, 1024, 1, 1, 1, 1),
        ("dw 5^2 c1024", 5, 1024, 1024, 3, 1, 1024, 1),
        ("pw 5^2 1024->1024", 5, 1024, 1024, 1, 1, 1, 1),
    ]
    # PROF_LAYOUT_SHAPES=n caps the sweep (smoke tests / partial reruns;
    # the persistent compile cache makes resuming cheap).
    cap = int(os.environ.get("PROF_LAYOUT_SHAPES", len(shapes)))
    shapes = shapes[:cap]
    tot = {"NHWC": [0.0, 0.0], "NCHW": [0.0, 0.0]}
    print(f"{'layer':24} {'NHWC f/fb ms':>16} {'NCHW f/fb ms':>16}")
    for name, S, cin, cout, k, stride, groups, count in shapes:
        r = time_pair(S, cin, cout, k, stride, groups, count)
        print(f"{name:24} {r['NHWC'][0]:7.3f}/{r['NHWC'][1]:7.3f} "
              f"{r['NCHW'][0]:7.3f}/{r['NCHW'][1]:7.3f}  x{count}")
        if "pad8" not in name:  # the padded stem is an alternative, not additive
            for lay in tot:
                tot[lay][0] += r[lay][0] * count
                tot[lay][1] += r[lay][1] * count
    for lay, (f, fb) in tot.items():
        print(f"TOTAL {lay}: fwd {f:.2f} ms, fwd+bwd {fb:.2f} ms")


if __name__ == "__main__":
    want = set(sys.argv[1:]) or {"step"}
    for name in ("dwconv", "aug", "model", "step", "layout"):
        if name in want:
            print(f"== {name} (batch {B}) ==")
            globals()[f"section_{name}"]()
