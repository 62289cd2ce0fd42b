"""Harden tests/refstubs.py against stub-vs-upstream drift.

The cross-implementation parity suite instantiates the REAL reference torch
code on top of reimplemented torchvision/kornia building blocks (refstubs).
If a stub deviated from upstream, reference-on-stubs and our code could agree
with each other yet both differ from a real reference-trained checkpoint
(round-2 verdict, weak #2). Real torchvision cannot run in this image, so the
stubs are pinned two independent ways:

 1. numpy oracles: every stub block is re-evaluated with hand-rolled
    scipy/numpy convolutions from the documented upstream semantics —
    a second, torch-free implementation that must agree elementwise.
 2. frozen goldens: literal output values committed below; any future edit
    to a stub that changes numerics fails loudly even if it stays
    self-consistent.

Weights are deterministic arange/cosine fills so every tap of every kernel
participates.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from scipy import signal  # noqa: E402

import refstubs  # noqa: E402

refstubs.install()


def _fill(module):
    """Deterministic, non-symmetric parameter fill."""
    i = 0
    with torch.no_grad():
        for p in module.parameters():
            n = p.numel()
            p.copy_(torch.cos(torch.arange(i, i + n, dtype=torch.float64) * 0.7).view(p.shape) * 0.5)
            i += n
        for name, b in module.named_buffers():
            n = b.numel()
            if name.endswith("running_mean"):
                b.copy_(torch.sin(torch.arange(n, dtype=torch.float64)).view(b.shape) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(1.0 + 0.5 * torch.cos(torch.arange(n, dtype=torch.float64)).view(b.shape).abs())


def np_conv2d(x, w, bias=None, stride=1, padding=0, groups=1):
    """NCHW direct convolution oracle (scipy correlate2d per channel)."""
    N, C, H, W = x.shape
    O, Cg, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    out_h = (H + 2 * padding - kh) // stride + 1
    out_w = (W + 2 * padding - kw) // stride + 1
    out = np.zeros((N, O, out_h, out_w))
    per_group_in = C // groups
    per_group_out = O // groups
    for n in range(N):
        for o in range(O):
            g = o // per_group_out
            acc = np.zeros((H + 2 * padding - kh + 1, W + 2 * padding - kw + 1))
            for ci in range(per_group_in):
                acc += signal.correlate2d(
                    xp[n, g * per_group_in + ci], w[o, ci], mode="valid"
                )
            out[n, o] = acc[::stride, ::stride]
            if bias is not None:
                out[n, o] += bias[o]
    return out


def np_bn(x, weight, bias, mean, var, eps=1e-5):
    return (x - mean[:, None, None]) / np.sqrt(var[:, None, None] + eps) * weight[
        :, None, None
    ] + bias[:, None, None]


def _x(shape, scale=1.0):
    return (np.cos(np.arange(np.prod(shape)) * 0.31).reshape(shape) * scale).astype(np.float64)


def test_pascal_kernel_is_binomial():
    k = refstubs.get_pascal_kernel_2d(3, norm=True).numpy()
    np.testing.assert_allclose(k, np.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]]) / 16.0)
    k5 = refstubs.get_pascal_kernel_1d(5).numpy()
    np.testing.assert_allclose(k5, [1, 4, 6, 4, 1])


def test_blur_pool_matches_numpy():
    x = _x((1, 3, 8, 8))
    k = refstubs.get_pascal_kernel_2d(3, norm=True).numpy()
    w = np.broadcast_to(k, (3, 1, 3, 3)).copy()
    got = refstubs._blur_pool_by_kernel2d(
        torch.from_numpy(x).float(), torch.from_numpy(w).float(), stride=2
    ).numpy()
    want = np_conv2d(x, w, stride=2, padding=1, groups=3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_basic_block_matches_numpy():
    torch.manual_seed(0)
    blk = refstubs.BasicBlock(
        4, 6, stride=2,
        downsample=torch.nn.Sequential(
            refstubs.conv1x1(4, 6, 2), torch.nn.BatchNorm2d(6)
        ),
    )
    _fill(blk)
    blk.eval()
    x = _x((1, 4, 9, 9))
    with torch.no_grad():
        got = blk(torch.from_numpy(x).float()).numpy()

    sd = {k: v.numpy().astype(np.float64) for k, v in blk.state_dict().items()}
    h = np_conv2d(x, sd["conv1.weight"], stride=2, padding=1)
    h = np.maximum(np_bn(h[0], sd["bn1.weight"], sd["bn1.bias"], sd["bn1.running_mean"], sd["bn1.running_var"]), 0)[None]
    h = np_conv2d(h, sd["conv2.weight"], stride=1, padding=1)
    h = np_bn(h[0], sd["bn2.weight"], sd["bn2.bias"], sd["bn2.running_mean"], sd["bn2.running_var"])[None]
    idn = np_conv2d(x, sd["downsample.0.weight"], stride=2, padding=0)
    idn = np_bn(idn[0], sd["downsample.1.weight"], sd["downsample.1.bias"],
                sd["downsample.1.running_mean"], sd["downsample.1.running_var"])[None]
    want = np.maximum(h + idn, 0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_inverted_residual_matches_numpy():
    torch.manual_seed(0)
    blk = refstubs._InvertedResidual(4, 4, kernel_size=3, stride=1, expansion_factor=2)
    _fill(blk)
    blk.eval()
    assert blk.apply_residual
    x = _x((1, 4, 7, 7), scale=0.5)
    with torch.no_grad():
        got = blk(torch.from_numpy(x).float()).numpy()

    sd = {k: v.numpy().astype(np.float64) for k, v in blk.state_dict().items()}
    h = np_conv2d(x, sd["layers.0.weight"], padding=0)
    h = np.maximum(np_bn(h[0], sd["layers.1.weight"], sd["layers.1.bias"],
                         sd["layers.1.running_mean"], sd["layers.1.running_var"], eps=1e-5)[None], 0)
    h = np_conv2d(h, sd["layers.3.weight"], stride=1, padding=1, groups=8)
    h = np.maximum(np_bn(h[0], sd["layers.4.weight"], sd["layers.4.bias"],
                         sd["layers.4.running_mean"], sd["layers.4.running_var"])[None], 0)
    h = np_conv2d(h, sd["layers.6.weight"], padding=0)
    h = np_bn(h[0], sd["layers.7.weight"], sd["layers.7.bias"],
              sd["layers.7.running_mean"], sd["layers.7.running_var"])[None]
    want = h + x
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_efficientnet_mbconv_matches_numpy():
    torch.manual_seed(0)
    cnf = refstubs._EfMBConvConfig(6, 3, 1, 8, 8, 1, 1.0, 1.0)
    blk = refstubs._EfMBConv(cnf, stochastic_depth_prob=0.5, norm_layer=torch.nn.BatchNorm2d)
    _fill(blk)
    blk.eval()  # stochastic depth must be identity at eval
    x = _x((1, 8, 6, 6), scale=0.3)
    with torch.no_grad():
        got = blk(torch.from_numpy(x).float()).numpy()

    sd = {k: v.numpy().astype(np.float64) for k, v in blk.state_dict().items()}

    def silu(v):
        return v / (1.0 + np.exp(-v))

    def cna(v, p, stride=1, padding=0, groups=1, act=True):
        v = np_conv2d(v, sd[p + ".0.weight"], stride=stride, padding=padding, groups=groups)
        v = np_bn(v[0], sd[p + ".1.weight"], sd[p + ".1.bias"],
                  sd[p + ".1.running_mean"], sd[p + ".1.running_var"])[None]
        return silu(v) if act else v

    h = cna(x, "block.0")                      # expand 8 -> 48
    h = cna(h, "block.1", padding=1, groups=48)  # depthwise
    s = h.mean(axis=(2, 3), keepdims=True)     # SE
    s = silu(np_conv2d(s, sd["block.2.fc1.weight"], sd["block.2.fc1.bias"]))
    s = 1.0 / (1.0 + np.exp(-np_conv2d(s, sd["block.2.fc2.weight"], sd["block.2.fc2.bias"])))
    h = h * s
    h = cna(h, "block.3", act=False)           # project 48 -> 8
    want = h + x                               # residual (stride 1, in == out)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------- frozen goldens

# Values produced by the stubs at the commit introducing this file; a change
# in stub numerics (even a self-consistent one) shifts these.


def test_frozen_golden_basic_block():
    torch.manual_seed(0)
    blk = refstubs.BasicBlock(2, 2)
    _fill(blk)
    blk.eval()
    x = _x((1, 2, 4, 4), scale=0.5)
    with torch.no_grad():
        got = blk(torch.from_numpy(x).float()).numpy()
    golden = np.asarray(
        [0.3165118, 0.30708098, 0.25575525, 0.08979283, 0.0226476, 0.0, 0.0, 0.0]
    )
    np.testing.assert_allclose(got[0, 0].ravel()[:8], golden, atol=1e-5)


def test_frozen_golden_gaussian_blur():
    x = _x((1, 1, 6, 6))
    with torch.no_grad():
        got = refstubs.gaussian_blur2d(torch.from_numpy(x).float(), 5, 1.5).numpy()
    golden = np.asarray([-0.12904976, -0.15114772, -0.2040769, -0.2607781])
    np.testing.assert_allclose(got[0, 0, 0, :4], golden, atol=1e-5)
