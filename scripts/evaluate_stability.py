#!/usr/bin/env python
"""Temporal / robustness analyses of pose networks.

Contract: `scripts/evaluate_stability.py` of the reference. Modes:
  open-loop      — track video frames with GT rois; blink-window MSE report
  closed-loop    — feed each frame the previous prediction's roi
  pitch-yaw      — pitch-vs-yaw sweeps on the yaw video + Biwi sections
  noise-resist   — geodesic error vs additive input noise level
  uncertainty-correlation — predicted pose uncertainty vs actual error
  variation-resist — prediction spread under expression/background variation

Figures are saved to --outdir (headless-friendly) instead of an interactive
window.
"""

import argparse
import itertools
import os
import pickle
import sys
from collections import defaultdict
from os.path import dirname, isdir, join, realpath
from typing import Dict, List, NamedTuple

import numpy as np

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))

import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot

from neuralnet_tracker_traincode_tpu import pipelines, utils
from neuralnet_tracker_traincode_tpu.data.batch import Batch
from neuralnet_tracker_traincode_tpu.eval import metrics as M
from neuralnet_tracker_traincode_tpu.eval.predictor import Predictor

# Blink frame intervals of the bundled "myself" video (developer recordings).
BLINKS = [(90, 110), (570, 590), (1610, 1630), (2000, 2020)]

# --max-samples: cap every analysis to the first N samples (smoke tests,
# quick looks). None = full datasets.
MAX_SAMPLES = None


def _limit(loader):
    if MAX_SAMPLES is None:
        return loader
    return list(itertools.islice(iter(loader), MAX_SAMPLES))


def _find_models(path: str) -> List[str]:
    if isdir(path):
        out = []
        for fn in sorted(os.listdir(path)):
            if fn.endswith((".ckpt", ".nnckpt", ".onnx")):
                out.append(join(path, fn))
        return out
    return [path]


class Poses(NamedTuple):
    hpb: np.ndarray  # (N, 3) heading/pitch/bank
    xy: np.ndarray  # (N, 2)
    sz: np.ndarray  # (N,)


def convertlabels(labels: Dict[str, np.ndarray]) -> Poses:
    rot = utils.convert_to_rot(np.asarray(labels["pose"]))
    coord = np.asarray(labels["coord"])
    return Poses(
        hpb=utils.as_hpb(rot), xy=coord[:, :2], sz=coord[:, 2]
    )


def report_blink_stability(poses_list: List[Poses], blinks=None):
    blinks = blinks or BLINKS
    # Short sequences (tests, truncated recordings): keep only windows that
    # fit; at least report nothing rather than index out of bounds.
    n = min(len(p.hpb) for p in poses_list)
    blinks = [(a, b) for a, b in blinks if b + 5 < n and a - 5 >= 0]
    if not blinks:
        print("\t (sequence too short for the blink windows)")
        return
    xs = np.asarray([a for a, b in blinks] + [b for a, b in blinks], dtype=np.int64)
    lefts, rights = xs - 5, xs + 5

    def mse(vals):
        return np.sqrt(np.mean(np.square(vals[lefts] - vals[rights]), axis=0))

    for name in ["hpb", "sz", "xy"]:
        vals = np.average([np.atleast_1d(mse(getattr(p, name))) for p in poses_list], axis=0)
        if name == "hpb":
            vals = vals * 180.0 / np.pi
        print(f"\t {name:4s}: " + ", ".join(f"{x:0.2f}" for x in np.atleast_1d(vals)))


def open_loop_tracking(predictor: Predictor, loader) -> Poses:
    metric = M.MetricCollection(
        {"pose": M.PredExtractor("pose"), "coord": M.PredExtractor("coord")}
    )
    preds = predictor.evaluate(metric, loader)
    return convertlabels(preds)


def closed_loop_tracking(predictor: Predictor, loader) -> Poses:
    current_roi = None
    poses, coords = [], []
    for sample in loader:
        image = np.asarray(sample["image"])
        roi = np.asarray(sample["roi"], np.float32)
        if current_roi is not None:
            roi = current_roi
        pred = predictor.predict_batch([image], roi[None, :])
        x0, y0, x1, y1 = np.asarray(pred["roi"])[0]
        h, w = image.shape[:2]
        current_roi = np.asarray(
            [max(0.0, x0), max(0.0, y0), min(x1, w), min(y1, h)], np.float32
        )
        poses.append(np.asarray(pred["pose"])[0])
        coords.append(np.asarray(pred["coord"])[0])
    return convertlabels({"pose": np.stack(poses), "coord": np.stack(coords)})


def _track(paths, loader_name, tracking_fn, outdir):
    loader = _limit(pipelines.make_validation_loader(loader_name))
    poses_by_path = defaultdict(list)
    for crop_size_factor in [1.0, 1.2]:
        fig, axes = pyplot.subplots(3, 1, figsize=(14, 8), sharex=True)
        for path in paths:
            for checkpoint in _find_models(path):
                predictor = Predictor(checkpoint, focus_roi_expansion_factor=crop_size_factor)
                poses = tracking_fn(predictor, loader)
                poses_by_path[path].append(poses)
                axes[0].plot(poses.hpb * 180 / np.pi)
                axes[1].plot(poses.xy)
                axes[2].plot(poses.sz)
        axes[0].set(ylabel="hpb [deg]")
        axes[1].set(ylabel="xy")
        axes[2].set(ylabel="size")
        fig.suptitle(f"crop={crop_size_factor}")
        fn = join(outdir, f"tracking_crop{crop_size_factor:.1f}.pdf")
        fig.savefig(fn)
        print(f"saved {fn}")
    for path in paths:
        print(f"Checkpoint: {path} (blink-window MSE)")
        report_blink_stability(poses_by_path[path])


def main_open_loop(paths, outdir):
    _track(paths, "myself", open_loop_tracking, outdir)


def main_closed_loop(paths, outdir):
    _track(paths, "myself", closed_loop_tracking, outdir)


def _biwi_sections_loader():
    intervals = [(145, 216), (1360, 1464), (3030, 3120), (8020, 8100), (6570, 6600), (9030, 9080)]
    if MAX_SAMPLES is not None:
        # Truncate the INTERVAL list so sequence_starts stays consistent with
        # the limited frame stream (a plain _limit would desynchronize the
        # per-section slicing).
        left, kept = MAX_SAMPLES, []
        for a, b in intervals:
            n = min(b - a, left)
            if n <= 0:
                break
            kept.append((a, a + n))
            left -= n
        intervals = kept
    indices = np.concatenate([np.arange(a, b) for a, b in intervals])
    loader = pipelines.make_validation_loader("biwi", order=indices)
    sequence_starts = np.cumsum([0] + [(b - a) for a, b in intervals])
    return loader, sequence_starts


def main_analyze_pitch_vs_yaw(paths, outdir):
    fig, axes = pyplot.subplots(2, 1, figsize=(20, 8))

    def predict_all(loader):
        out = {}
        for path in paths:
            predictor = Predictor(path)
            metric = M.MetricCollection(
                {"pose": M.PredExtractor("pose"), "coord": M.PredExtractor("coord")}
            )
            poses = convertlabels(predictor.evaluate(metric, loader))
            out[path] = poses._replace(hpb=poses.hpb * 180.0 / np.pi)
        return out

    loader = _limit(pipelines.make_validation_loader("myself_yaw"))
    for name, poses in predict_all(loader).items():
        axes[0].scatter(poses.hpb[:, 0], poses.hpb[:, 1], label=name, s=5.0)
    axes[0].set(xlabel="yaw", ylabel="pitch")
    axes[0].legend()

    loader, starts = _biwi_sections_loader()
    for j, (name, poses) in enumerate(predict_all(loader).items()):
        for i, (a, b) in enumerate(zip(starts[:-1], starts[1:])):
            axes[1].plot(poses.hpb[a:b, 0], poses.hpb[a:b, 1], c="rgbcmy"[i % 6],
                         alpha=1.0 if j == 0 else 0.5)
    axes[1].set(xlabel="yaw", ylabel="pitch")
    fn = join(outdir, "pitch_vs_yaw.pdf")
    fig.savefig(fn)
    print(f"saved {fn}")


def main_analyze_noise_resist(paths, outdir, noiselevels=(0.0, 2.0, 8.0, 16.0, 32.0, 48.0, 64.0)):
    """Geodesic error vs gaussian input-noise sigma (on [0,255] scale)."""
    rng = np.random.RandomState(1234)
    metrics_by_noise = defaultdict(list)
    for path in paths:
        for checkpoint in _find_models(path):
            predictor = Predictor(checkpoint, focus_roi_expansion_factor=1.2)
            loader = _limit(pipelines.make_validation_loader("aflw2k3d", use_head_roi=True))
            samples = list(loader)
            for noiselevel in noiselevels:
                metric = M.GeodesicError()
                for chunk in utils.iter_batched(iter(samples), 128):
                    images = []
                    for s in chunk:
                        im = np.asarray(s["image"], np.float32)
                        im = im + rng.randn(*im.shape) * noiselevel
                        images.append(np.clip(im, 0, 255).astype(np.uint8))
                    batch = Batch.collate([s.copy() for s in chunk])
                    rois = np.stack([np.asarray(s["roi"]) for s in chunk])
                    preds = predictor.predict_batch(images, rois)
                    metric.update(preds, batch)
                err = float(np.mean(metric.compute()))
                metrics_by_noise[noiselevel].append(err)
                print(f"{checkpoint} noise={noiselevel}: geo err {err * 180 / np.pi:.2f} deg")

    fig, ax = pyplot.subplots(1, 1)
    levels = list(noiselevels)
    values = np.asarray([metrics_by_noise[l] for l in levels]) * 180.0 / np.pi
    ax.errorbar(levels, values.mean(axis=-1), yerr=values.std(axis=-1), capsize=10.0)
    ax.set(xlabel="input noise", ylabel="rot err [deg]")
    fn = join(outdir, "noise_resist.pdf")
    fig.savefig(fn)
    with open(join(outdir, "noise_resist.pkl"), "wb") as f:
        pickle.dump((levels, dict(metrics_by_noise)), f)
    print(f"saved {fn}")


def main_analyze_uncertainty_error_correlation(paths, outdir):
    fig, ax = pyplot.subplots(1, 1, dpi=120, figsize=(4, 3))
    for path in paths:
        for checkpoint in _find_models(path):
            predictor = Predictor(checkpoint, focus_roi_expansion_factor=1.2)
            loader = _limit(pipelines.make_validation_loader("aflw2k3d", use_head_roi=True))
            metric = M.MetricCollection(
                {
                    "pose": M.GeodesicError(),
                    "pose_scales_tril": M.PredExtractor("pose_scales_tril"),
                }
            )
            results = predictor.evaluate(metric, loader)
            tril = np.asarray(results["pose_scales_tril"])
            cov = np.matmul(tril, np.swapaxes(tril, -1, -2))
            uncertainty = np.sqrt(np.linalg.norm(cov, axis=(-1, -2)))
            rot_err = np.asarray(results["pose"])
            ax.scatter(rot_err * 180 / np.pi, uncertainty * 180 / np.pi, s=10.0, alpha=0.5,
                       edgecolor="none", rasterized=True)
            corr = np.corrcoef(rot_err, uncertainty)[0, 1]
            print(f"{checkpoint}: corr(err, uncertainty) = {corr:.3f}")
    ax.set(xlabel="geo. err. deg", ylabel="uncertainty deg")
    ax.grid()
    fn = join(outdir, "uncertainty_vs_err.pdf")
    fig.savefig(fn)
    print(f"saved {fn}")


def main_analyze_stability_vs_variations(paths, outdir):
    """Prediction spread within dataset 'sequences' that vary expression /
    background with the pose held fixed (replicantface-stability protocol)."""
    from scipy.spatial.transform import Rotation

    from neuralnet_tracker_traincode_tpu.eval.alignment import compute_mean_rotation

    loader = _limit(pipelines.make_validation_loader("replicantface-stability"))
    fig, ax = pyplot.subplots(1, 1, figsize=(8, 8))
    for path in paths:
        for checkpoint in _find_models(path):
            predictor = Predictor(checkpoint, focus_roi_expansion_factor=1.2)
            metric = M.MetricCollection(
                {
                    "pose": M.PredExtractor("pose"),
                    "individual": M.LabelExtractor("individual"),
                    "pose_gt": M.LabelExtractor("pose"),
                }
            )
            results = predictor.evaluate(metric, loader)
            quats = np.asarray(results["pose"])
            individuals = np.asarray(results["individual"])
            means, deviations = [], []
            for ind in np.unique(individuals):
                rots = Rotation.from_quat(quats[individuals == ind])
                mean = compute_mean_rotation(rots)
                means.append(mean)
                deviations.append(np.mean((mean.inv() * rots).magnitude()))
            hpb = utils.as_hpb(Rotation.concatenate(means)) * 180 / np.pi
            ax.scatter(hpb[:, 0], hpb[:, 1], s=40.0, marker="x", label=checkpoint[-20:])
            print(
                f"{checkpoint}: mean deviation "
                f"{np.average(deviations) * 180 / np.pi:.2f} deg"
            )
    gt = utils.as_hpb(
        Rotation.from_quat(np.asarray(results["pose_gt"]))
    )
    ax.scatter(gt[:, 0] * 180 / np.pi, gt[:, 1] * 180 / np.pi, c="k", marker="+", label="GT")
    ax.set(xlabel="yaw [deg]", ylabel="pitch [deg]")
    ax.legend()
    fn = join(outdir, "variation_resist.pdf")
    fig.savefig(fn)
    print(f"saved {fn}")


def main(argv=None):
    global MAX_SAMPLES
    np.seterr(all="raise")
    parser = argparse.ArgumentParser(description="Evaluates model stability")
    parser.add_argument(
        "mode",
        choices=[
            "closed-loop", "pitch-yaw", "open-loop", "noise-resist",
            "uncertainty-correlation", "variation-resist",
        ],
    )
    parser.add_argument("filename", nargs="+", type=str)
    parser.add_argument("--outdir", default="/tmp/stability", type=str)
    parser.add_argument("--max-samples", type=int, default=None,
                        help="cap every analysis to the first N samples")
    args = parser.parse_args(argv)
    MAX_SAMPLES = args.max_samples
    os.makedirs(args.outdir, exist_ok=True)
    dispatch = {
        "open-loop": main_open_loop,
        "closed-loop": main_closed_loop,
        "pitch-yaw": main_analyze_pitch_vs_yaw,
        "noise-resist": main_analyze_noise_resist,
        "uncertainty-correlation": main_analyze_uncertainty_error_correlation,
        "variation-resist": main_analyze_stability_vs_variations,
    }
    dispatch[args.mode](args.filename, args.outdir)


if __name__ == "__main__":
    main()
