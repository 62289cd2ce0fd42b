#!/usr/bin/env python
"""Convert the LaPa dataset (106-point annotations) to the pose HDF5 schema.

Contract: `scripts/dsprocess_lapa.py` of the reference: 106->68 landmark
conversion with quadratic chin re-interpolation, roi from landmarks optionally
refined by a face detector (the reference uses MTCNN; here our own
LocalizerNet checkpoint can be supplied with --localizer, fulfilling the
reference's "use my own localizer" TODO), downscaled + cropped storage.
Beware: images intersect with 300W-LP and Megaface.
"""

import argparse
import re
import sys
from os.path import dirname, join, realpath
from pathlib import Path
from typing import List, NamedTuple, Optional

import h5py
import numpy as np
from scipy.interpolate import interp1d

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))

from dsprocess_wflw import apply_crop_trafo_points, apply_crop_trafo_roi, cropped

from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory as C
from neuralnet_tracker_traincode_tpu.data.pose_dataset import create_pose_dataset
from neuralnet_tracker_traincode_tpu.data.preprocessing import (
    box_iou,
    imdecode,
    imencode,
)


class DatasetInfo(NamedTuple):
    imagedir: Path
    lmkdir: Path
    itemnames: List[str]


def discover_items(source_dir) -> DatasetInfo:
    root = Path(source_dir) / "train" / "images"
    items = sorted(p.relative_to(root).stem for p in Path.glob(root, "*.jpg"))
    return DatasetInfo(root, Path(source_dir) / "train" / "landmarks", items)


def filter_megaface(info: DatasetInfo) -> DatasetInfo:
    # Megaface files carry purely numeric names.
    regex = re.compile(r"^(\d|\_)+$")
    return info._replace(itemnames=[x for x in info.itemnames if regex.match(x)])


def read_annotation(f) -> np.ndarray:
    lines = f.readlines()
    assert lines[0].strip() == "106"
    lines = lines[1:]
    assert len(lines) == 106
    return np.asarray([[float(s) for s in l.split()] for l in lines], np.float32)


def cvt_landmarks_68pt(lmk: np.ndarray, improved_chin=True) -> np.ndarray:
    """(106, 2) LaPa landmarks -> (68, 2) iBUG landmarks."""
    lmk = lmk.swapaxes(-1, -2)
    assert lmk.shape == (2, 106)
    if not improved_chin:
        chin = lmk[..., :33:2]
    else:
        # LaPa's chin endpoints start above the eyes; clip the contour ends and
        # re-interpolate to 17 points.
        xs = np.linspace(0.0, 32.0, 33)
        chin = interp1d(xs, lmk[..., :33], kind="quadratic", axis=-1, fill_value="extrapolate")(
            np.linspace(1.5, 32.0 - 1.5, 17)
        )
    assert chin.shape == (2, 17)
    brows_pairs_left = [(34, 41), (35, 40), (36, 39), (37, 38)]
    brows_pairs_right = [(42, 50), (43, 49), (44, 48), (45, 47)]

    def avg(*pairs):
        a, b = zip(*pairs)
        return np.average([lmk[..., a], lmk[..., b]], axis=0)

    def rng(start, end=None):
        return lmk[..., start : (start + 1 if end is None else end)]

    lmk68 = np.concatenate(
        [
            chin,
            rng(33), avg(*brows_pairs_left), avg(*brows_pairs_right), rng(46),  # brows
            rng(51, 55),  # nose back
            rng(57), avg((58, 59)), rng(60), avg((61, 62)), rng(63),  # nose bottom
            rng(66), avg((67, 68), (68, 69)), rng(70), avg((71, 72), (72, 73)),  # left eye
            rng(75), avg((76, 77), (77, 78)), rng(79), avg((80, 81), (81, 82)),  # right eye
            rng(84, 104),  # mouth
        ],
        axis=-1,
    )
    lmk68 = lmk68.swapaxes(-1, -2)
    assert lmk68.shape[-2:] == (68, 2), f"Bad shape {lmk68.shape}"
    return lmk68


def poor_mans_roi(points: np.ndarray) -> np.ndarray:
    x0, y0 = np.amin(points, axis=0)
    x1, y1 = np.amax(points, axis=0)
    return np.asarray([x0, y0, x1, y1], np.float32)


class LocalizerRoiRefiner:
    """Refine landmark-derived rois with our own LocalizerNet checkpoint."""

    def __init__(self, checkpoint: str):
        import jax.numpy as jnp

        from neuralnet_tracker_traincode_tpu.models import io as model_io
        from neuralnet_tracker_traincode_tpu.models.localizer import LocalizerNet

        self.model, self.variables = model_io.load_model(checkpoint, [LocalizerNet])

    def __call__(self, img, roi, iou_threshold=0.25):
        import cv2
        import jax.numpy as jnp

        from neuralnet_tracker_traincode_tpu.models.localizer import LocalizerNet

        h, w = img.shape[:2]
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
        inp = cv2.resize(gray, (288, 224), interpolation=cv2.INTER_AREA)
        x = jnp.asarray(inp[None, :, :, None], jnp.float32) / 256.0 - 0.5
        pred = self.model.apply(self.variables, x)
        out = LocalizerNet.inference_outputs(pred)
        if float(out["hasface"][0]) < 0.5:
            return roi, False
        box = np.asarray(out["roi"][0])
        # [-1, 1] -> pixels of the original image
        new_roi = np.asarray(
            [
                (box[0] + 1) * 0.5 * w, (box[1] + 1) * 0.5 * h,
                (box[2] + 1) * 0.5 * w, (box[3] + 1) * 0.5 * h,
            ],
            np.float32,
        )
        iou = float(box_iou(roi[None], new_roi[None])[0, 0])
        if iou > iou_threshold:
            return new_roi, True
        return roi, False


def do_conversion(source_dir, f, max_count, only_megaface, refiner: Optional[LocalizerRoiRefiner]):
    import tqdm

    info = discover_items(source_dir)
    if only_megaface:
        info = filter_megaface(info)
    if max_count is not None:
        info = info._replace(itemnames=info.itemnames[:max_count])
    N = len(info.itemnames)
    ds_img = create_pose_dataset(f, C.image, count=N)
    pt2ds, rois = [], []
    for i, name in enumerate(tqdm.tqdm(info.itemnames)):
        with open(info.imagedir / (name + ".jpg"), "rb") as fi:
            rawjpg = fi.read()
        img = imdecode(rawjpg, "rgb")
        with open(info.lmkdir / (name + ".txt"), "r") as fl:
            lmk106 = read_annotation(fl)
        roi = poor_mans_roi(lmk106)
        if refiner is not None:
            roi, _ = refiner(img, roi)
        points = cvt_landmarks_68pt(lmk106)
        img, trafo = cropped(img, roi, desired_roi_size=224, padding_factor=0.5, abs_padding=10)
        pt2ds.append(apply_crop_trafo_points(points, trafo))
        rois.append(apply_crop_trafo_roi(roi, trafo))
        ds_img[i] = imencode(img, quality=95)
    create_pose_dataset(f, C.points, "pt2d_68", data=np.asarray(pt2ds, np.float32), dtype="f2")
    create_pose_dataset(f, C.roi, data=np.asarray(rois, np.float32), dtype="f2")
    print(f"Wrote {N} samples")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Convert LaPa")
    parser.add_argument("source", help="source dir", type=str)
    parser.add_argument("destination", help="destination file", type=str)
    parser.add_argument("--only-megaface", default=False, action="store_true")
    parser.add_argument("--localizer", default=None, help="LocalizerNet checkpoint for roi refinement")
    parser.add_argument("-n", dest="count", type=int, default=None)
    args = parser.parse_args()
    refiner = LocalizerRoiRefiner(args.localizer) if args.localizer else None
    with h5py.File(args.destination, "w") as f:
        do_conversion(args.source, f, args.count, args.only_megaface, refiner)
