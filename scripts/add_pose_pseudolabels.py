#!/usr/bin/env python
"""Write ensemble pseudo-labels (pose/coord/landmarks/shape) back into an HDF5.

Contract: `scripts/add_pose_pseudolabels.py` of the reference: run an ensemble
of checkpoints over the dataset, average predictions (quaternions via the
pivot-sign-aligned average of UNNORMALIZED quats), and store them with the
standard pose schema.
"""

import argparse
import gc
import sys
from collections import defaultdict
from os.path import dirname, isfile, join, realpath

import h5py
import numpy as np

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))

from neuralnet_tracker_traincode_tpu import utils
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory as C
from neuralnet_tracker_traincode_tpu.data.pose_dataset import (
    Hdf5PoseDataset,
    create_pose_dataset,
)
from neuralnet_tracker_traincode_tpu.ops.quaternion import quat_average


def setup_dataset(args):
    from neuralnet_tracker_traincode_tpu.data.host_transforms import (
        PutRoiFromLandmarks,
        offset_points_by_half_pixel_np,
    )

    def transform(sample):
        return offset_points_by_half_pixel_np(sample)

    return Hdf5PoseDataset(args.filename, transform=transform)


def fit_dataset(net, predictor, ds, batchsize):
    """Returns dict of per-sample arrays ordered by dataset index."""
    outputs = defaultdict(list)
    for chunk in utils.iter_batched((ds[i] for i in range(len(ds))), batchsize):
        images = [np.asarray(s.pop("image")) for s in chunk]
        rois = np.stack([np.asarray(s["roi"]) for s in chunk])
        preds = predictor.predict_batch(images, rois)
        for k in ("unnormalized_quat", "coord", "pt3d_68", "shapeparam"):
            outputs[k].append(np.asarray(preds[k]))
        outputs["index"].append(np.stack([np.asarray(s["index"]) for s in chunk]))
    outputs = {k: np.concatenate(v, axis=0) for k, v in outputs.items()}
    ordering = np.argsort(outputs.pop("index"))
    return {k: v[ordering] for k, v in outputs.items()}


def fitall(args):
    assert all(isfile(f) for f in args.checkpoints)
    print("Inferring from networks:", args.checkpoints)

    from neuralnet_tracker_traincode_tpu.eval.predictor import (
        Predictor,
        load_pose_network,
    )

    if not args.dryrun:
        with h5py.File(args.filename, "r+") as f:
            g = f.require_group(args.hdfgroupname) if args.hdfgroupname else f
            for key in "coords quats pt3d_68 shapeparams".split():
                if key in g:
                    del g[key]

    ds = setup_dataset(args)
    num_samples = len(ds)

    outputs_per_net = defaultdict(list)
    for modelfile in args.checkpoints:
        # Framework checkpoints AND --full ONNX exports (which carry the raw
        # unnormalized_quat/pt3d_68/shapeparam outputs) are both accepted.
        net = load_pose_network(modelfile)
        predictor = Predictor(net, focus_roi_expansion_factor=1.2)
        outputs = fit_dataset(net, predictor, ds, args.batchsize)
        for k, v in outputs.items():
            outputs_per_net[k].append(v)
    outputs_per_net = {k: np.stack(v) for k, v in outputs_per_net.items()}

    ds.close()
    del ds
    gc.collect()  # the HDF5 file must be closed before reopening read-write

    # Averaging normalized quats is unstable near sign flips; the reference
    # averages the UNNORMALIZED outputs with pivot-axis sign alignment.
    quats = quat_average(outputs_per_net.pop("unnormalized_quat"))
    coords = np.average(outputs_per_net.pop("coord"), axis=0)
    pt3d_68 = np.average(outputs_per_net.pop("pt3d_68"), axis=0)
    shapeparams = np.average(outputs_per_net.pop("shapeparam"), axis=0)
    assert len(quats) == num_samples

    if args.dryrun:
        print("Dry run: not writing. Stats:")
        print("  quat mean:", quats.mean(axis=0))
        print("  coord mean:", coords.mean(axis=0))
        return

    with h5py.File(args.filename, "r+") as f:
        g = f.require_group(args.hdfgroupname) if args.hdfgroupname else f
        create_pose_dataset(
            g, C.quat, count=num_samples, dtype=np.float32,
            data=quats.astype(np.float32), exists_ok=args.overwrite,
        )
        create_pose_dataset(
            g, C.xys, count=num_samples, dtype=np.float32,
            data=coords.astype(np.float32), exists_ok=args.overwrite,
        )
        create_pose_dataset(
            g, C.points, name="pt3d_68", count=num_samples, shape_wo_batch_dim=(68, 3),
            dtype=np.float32, data=pt3d_68.astype(np.float32), exists_ok=args.overwrite,
        )
        create_pose_dataset(
            g, C.general, name="shapeparams", count=num_samples, shape_wo_batch_dim=(50,),
            dtype=np.float32, data=shapeparams.astype(np.float32), exists_ok=args.overwrite,
        )
    print(f"Wrote pseudo-labels for {num_samples} samples into {args.filename}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("filename", type=str, help="the dataset to label")
    parser.add_argument("-c", "--checkpoints", help="model checkpoints", nargs="*", type=str)
    parser.add_argument("-b", "--batchsize", type=int, default=512)
    parser.add_argument(
        "--hdf-group-name", type=str, default="", dest="hdfgroupname",
        help="Group to store the annotations in",
    )
    parser.add_argument("--dryrun", default=False, action="store_true")
    parser.add_argument("--overwrite", "-f", default=False, action="store_true")
    fitall(parser.parse_args())
