#!/usr/bin/env python
"""Offline deformable-face-model fitting to 2D landmarks (batched, on device).

Contract: the reference's `DsLapaMegafaceFitFaceModel.ipynb` /
`DsWflwFitFaceModel.ipynb` — fit pose (quaternion), 2.5D position/size and 50
shape parameters of the deformable 68-keypoint head model to annotated 2D
landmarks (`pt2d_68`), regularized by the GMM shape prior, then write the
results as a fit group (`2dfit_v3`: quats/coords/pt3d_68/shapeparams) back
into the HDF5 for downstream large-pose synthesis.

TPU-first redesign: the reference loops sample-by-sample with a second-order
torchmin optimizer over 224-px crops. Here ALL samples are fitted
simultaneously as one batched Adam optimization in a single jitted program
(N x 57 parameters), in roi-normalized coordinates for conditioning, and
back-transformed to image coordinates at the end — minutes instead of hours.

Loss per sample (mirrors the notebook's objective):
 * Huber distance of the projected 2D keypoints to the annotation
   (symmetrized chin handling is unnecessary: full 68-point sets here)
 * GMM negative log-likelihood of the shape parameters
 * quaternion normalization soft constraint.
"""

import argparse
import sys
from os.path import dirname, join, realpath

import numpy as np

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("filename", help="dataset .h5 with /pt2d_68 (or pt3d_68) and /rois")
    parser.add_argument("--out-group", default="2dfit_v3")
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--lr", type=float, default=0.05)
    parser.add_argument("--prior-weight", type=float, default=0.01)
    parser.add_argument("--huber-delta", type=float, default=0.05, help="in roi-size units")
    parser.add_argument("--landmarks", default=None,
                        help="landmark dataset path inside the file (default: pt2d_68, else pt3d_68)")
    parser.add_argument("--dry-run", action="store_true", help="fit but do not write")
    args = parser.parse_args()

    import h5py
    import jax
    import jax.numpy as jnp
    import optax

    from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory
    from neuralnet_tracker_traincode_tpu.data.pose_dataset import create_pose_dataset
    from neuralnet_tracker_traincode_tpu.models.components import (
        DeformableHeadKeypoints,
        GaussianMixture,
        PosedDeformableHead,
    )
    from neuralnet_tracker_traincode_tpu.ops import quaternion as Q
    from neuralnet_tracker_traincode_tpu.ops.rotrepr import QuatRepr

    with h5py.File(args.filename, "r") as f:
        lmk_name = args.landmarks or ("pt2d_68" if "pt2d_68" in f else "pt3d_68")
        pt2d = np.asarray(f[lmk_name][...], np.float32)[..., :2]
        rois = np.asarray(f["rois"][...], np.float32)
        init_quats = None
        if "pseudolabels" in f and "quats" in f["pseudolabels"]:
            init_quats = np.asarray(f["pseudolabels/quats"][...], np.float32)
    N = len(pt2d)
    assert pt2d.shape == (N, 68, 2), pt2d.shape
    print(f"Fitting {N} samples from {args.filename}:{lmk_name}")

    # roi normalization: landmarks to a ~unit frame (the notebook fits inside
    # FocusRoi 224-px crops for the same reason).
    center = 0.5 * (rois[:, :2] + rois[:, 2:])
    halfsize = np.maximum(0.5 * np.max(rois[:, 2:] - rois[:, :2], axis=-1), 1e-3)
    target = (pt2d - center[:, None, :]) / halfsize[:, None, None]

    head = PosedDeformableHead(DeformableHeadKeypoints())
    gmm = GaussianMixture.from_hdf5(
        join(dirname(realpath(__file__)), "..",
             "neuralnet_tracker_traincode_tpu", "facemodel", "assets", "shapeparams_gmm.h5")
    )

    if init_quats is None:
        init_quats = np.tile(np.asarray([0.0, 0, 0, 1], np.float32), (N, 1))
    params0 = {
        "quat": jnp.asarray(init_quats),
        "xy": jnp.zeros((N, 2), jnp.float32),
        "size": jnp.full((N, 1), 0.5, jnp.float32),
        "shape": jnp.zeros((N, 50), jnp.float32),
    }
    target_j = jnp.asarray(target)

    def unpack(p):
        quats = p["quat"] / jnp.maximum(
            jnp.linalg.norm(p["quat"], axis=-1, keepdims=True), 1e-6
        )
        coord = jnp.concatenate([p["xy"], jax.nn.softplus(p["size"])], axis=-1)
        return quats, coord, p["shape"]

    def loss_fn(p):
        quats, coord, shape = unpack(p)
        pts = head(coord, QuatRepr(quats), shape)  # (N, 68, 3)
        r = pts[..., :2] - target_j
        d = args.huber_delta
        err = jnp.where(jnp.abs(r) < d, 0.5 * r * r / d, jnp.abs(r) - 0.5 * d)
        data_term = jnp.sum(jnp.mean(err, axis=(1, 2)))
        prior = -args.prior_weight * jnp.sum(gmm(shape)) / 68.0
        quatreg = 1e-3 * jnp.sum(jnp.square(
            jnp.linalg.norm(p["quat"], axis=-1) - 1.0
        ))
        return data_term + prior + quatreg

    tx = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps))
    opt_state = tx.init(params0)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    params = params0
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        if i % max(1, args.steps // 10) == 0 or i == args.steps - 1:
            print(f"  step {i}: loss {float(loss) / N:.5f} /sample")

    quats, coord, shape = unpack(params)
    quats = np.asarray(Q.positivereal(quats))
    coord = np.asarray(coord)
    pts = np.asarray(head(jnp.asarray(coord), QuatRepr(jnp.asarray(quats)), shape))
    shape = np.asarray(shape)

    # Back-transform from roi-normalized frame to image coordinates
    # (pure scale+shift => rotation unchanged; notebook back_transformed step).
    coord_img = np.concatenate(
        [coord[:, :2] * halfsize[:, None] + center, coord[:, 2:] * halfsize[:, None]], axis=-1
    )
    pts_img = pts * halfsize[:, None, None]
    pts_img[..., :2] += center[:, None, :]

    resid = np.linalg.norm(pts[..., :2] - target, axis=-1).mean(axis=-1)
    print(f"mean residual {resid.mean():.4f} (roi units); "
          f"p90 {np.percentile(resid, 90):.4f}")

    if args.dry_run:
        print("Dry run: not writing.")
        return

    import h5py

    C = FieldCategory
    with h5py.File(args.filename, "a") as f:
        if args.out_group in f:
            del f[args.out_group]
        g = f.create_group(args.out_group)
        create_pose_dataset(g, C.quat, data=quats.astype(np.float32))
        create_pose_dataset(g, C.xys, data=coord_img.astype(np.float32))
        create_pose_dataset(g, C.points, name="pt3d_68", data=pts_img.astype(np.float32))
        create_pose_dataset(
            g, C.general, name="shapeparams", dtype=np.float16,
            data=shape.astype(np.float16),
        )
    print(f"Wrote {args.out_group} group into {args.filename}")


if __name__ == "__main__":
    main()
