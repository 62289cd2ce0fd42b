#!/usr/bin/env python
"""Fit a fallback 68-keypoint deformable face model from a labeled pose HDF5.

The real BFM blob (`bfm_noneck_v3.pkl`) is a git-LFS artifact that cannot be
redistributed. This script reconstructs an approximate replacement from any
pose dataset carrying GT quats/coords/pt3d_68/shapeparams (by default the
bundled aflw2kmini.h5 of the reference repo):

    1. Un-pose each sample's landmarks:  L_i = R_i^-1 ((pt_i - [t_i, 0]) / s_i)
    2. Ridge-fit  L_i ~= keypts + sum_k p_ik W_k  per coordinate (minimal-norm
       least squares over the centered shape parameters).

The result reconstructs the fixture's landmarks near-exactly and yields a
plausible deformable basis; it is NOT numerically identical to the original
BFM. Swap in the real artifact via scripts/convert_bfm.py for parity work.
"""

import argparse
import sys
from os.path import dirname, join

import numpy as np

sys.path.insert(0, join(dirname(__file__), ".."))

from scipy.spatial.transform import Rotation


def fit_fallback(h5path: str, num_shape=40, num_expr=10):
    import h5py

    with h5py.File(h5path, "r") as f:
        quats = f["quats"][...].astype(np.float64)
        coords = f["coords"][...].astype(np.float64)
        pts = f["pt3d_68"][...].astype(np.float64)
        params = f["shapeparams"][...].astype(np.float64)
    N = quats.shape[0]
    K = num_shape + num_expr
    assert params.shape == (N, K)

    # Un-pose: invert rigid_transformation_25d (rotate, scale all axes, add 2D t).
    local = np.empty_like(pts)
    for i in range(N):
        v = pts[i].copy()
        v[:, :2] -= coords[i, :2]
        v /= coords[i, 2]
        local[i] = Rotation.from_quat(quats[i]).inv().apply(v)

    pbar = params.mean(axis=0)
    X = np.concatenate([np.ones((N, 1)), params - pbar], axis=1)  # (N, 1+K)
    Y = local.reshape(N, -1)  # (N, 204)
    W_full, *_ = np.linalg.lstsq(X, Y, rcond=None)  # minimal-norm (N < 1+K)
    keypts = (W_full[0] - (W_full[1:].T @ pbar).T).reshape(68, 3)
    W = W_full[1:].reshape(K, 68, 3)

    recon = keypts[None] + np.einsum("nk,kpd->npd", params, W)
    err = np.linalg.norm(recon - local, axis=-1).mean(axis=-1)
    print(f"fallback fit: mean unposed reconstruction error {err.mean():.2e} "
          f"(max {err.max():.2e}) over {N} samples")
    return keypts.astype(np.float32), W[:num_shape].astype(np.float32), W[num_shape:].astype(np.float32)


def main():
    from neuralnet_tracker_traincode_tpu.facemodel.bfm import SUBSET_ARTIFACT

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--source", default="/root/reference/aflw2kmini.h5", help="Labeled pose HDF5"
    )
    parser.add_argument("--out", default=SUBSET_ARTIFACT)
    args = parser.parse_args()
    keypts, w_shp, w_exp = fit_fallback(args.source)
    np.savez_compressed(
        args.out, keypts=keypts, w_shp=w_shp, w_exp=w_exp, source="fitted_fallback"
    )
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
