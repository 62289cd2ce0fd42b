#!/usr/bin/env python
"""Fit the diagonal-GMM prior over the 50 shape parameters.

Replaces the reference's FitShapeParamsDistribution notebook: fits a sklearn
GaussianMixture (diag covariance) over the `shapeparams` field of one or more
pose HDF5 files and writes it in the `shapeparams_gmm.h5` format consumed by
ShapePlausibilityLoss (`losses.py:100-113` of the reference).
"""

import argparse
import sys
from os.path import dirname, join

import numpy as np

sys.path.insert(0, join(dirname(__file__), ".."))


def main():
    import h5py
    import sklearn.mixture

    from neuralnet_tracker_traincode_tpu.models.components import GaussianMixture

    default_out = join(
        dirname(__file__), "..", "neuralnet_tracker_traincode_tpu", "facemodel", "assets",
        "shapeparams_gmm.h5",
    )
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("sources", nargs="*", default=["/root/reference/aflw2kmini.h5"])
    parser.add_argument("--components", type=int, default=None,
                        help="Number of mixture components (default: min(10, N // 8))")
    parser.add_argument("--out", default=default_out)
    args = parser.parse_args()

    params = []
    for src in args.sources or ["/root/reference/aflw2kmini.h5"]:
        with h5py.File(src, "r") as f:
            params.append(f["shapeparams"][...].astype(np.float64))
    params = np.concatenate(params, axis=0)
    n_components = args.components or max(1, min(10, len(params) // 8))
    print(f"Fitting {n_components}-component diag GMM over {params.shape} params")
    gmm = sklearn.mixture.GaussianMixture(
        n_components=n_components, covariance_type="diag", random_state=1234, reg_covar=1e-4
    )
    gmm.fit(params)
    jgmm = GaussianMixture.from_sklearn(gmm)
    with h5py.File(args.out, "w") as f:
        jgmm.save_to_hdf5(f, None)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
