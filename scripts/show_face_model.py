#!/usr/bin/env python
"""Visualize the deformable 68-keypoint face model (headless PDF output).

Contract: the reference's `DeformableFaceModel.ipynb` — scatter the keypoint
set and quiver the 50 blend-shape basis vectors, front and profile views.
"""

import argparse
import sys
from os.path import dirname, join, realpath

import matplotlib

matplotlib.use("Agg")
import numpy as np
from matplotlib import pyplot

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))

from neuralnet_tracker_traincode_tpu.facemodel.bfm import BFMModel


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="/tmp/face_model.pdf")
    args = parser.parse_args()

    bfm = BFMModel()
    keypts = np.asarray(bfm.keypts)
    bases = np.asarray(bfm.scaled_bases)
    xs, ys, zs = keypts.T

    fig, axes = pyplot.subplots(10, 10, figsize=(30, 32))
    axes = axes.ravel()
    for i, (ax, basevec) in enumerate(zip(axes[::2], bases)):
        dxs, dys, dzs = basevec.T
        ax.scatter(xs, -ys, s=3.0, c="k")
        ax.quiver(xs, -ys, dxs, -dys, scale=2.0, color="r")
        ax.set(xlim=(-1.0, 1.0), ylim=(-1.5, 0.5), title=f"basis {i} front")
        ax.xaxis.set_visible(False)
        ax.yaxis.set_visible(False)
    for i, (ax, basevec) in enumerate(zip(axes[1::2], bases)):
        dxs, dys, dzs = basevec.T
        ax.scatter(zs, -ys, s=3.0, c="k")
        ax.quiver(zs, -ys, dzs, -dys, scale=2.0, color="r")
        ax.set(xlim=(-1.0, 1.0), ylim=(-1.5, 0.5), title=f"basis {i} profile")
        ax.xaxis.set_visible(False)
        ax.yaxis.set_visible(False)
    pyplot.tight_layout()
    fig.savefig(args.out)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
