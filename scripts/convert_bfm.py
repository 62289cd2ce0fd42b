#!/usr/bin/env python
"""Convert the original 3DDFA `bfm_noneck_v3.pkl` into the small 68-keypoint
artifact this framework ships (`facemodel/assets/bfm_keypoints_subset.npz`).

Usage: python scripts/convert_bfm.py /path/to/bfm_noneck_v3.pkl
"""

import argparse
import sys
from os.path import dirname, join

sys.path.insert(0, join(dirname(__file__), ".."))

from neuralnet_tracker_traincode_tpu.facemodel.bfm import SUBSET_ARTIFACT, FullBFMModel


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("pkl", help="Path to bfm_noneck_v3.pkl")
    parser.add_argument("--out", default=SUBSET_ARTIFACT)
    args = parser.parse_args()
    full = FullBFMModel(args.pkl)
    out = full.export_keypoint_subset(args.out)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
