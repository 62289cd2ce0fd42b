"""Deformable face model (BFM 68-keypoint subset) and keypoint semantics."""
