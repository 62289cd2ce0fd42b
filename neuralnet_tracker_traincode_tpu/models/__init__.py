"""Neural networks: backbones, heads, pose estimator, localizer."""
