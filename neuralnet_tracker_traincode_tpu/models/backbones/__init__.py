"""Backbone CNNs (flax, NHWC layout)."""
