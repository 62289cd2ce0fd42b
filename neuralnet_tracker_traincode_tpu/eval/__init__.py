"""Evaluation: inference wrappers, predictor, metrics, alignment corrections."""
