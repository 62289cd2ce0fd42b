"""Deployment export: self-contained ONNX emission for the opentrack plugin."""
