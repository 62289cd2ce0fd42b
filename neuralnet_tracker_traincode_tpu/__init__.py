"""TPU-native rebuild of the opentrack NeuralNet-tracker training code.

A JAX/XLA/Pallas framework for training and evaluating the two networks of the
opentrack NeuralNet tracker plugin: a face localizer and a head pose estimator
(quaternion rotation, 2.5D position/size, 68 3D landmarks via a deformable
face model, bbox, optional NLL uncertainty heads).

Capability reference: opentrack/neuralnet-tracker-traincode (see SURVEY.md).
The architecture here is TPU-first: all hot-path compute (augmentation warps,
forward/backward, losses) runs under jit on device; the host only reads HDF5,
decodes JPEG and packs padded batches.
"""

__version__ = "0.1.0"
