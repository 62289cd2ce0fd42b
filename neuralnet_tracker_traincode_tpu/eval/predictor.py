"""Inference networks and the crop->infer->backtransform Predictor.

Contract: `trackertraincode/eval.py:25-252`. The Predictor crops each face roi
to the network resolution (with the inverse transform recorded), runs the
network, un-normalizes predictions and maps them back into the original image
frame. Supports this framework's checkpoints natively and ONNX models when
onnxruntime is installed (optional — not part of the baked image).

TPU note: variable image sizes are handled by zero-padding each chunk to the
max size in the chunk (bucketed to multiples of 64 to bound recompiles); the
crop warp, forward pass and label backtransform run jitted on device.
"""

from abc import ABCMeta, abstractmethod
from typing import Dict, List, Union

import jax
import jax.numpy as jnp
import numpy as np

from neuralnet_tracker_traincode_tpu.augmentation.affine import apply_affine2d
from neuralnet_tracker_traincode_tpu.augmentation.geometric import (
    focus_roi_transform,
    no_roi_randomization,
)
from neuralnet_tracker_traincode_tpu.augmentation.warp import warp_affine
from neuralnet_tracker_traincode_tpu.data.batch import Batch, Metadata
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory
from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d

PRED_CATEGORIES = {
    "coord": FieldCategory.xys,
    "pose": FieldCategory.quat,
    "pt3d_68": FieldCategory.points,
    "roi": FieldCategory.roi,
}


class InferenceNetwork(metaclass=ABCMeta):
    @abstractmethod
    def __call__(self, images: jax.Array) -> Dict[str, jax.Array]:
        """images: whitened float (B, S, S, 1)."""

    @property
    @abstractmethod
    def input_resolution(self) -> int: ...


class CheckpointPoseNetwork(InferenceNetwork):
    """Runs a framework checkpoint under jit."""

    def __init__(self, filename_or_model, variables=None):
        if variables is None:
            from neuralnet_tracker_traincode_tpu.models import io as model_io

            self.model, self.variables = model_io.load_posenet(filename_or_model)
        else:
            self.model, self.variables = filename_or_model, variables

        @jax.jit
        def _fwd(variables, images):
            out = self.model.apply(variables, images, train=False)
            out.pop("rot", None)  # eval consumers use the quaternion 'pose'
            return out

        self._fwd = _fwd

    @property
    def input_resolution(self) -> int:
        return self.model.input_resolution

    def __call__(self, images):
        return self._fwd(self.variables, images)


class OnnxPoseNetwork(InferenceNetwork):
    """ONNX session wrapper with the opentrack output-name remapping.

    Requires onnxruntime (optional dependency).
    """

    NAMEMAP = {
        "pos_size": "coord",
        "quat": "pose",
        "box": "roi",
        "eyes": "eyeparam",
        "pos_size_scales": "coord_scales",
        "pos_size_std": "coord_scales",
        "rotaxis_scales_tril": "pose_scales_tril",
        "rotaxis_std": "pose_scales_tril",
        "rot_conc_tril": "pose_conc_tril",
        "box_scales": "roi_scales",
        "box_std": "roi_scales",
    }

    def __init__(self, modelfile: str):
        self._input_resolution = 129
        try:
            import onnxruntime

            self.session = onnxruntime.InferenceSession(
                modelfile, providers=["CPUExecutionProvider"]
            )
            self.output_names = [
                self.NAMEMAP.get(o.name, o.name) for o in self.session.get_outputs()
            ]
            in_shape = self.session.get_inputs()[0].shape
            self._single_frame = isinstance(in_shape[0], int) and in_shape[0] > 0
            self._legacy_coords = self.session.get_modelmeta().version not in (2, 3, 4)
            # onnxruntime reports explicit dynamic dims as -1; keep the 129
            # fallback for anything non-positive or implausible.
            if (len(in_shape) == 4 and isinstance(in_shape[-1], int)
                    and 0 < in_shape[-1] < 10_000):
                self._input_resolution = int(in_shape[-1])
        except ImportError:
            # Fall back to the bundled executors: JAX backend (runs the graph
            # on the accelerator, jit per shape), then pure numpy.
            from neuralnet_tracker_traincode_tpu.export.onnx_run import (
                JaxOnnxSession,
                NumpyOnnxSession,
            )

            try:
                self.session = JaxOnnxSession(modelfile)
            except Exception:
                self.session = NumpyOnnxSession(modelfile)
            self.output_names = [
                self.NAMEMAP.get(n, n) for n in self.session.output_names
            ]
            self._single_frame = False
            self._legacy_coords = self.session.model_version not in (2, 3, 4)
            # Legacy exports may list initializers among graph.inputs; the
            # real data input is the first entry. Dynamic dims parse as None
            # (and a raw dim_value of -1 decodes as a huge unsigned varint) —
            # keep the 129 fallback for anything implausible.
            dims = next(iter(self.session.input_dims.values()), None)
            if (dims is not None and len(dims) == 4 and dims[-1]
                    and 0 < dims[-1] < 10_000):
                self._input_resolution = int(dims[-1])

    @property
    def input_resolution(self) -> int:
        # Parsed from the graph's input shape (the reference hardcodes 129
        # with a TODO, `eval.py:105-107`); 129 is the fallback for graphs
        # with fully symbolic shapes.
        return self._input_resolution

    def __call__(self, images):
        # ONNX models take NCHW
        x = np.moveaxis(np.asarray(images, np.float32), -1, 1)
        if self._single_frame:
            outputs = [self.session.run(None, {"x": img[None]}) for img in x]
            outputs = [np.vstack(o) for o in zip(*outputs)]
        else:
            outputs = self.session.run(None, {"x": x})
        outputs = dict(zip(self.output_names, outputs))
        if self._legacy_coords:
            quats = outputs["pose"]
            qx, qy, qz = quats[..., 0].copy(), quats[..., 1].copy(), quats[..., 2].copy()
            quats[..., 0] = -qz
            quats[..., 1] = -qy
            quats[..., 2] = -qx
            outputs["pose"] = quats
        return {k: jnp.asarray(v) for k, v in outputs.items()}


def load_pose_network(filename: str, device=None) -> InferenceNetwork:
    if filename.endswith(".onnx"):
        return OnnxPoseNetwork(filename)
    return CheckpointPoseNetwork(filename)


from neuralnet_tracker_traincode_tpu.utils import ceil_to_multiple as _bucket_size


class Predictor:
    """Crop -> infer -> backtransform to the original image frame."""

    def __init__(
        self,
        net: Union[InferenceNetwork, str],
        focus_roi_expansion_factor: float = 1.1,
        device=None,
        crop_backend: str = "device",
    ):
        """crop_backend: "device" (default; fused on-device warp) or "cv2"
        (host cv2 crop, bit-compatible with the reference eval pixels —
        `image_geometric_cv2.py:138-155`)."""
        assert crop_backend in ("device", "cv2"), crop_backend
        self._net = net if isinstance(net, InferenceNetwork) else load_pose_network(net, device)
        self._expansion = focus_roi_expansion_factor
        self._crop_backend = crop_backend

    def _crop_images_cv2(self, images: List[np.ndarray], rois: np.ndarray, size: int):
        from neuralnet_tracker_traincode_tpu.eval.cv2_crop import (
            compute_view_roi_np,
            croprescale_cv2,
        )

        view_rois = compute_view_roi_np(rois, self._expansion)
        crops = np.empty((len(images), size, size, 1), np.uint8)
        for i, (im, vroi) in enumerate(zip(images, view_rois)):
            im = np.asarray(im)
            if im.ndim == 2:
                im = im[..., None]
            crops[i] = croprescale_cv2(im, vroi, size)
        return jnp.asarray(crops)

    def predict_batch(self, images: List[np.ndarray], rois) -> Batch:
        """images: list of HWC uint8 arrays (ragged); rois: (B, 4)."""
        B = len(images)
        rois = np.asarray(rois, np.float32)
        assert rois.shape == (B, 4), f"Bad roi shape {rois.shape}"
        size = self._net.input_resolution
        maxdim = max(max(im.shape[0], im.shape[1]) for im in images)

        params = no_roi_randomization((B,), self._expansion)
        tr = focus_roi_transform(jnp.asarray(rois), params, size)
        if self._crop_backend == "cv2":
            crops = self._crop_images_cv2(images, rois, size)
        else:
            # Pad ragged images to the chunk max (bucketed to bound recompiles).
            maxdim = _bucket_size(maxdim)
            packed = np.zeros((B, maxdim, maxdim, 1), np.uint8)
            for i, im in enumerate(images):
                im = np.asarray(im)
                if im.ndim == 2:
                    im = im[..., None]
                packed[i, : im.shape[0], : im.shape[1], :] = im
            crops = warp_affine(jnp.asarray(packed), tr, size)
        x = crops * (1.0 / 256.0) - 0.5
        preds = dict(self._net(x))

        # Un-normalize from [-1, 1] crop space to crop pixels, then backtransform.
        from neuralnet_tracker_traincode_tpu.augmentation.affine import (
            position_unnormalization,
        )

        tr_unnorm = position_unnormalization(size, size)
        back = tr.inv()
        for k in list(preds.keys()):
            c = PRED_CATEGORIES.get(k)
            if c is None:
                continue
            v = apply_affine2d(tr_unnorm, k, preds[k], c)
            preds[k] = apply_affine2d(back, k, v, c)
        meta = Metadata((maxdim, maxdim), B, categories=dict(PRED_CATEGORIES))
        return Batch(meta, preds)

    def evaluate(self, metric, loader, chunksize: int = 128):
        """Stream a SampleBySample loader through the predictor into a metric."""
        from neuralnet_tracker_traincode_tpu import utils

        for samples in utils.iter_batched(loader, chunksize):
            # Shallow-copy: callers may iterate the same in-memory sample list
            # multiple times (e.g. the stability analyses sweep crop factors);
            # popping from the original would destroy their images.
            samples = [s.copy() for s in samples]
            images = [np.asarray(s.pop("image")) for s in samples]
            batch = Batch.collate(samples)
            preds = self.predict_batch(images, np.asarray(batch["roi"]))
            batch["image"] = images  # ragged, for perspective-correction metrics
            metric.update(preds, batch)
        return metric.compute()

    def predict_cropped_normalized_batch(self, images) -> Batch:
        """Fast path for already cropped+normalized (B, S, S, 1) [0,1] images."""
        x = jnp.asarray(images) - 0.5
        preds = self._net(x)
        meta = Metadata(
            tuple(images.shape[1:3]), images.shape[0], categories=dict(PRED_CATEGORIES)
        )
        return Batch(meta, dict(preds))

    def evaluate_cropped_normalized(self, metric, loader):
        for batch in loader:
            preds = self.predict_cropped_normalized_batch(batch["image"])
            metric.update(preds, batch)
        return metric.compute()
