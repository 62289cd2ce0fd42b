#!/usr/bin/env python
"""Export a trained checkpoint to ONNX for the opentrack plugin.

Contract: `scripts/export_model.py` of the reference: denormal scrub,
conv+BN fusion, opentrack output names (pos_size/quat/box + *_scales),
opset 13, model_version 4, and an output-parity check of the emitted graph
against the source model (atol 1e-4). The graph is emitted by the
self-contained writer (no onnx/onnxruntime dependency); the parity check runs
on the bundled numpy ONNX executor, or onnxruntime when available.
"""

import argparse
import sys
from os.path import dirname, join, realpath, splitext

import numpy as np

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))


def _calibrate(args, model, variables, onnx_export):
    """Activation ranges for PTQ from deterministic eval crops of real data."""
    import jax.numpy as jnp

    from neuralnet_tracker_traincode_tpu import pipelines
    from neuralnet_tracker_traincode_tpu.augmentation.pipeline import crop_for_eval

    fp32_blob = onnx_export.build_posenet_onnx(model, variables)
    loader = pipelines.make_validation_loader(args.calib_ds)
    batches = []
    batch_imgs, batch_rois = [], []
    res = model.input_resolution
    pad = 0
    count = 0
    for sample in loader:
        if count >= args.calib_samples:
            break
        img = np.asarray(sample["image"])
        if img.ndim == 2:
            img = img[..., None]
        batch_imgs.append(img)
        batch_rois.append(np.asarray(sample["roi"], np.float32))
        pad = max(pad, img.shape[0], img.shape[1])
        count += 1
        if len(batch_imgs) == 32:
            batches.append((batch_imgs, batch_rois, pad))
            batch_imgs, batch_rois, pad = [], [], 0
    if batch_imgs:
        batches.append((batch_imgs, batch_rois, pad))
    print(f"Calibrating on {count} samples from {args.calib_ds}")

    def crops():
        for imgs, rois, padsz in batches:
            x = np.zeros((len(imgs), padsz, padsz, 1), np.uint8)
            for j, im in enumerate(imgs):
                x[j, : im.shape[0], : im.shape[1]] = im[..., :1]
            c, _ = crop_for_eval(jnp.asarray(x), jnp.asarray(np.stack(rois)), res)
            yield np.moveaxis(np.asarray(c), -1, 1)

    return onnx_export.calibrate_conv_ranges(fp32_blob, crops())


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", help="model checkpoint (.ckpt/.nnckpt)")
    parser.add_argument("--output", default=None, help="output .onnx path")
    parser.add_argument(
        "--localizer", action="store_true", help="export a LocalizerNet checkpoint"
    )
    parser.add_argument("--no-parity-check", dest="parity", action="store_false", default=True)
    parser.add_argument("--full", action="store_true", default=False,
                        help="export ALL eval outputs under their raw names "
                             "(coord/pose/roi/unnormalized_quat/pt3d_68/shapeparam/"
                             "hasface + scales) instead of the opentrack subset; "
                             "reference ExportModel (export_model.py:148-169)")
    parser.add_argument("--atol", type=float, default=None,
                        help="parity tolerance (default 1e-4, 5e-2 for --half)")
    parser.add_argument("--half", "--posehalf", dest="half", action="store_true", default=False,
                        help="store weights as FLOAT16 (reference's onnxconverter fp16 pass)")
    parser.add_argument("--quantize", action="store_true", default=False,
                        help="static int8 PTQ of the backbone convs (QDQ form), "
                             "calibrated on --calib-ds crops")
    parser.add_argument("--calib-ds", type=str, default="aflw2k3d",
                        help="dataset name or .h5 path for quantization calibration")
    parser.add_argument("--calib-samples", type=int, default=256)
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="ALSO write a reference-format torch checkpoint "
                             "({state_dict, class_name, config}) loadable by the "
                             "reference implementation's load_model")
    args = parser.parse_args()

    import jax.numpy as jnp

    from neuralnet_tracker_traincode_tpu.export import onnx_export, onnx_run
    from neuralnet_tracker_traincode_tpu.models import io as model_io

    model, variables = model_io.load_posenet(args.checkpoint)
    variables = onnx_export.clear_denormals(variables)
    out_path = args.output or splitext(args.checkpoint)[0] + ".onnx"

    if args.torch_checkpoint:
        from neuralnet_tracker_traincode_tpu.models import torch_export

        torch_export.save_reference_checkpoint(args.torch_checkpoint, model, variables)
        print(f"Wrote reference-format torch checkpoint {args.torch_checkpoint}")

    from neuralnet_tracker_traincode_tpu.models.localizer import LocalizerNet

    if args.localizer or isinstance(model, LocalizerNet):
        assert not args.half, "fp16 export is implemented for the pose net"
        blob = onnx_export.build_localizer_onnx(model, variables)
        in_shape = (1,) + tuple(model.input_resolution) + (1,)
    else:
        quant_ranges = None
        if args.quantize:
            quant_ranges = _calibrate(args, model, variables, onnx_export)
        blob = onnx_export.build_posenet_onnx(
            model, variables, outputs="full" if args.full else "opentrack",
            fp16=args.half, quant_ranges=quant_ranges,
        )
        in_shape = (1, model.input_resolution, model.input_resolution, 1)
    atol = args.atol if args.atol is not None else (
        2e-1 if args.quantize else 5e-2 if args.half else 1e-4
    )

    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"Wrote {out_path} ({len(blob)} bytes)")

    if args.parity:
        import jax

        rng = np.random.RandomState(0)
        x_nhwc = (rng.rand(*in_shape).astype(np.float32) - 0.5)
        sess = onnx_run.NumpyOnnxSession(blob)
        outs = dict(zip(sess.output_names, sess.run(None, {"x": np.moveaxis(x_nhwc, -1, 1)})))
        # Pin f32 math: TPU convs default to bf16, which is NOT the reference
        # for the exported (exact f32) graph.
        with jax.default_matmul_precision("float32"):
            if args.localizer or isinstance(model, LocalizerNet):
                ref = {"logit_box": np.asarray(model.apply(variables, jnp.asarray(x_nhwc)))}
            else:
                r = model.apply(variables, jnp.asarray(x_nhwc), train=False)
                if args.full:
                    ref = {k: r[k] for k in sess.output_names}
                else:
                    ref = {"pos_size": r["coord"], "quat": r["pose"], "box": r["roi"]}
                    if model.enable_uncertainty:
                        ref.update(
                            pos_size_scales=r["coord_scales"],
                            rotaxis_scales_tril=r["pose_scales_tril"],
                            box_scales=r["roi_scales"],
                        )
        worst = 0.0
        for k, v in ref.items():
            err = float(np.abs(outs[k] - np.asarray(v)).max())
            # int8 PTQ: uncertainty scale heads amplify backbone quantization
            # noise (the reference calls its PTQ result "too noisy" for
            # mobilenet, doc/recent-changes.md:3-6) -> informational only.
            informational = args.quantize and ("scales" in k)
            if not informational:
                worst = max(worst, err)
            status = "OK" if err <= atol else ("INFO" if informational else "FAIL")
            print(f"  parity {k}: max err {err:.2e} [{status}]")
        if worst > atol:
            raise SystemExit(f"Parity check failed: {worst} > {atol}")
        print("Parity check passed.")


if __name__ == "__main__":
    main()
