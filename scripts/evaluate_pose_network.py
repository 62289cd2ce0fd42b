#!/usr/bin/env python
"""Benchmark pose networks: multi-model x multi-dataset x roi-config sweep.

Contract: `scripts/evaluate_pose_network.py` of the reference — same CLI
surface and table schema (Pitch/Yaw/Roll/Mean/Geodesic deg, XY%, S%,
NME3d%, NME2d% binned by yaw), github-markdown or JSON output.
"""

import argparse
import functools
import json
import os
import sys
from collections import defaultdict
from os.path import commonprefix, dirname, join, realpath, relpath
from typing import Callable, Dict, List, Literal, NamedTuple

import numpy as np

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))

# Kinect horizontal field of view (Biwi protocol).
BIWI_HORIZONTAL_FOV = 57.0

AlignmentScheme = Literal["perspective", "opal23", "none"]


class RoiConfig(NamedTuple):
    expansion_factor: float = 1.1
    center_crop: bool = False
    use_head_roi: bool = True

    def __str__(self):
        crop = ["ROI", "CC"][self.center_crop]
        return f'{"(H_roi)" if self.use_head_roi else "(F_roi)"}{crop}{self.expansion_factor:0.1f}'


comprehensive_roi_configs = [
    RoiConfig(*x)
    for x in [
        (1.2, False),
        (1.1, False),
        (1.0, False),
        (1.2, False, False),
        (1.1, False, False),
        (1.0, False, False),
    ]
]


class TableBuilder:
    data_name_table = {"aflw2k3d": "AFLW 2k 3d", "aflw2k3d_grimaces": "grimaces"}

    def __init__(self):
        self._header = [
            "Data", "Pitch°", "Yaw°", "Roll°", "Mean°", "Geodesic°", "XY%", "S%",
            "NME3d%", "NME2d%_30", "NME2d%_60", "NME2d%_90", "NME2d%_avg",
        ]
        self._entries_by_model = defaultdict(list)

    def add_row(self, model, data, euler_angles, geodesic, rmse_pos, rmse_size,
                unweighted_nme_3d, nme_2d, data_aux_string=None):
        unweighted_nme_3d = unweighted_nme_3d * 100 if unweighted_nme_3d is not None else "n/a"
        nme_vals = (
            ["n/a"] * 4 if nme_2d is None else [x * 100 for x in nme_2d]
        )
        data = self.data_name_table.get(data, data) + (data_aux_string or "")
        self._entries_by_model[model] += [
            [data] + list(euler_angles)
            + [float(np.average(euler_angles)), geodesic, rmse_pos, rmse_size, unweighted_nme_3d]
            + nme_vals
        ]

    def build(self) -> str:
        try:
            import tabulate
        except ImportError:
            tabulate = None
        prefix = commonprefix(list(self._entries_by_model.keys()))
        nicer = {m: relpath(m, prefix) if prefix else m for m in self._entries_by_model}
        rows_out = []
        for model, rows in self._entries_by_model.items():
            rows_out.append(nicer[model])
            if tabulate is not None:
                rows_out += tabulate.tabulate(
                    rows, self._header, tablefmt="github", floatfmt=".2f"
                ).splitlines()
            else:
                rows_out.append(" | ".join(self._header))
                for r in rows:
                    rows_out.append(
                        " | ".join(f"{v:.2f}" if isinstance(v, float) else str(v) for v in r)
                    )
        return "\n".join(rows_out)

    def build_json(self) -> str:
        prefix = commonprefix(list(map(os.path.dirname, self._entries_by_model.keys())))

        def model_table(rows):
            by_header = defaultdict(list)
            for row in rows:
                for name, value in zip(self._header, row):
                    by_header[name].append(value)
            return by_header

        return json.dumps(
            {relpath(m, prefix) if prefix else m: model_table(rows)
             for m, rows in self._entries_by_model.items()},
            indent=2,
        )


def report(net_filename, data_name, roi_config: RoiConfig, args, builder: TableBuilder):
    from neuralnet_tracker_traincode_tpu import pipelines, utils
    from neuralnet_tracker_traincode_tpu.eval import metrics as M
    from neuralnet_tracker_traincode_tpu.eval.predictor import Predictor, load_pose_network

    loader = pipelines.make_validation_loader(data_name, use_head_roi=roi_config.use_head_roi)
    net = load_pose_network(net_filename, args.device)
    predictor = Predictor(net, roi_config.expansion_factor)

    # Probe prediction/label keys for landmark support.
    sample = next(iter(loader))
    import jax.numpy as jnp

    probe = net(jnp.zeros((1, net.input_resolution, net.input_resolution, 1)))
    with_landmarks = "pt3d_68" in sample and "pt3d_68" in probe

    alignment: AlignmentScheme = args.alignment_scheme
    collection = {"pose_errs": M.NormalizedXYSError()}
    if alignment == "none":
        collection.update(
            geodesic_errs=M.GeodesicError(), euler_errs=M.EulerAngleErrors()
        )
    else:
        collection.update(
            geodesic_errs=M.AlignedRotationErrorMetric("geo", alignment, BIWI_HORIZONTAL_FOV),
            euler_errs=M.AlignedRotationErrorMetric("euler", alignment, BIWI_HORIZONTAL_FOV),
        )
    if with_landmarks:
        collection.update(uw_nme_3d=M.UnweightedKptNME(), nme_2d=M.KptNME(dimensions=2))
    metrics = M.MetricCollection(collection)

    results = predictor.evaluate(metrics, loader)

    poseerrs = np.asarray(results["pose_errs"])
    geodesic_errs = np.asarray(results["geodesic_errs"])
    eulererrs = np.asarray(results["euler_errs"])
    uw_nme_3d = np.asarray(results["uw_nme_3d"]) if with_landmarks else None
    nme_2d = results["nme_2d"] if with_landmarks else None

    e_posx, e_posy, e_size = poseerrs.T
    rmse_pos = np.sqrt(np.average(np.sum(np.square(np.vstack([e_posx, e_posy]).T), axis=1)))
    rmse_size = np.sqrt(np.average(np.square(e_size)))

    if args.vis != "none":
        _browse_worst_cases(args, data_name, roi_config, predictor,
                            {"kpts": uw_nme_3d, "rot": geodesic_errs, "size": e_size})

    builder.add_row(
        model=net_filename,
        data=data_name,
        euler_angles=(np.average(np.abs(eulererrs), axis=0) * utils.rad2deg).tolist(),
        geodesic=float(np.average(geodesic_errs) * utils.rad2deg),
        rmse_pos=float(rmse_pos * 100.0),
        rmse_size=float(rmse_size * 100.0),
        data_aux_string=" / " + str(roi_config),
        unweighted_nme_3d=float(np.average(uw_nme_3d)) if uw_nme_3d is not None else None,
        nme_2d=nme_2d,
    )


def _browse_worst_cases(args, data_name, roi_config, predictor, quantities):
    """Page through the worst-error samples with GT/pred overlays (`--vis`)."""
    from neuralnet_tracker_traincode_tpu import pipelines, vis
    from neuralnet_tracker_traincode_tpu.data.batch import Batch, Metadata

    quantity = quantities[args.vis]
    if quantity is None:
        print(f"Prediction for {args.vis} is not available.")
        return
    order = np.ascontiguousarray(np.argsort(quantity)[::-1])
    loader = pipelines.make_validation_loader(
        data_name, order=order, use_head_roi=roi_config.use_head_roi
    )

    def iter_gt_and_preds():
        for sample in loader:
            image = np.asarray(sample["image"])
            pred = predictor.predict_batch([image], np.asarray(sample["roi"])[None])
            pred_frame = next(iter(pred.undo_collate()))
            yield (sample, pred_frame)

    if args.vis_outdir:
        import itertools
        import os

        os.makedirs(args.vis_outdir, exist_ok=True)
        for i, gp in zip(range(32), iter_gt_and_preds()):
            img = vis.draw_prediction(gp)
            import cv2

            cv2.imwrite(join(args.vis_outdir, f"worst_{i:03d}.png"), img[..., ::-1])
        print(f"Wrote worst-case overlays to {args.vis_outdir}")
    else:
        import matplotlib

        matplotlib.use("TkAgg")
        from matplotlib import pyplot

        fig, btn = vis.matplotlib_plot_iterable(iter_gt_and_preds(), vis.draw_prediction)
        fig.suptitle(f"{data_name} / {roi_config}")
        pyplot.show()


def run(args):
    builder = TableBuilder()
    if not args.comprehensive_roi:
        roi_configs = [
            RoiConfig(expansion_factor=args.roi_expansion)
            if args.roi_expansion is not None
            else RoiConfig()
        ]
    else:
        assert args.roi_expansion is None, "Conflicting arguments"
        roi_configs = comprehensive_roi_configs
    for net_filename in args.filenames:
        for name in args.ds.split("+"):
            for roi_config in roi_configs:
                report(net_filename, name, roi_config, args, builder)
    if args.json:
        assert args.json.endswith(".json")
        print(f"writing {args.json}")
        with open(args.json, "w") as f:
            f.write(builder.build_json())
    else:
        print(builder.build())


def main():
    from neuralnet_tracker_traincode_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser(description="Evaluate pose networks")
    parser.add_argument("filenames", help="checkpoint or onnx model files", type=str, nargs="*")
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("--comprehensive-roi", action="store_true", default=False)
    parser.add_argument(
        "--alignment-scheme", choices=["perspective", "opal23", "none"], default="none"
    )
    parser.add_argument("--perspective-correction", dest="alignment_scheme",
                        action="store_const", const="perspective")
    parser.add_argument("--roi-expansion", default=None, type=float)
    parser.add_argument("--json", type=str, default=None)
    parser.add_argument("--ds", type=str, default="aflw2k3d")
    parser.add_argument(
        "--vis", default="none", choices=["none", "kpts", "rot", "size"],
        help="Browse worst-case samples by this error quantity",
    )
    parser.add_argument(
        "--vis-outdir", default=None, type=str,
        help="Save worst-case overlays here instead of an interactive window",
    )
    parser.add_argument(
        "--precision", default="float32", choices=["float32", "bfloat16"],
        help="matmul/conv precision for evaluation forwards; float32 matches "
             "the reference's torch-f32 eval semantics (the TPU default would "
             "be bfloat16); bfloat16 trades exactness for speed",
    )
    args = parser.parse_args()
    import jax

    with jax.default_matmul_precision(args.precision):
        run(args)


if __name__ == "__main__":
    main()
