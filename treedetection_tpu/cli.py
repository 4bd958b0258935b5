"""Command-line interface.

The reference had no CLI (entry was ``python example/example.py`` or the
``detection.py`` ``__main__`` block, SURVEY §1); this adds one without
changing the library API::

    treedetection run        config.yml          # full pipeline
    treedetection preprocess config.yml          # stage 1 only
    treedetection predict    config.yml          # stage 2 only
    treedetection postprocess config.yml         # stage 3 only
    treedetection eval PRED.gpkg GT.gpkg         # score an output layer
    treedetection voronoi NDSM.tif OUT.gpkg      # nDSM autolabels
    treedetection autolabel IMGDIR ANNDIR OUT    # box-prompted autolabel+eval
    treedetection bench                          # one-line JSON benchmark
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="treedetection",
        description="TPU-native tree-crown detection pipeline")
    sub = parser.add_subparsers(dest="command", required=True)

    for name, help_text in (
            ("run", "full pipeline: preprocess -> predict -> postprocess"),
            ("preprocess", "tiling + overlap merging only"),
            ("predict", "model inference + stitching only"),
            ("postprocess", "crown filtering only")):
        p = sub.add_parser(name, help=help_text)
        p.add_argument("config", help="YAML config path")

    p = sub.add_parser("eval", help="score predictions against annotations")
    p.add_argument("predictions", help="processed crowns GPKG")
    p.add_argument("ground_truth", help="annotation GPKG")
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--confidence", type=float, default=0.3)

    p = sub.add_parser("voronoi", help="generate nDSM Voronoi autolabels")
    p.add_argument("ndsm", help="nDSM GeoTIFF")
    p.add_argument("output", help="output GPKG")
    p.add_argument("--canopy-threshold", type=float, default=2.5)
    p.add_argument("--min-seed-height", type=float, default=3.0)

    p = sub.add_parser("autolabel",
                       help="Cambridge-style per-image autolabel + eval "
                            "(box prompts from annotations)")
    p.add_argument("image_dir", help="directory of .tif images")
    p.add_argument("annotation_dir", help="directory of per-image .gpkg")
    p.add_argument("out_dir", help="output directory for autolabel GPKGs")
    p.add_argument("--sam-checkpoint",
                   help="segment_anything checkpoint (default: first-party "
                        "region-grow generator)")
    p.add_argument("--sam-model-type", default="vit_h")

    sub.add_parser("bench", help="run the one-line JSON benchmark")

    args = parser.parse_args(argv)

    if args.command in ("run", "preprocess", "predict", "postprocess"):
        from treedetection_tpu.config import get_config
        from treedetection_tpu import detection
        config, _ = get_config(args.config)
        fn = {"run": detection.process_files,
              "preprocess": detection.preprocess_files,
              "predict": detection.predict_tiles,
              "postprocess": detection.postprocess_files}[args.command]
        outputs = fn(config)
        for out in outputs or []:
            print(out)
        return 0

    if args.command == "eval":
        from treedetection_tpu.eval.validation import evaluate_gpkg_pair
        metrics = evaluate_gpkg_pair(args.predictions, args.ground_truth,
                                     args.iou, args.confidence)
        print(json.dumps(metrics, indent=1))
        return 0

    if args.command == "voronoi":
        from treedetection_tpu.autolabel import generate_voronoi_labels
        n = generate_voronoi_labels(args.ndsm, args.output,
                                    canopy_threshold=args.canopy_threshold,
                                    min_seed_height=args.min_seed_height)
        print(f"{n} crowns -> {args.output}")
        return 0

    if args.command == "autolabel":
        import logging
        logging.basicConfig(level=logging.INFO)
        gen = None
        if args.sam_checkpoint:
            from treedetection_tpu.autolabel import SamMaskGenerator
            gen = SamMaskGenerator(args.sam_checkpoint,
                                   model_type=args.sam_model_type)
        from treedetection_tpu.autolabel import autolabel_directory
        rows = autolabel_directory(args.image_dir, args.annotation_dir,
                                   args.out_dir, mask_generator=gen,
                                   logger=logging.getLogger("autolabel"))
        print(json.dumps(rows, indent=1))
        return 0

    if args.command == "bench":
        import runpy
        import os
        # bench.py ships at the repo root, not inside the package — present
        # in a source checkout only.  Check cwd as a fallback and fail with
        # a pointer instead of runpy's bare FileNotFoundError.
        candidates = [
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench.py"),
            os.path.join(os.getcwd(), "bench.py"),
        ]
        bench = next((p for p in candidates if os.path.exists(p)), None)
        if bench is None:
            print("bench.py not found (it lives at the repository root, "
                  "not in the installed package); run from a source "
                  "checkout or pass its directory as cwd", file=sys.stderr)
            return 2
        runpy.run_path(bench, run_name="__main__")
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
