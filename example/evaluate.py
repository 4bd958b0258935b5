"""Score the example pipeline output against crown labels.

Closes the quality loop (VERDICT r1 item 1b, r2 task 5): after
``example/train_full.py`` and ``example/example.py``, computes P/R/F1 +
mean IoU of the processed crown layer vs a label set over a confidence
sweep and records ``data/eval_report.json``.

Modes:
  default              eval vs ``data/autolabels.gpkg`` (training labels —
                       a CLOSED loop, kept for continuity)
  --holdout            restrict predictions AND labels to the spatially
                       held-out region recorded by
                       ``train_full.py --holdout-frac`` in
                       ``data/holdout.json`` — labels there were never
                       seen in training (report carries held_out: true)
  --labels PATH        eval against a different label set (e.g. region-grow
                       autolabels for a cross-generator check)

Reference counterpart: ``supplementary/training_validation.py`` (confidence
sweep) + ``supplementary/evaluation_compute_scores.py`` (greedy IoU
matching; its GT was independent annotation).
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _centroid_in(poly, b):
    c = poly.mean(axis=0)
    return b[0] <= c[0] <= b[2] and b[1] <= c[1] <= b[3]


def main() -> int:
    from treedetection_tpu.vector import read_gpkg
    from treedetection_tpu.eval.scores import evaluate

    ap = argparse.ArgumentParser()
    ap.add_argument("outputs", nargs="*", default=None,
                    help="processed_*.gpkg layers (default: example/output)")
    ap.add_argument("--labels", default=os.path.join(HERE, "data",
                                                     "autolabels.gpkg"))
    ap.add_argument("--holdout", action="store_true",
                    help="restrict to the held-out region of data/holdout.json")
    ap.add_argument("--report", default=os.path.join(HERE, "data",
                                                     "eval_report.json"))
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint the scored output was served from "
                         "(recorded in the report so quality numbers cite "
                         "the exact model, e.g. model_full_r101.npz)")
    ap.add_argument("--depth", type=int, default=None,
                    help="backbone depth of that checkpoint (recorded)")
    args = ap.parse_args()

    outputs = args.outputs or sorted(
        glob.glob(os.path.join(HERE, "output", "processed_*.gpkg")))
    if not outputs or not os.path.exists(args.labels):
        print("need processed_*.gpkg layers and a label gpkg "
              "(run train_full.py then example.py first)", file=sys.stderr)
        return 1

    region = None
    if args.holdout:
        with open(os.path.join(HERE, "data", "holdout.json")) as fh:
            region = json.load(fh)["held_out_bounds"]

    gt_geoms, _, _ = read_gpkg(args.labels)
    gt = [np.asarray(g[0][0], dtype=np.float64) for g in gt_geoms if g and g[0]]
    if region:
        gt = [g for g in gt if _centroid_in(g, region)]

    preds, scores = [], []
    for p in outputs:
        geoms, props, _ = read_gpkg(p)
        for g, pr in zip(geoms, props):
            if g and g[0]:
                poly = np.asarray(g[0][0], dtype=np.float64)
                if region and not _centroid_in(poly, region):
                    continue
                preds.append(poly)
                scores.append(float(pr.get("Confidence_score", 0.0)))

    rows = []
    for conf in (0.3, 0.5, 0.7):
        for iou in (0.3, 0.5):
            r = evaluate(preds, scores, gt, iou_threshold=iou,
                         confidence_threshold=conf)
            rows.append(r)
            print(f"conf>={conf} iou>={iou}: P={r['precision']:.3f} "
                  f"R={r['recall']:.3f} F1={r['f1']:.3f} "
                  f"meanIoU={r['mean_iou']:.3f} "
                  f"(tp={r['tp']} fp={r['fp']} fn={r['fn']})")

    best = max(rows, key=lambda r: r["f1"])
    report = {"n_predictions": len(preds), "n_ground_truth": len(gt),
              "labels": os.path.basename(args.labels),
              "held_out": bool(region),
              "held_out_bounds": region,
              "sweep": rows, "best_f1": best["f1"], "best_point": best}
    if args.checkpoint:
        report["checkpoint"] = os.path.basename(args.checkpoint)
    if args.depth:
        report["depth"] = args.depth
    with open(args.report, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"best_f1": round(best["f1"], 4), "held_out": bool(region),
                      "n_predictions": len(preds), "n_gt": len(gt)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
