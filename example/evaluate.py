"""Score the example pipeline output against the Voronoi autolabels.

Closes the quality loop (VERDICT r1 item 1b): after ``example/train_full.py``
and ``example/example.py``, this computes P/R/F1 + mean IoU of the processed
crown layer vs ``data/autolabels.gpkg`` (the training labels) over a
confidence sweep, and records ``data/eval_report.json``.

Reference counterpart: ``supplementary/training_validation.py`` (confidence
sweep on one image) + ``supplementary/evaluation_compute_scores.py`` (greedy
IoU matching).
"""

import glob
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    from treedetection_tpu.vector import read_gpkg
    from treedetection_tpu.eval.scores import evaluate

    labels = os.path.join(HERE, "data", "autolabels.gpkg")
    outputs = sorted(glob.glob(os.path.join(HERE, "output", "processed_*.gpkg")))
    if len(sys.argv) > 1:
        outputs = [sys.argv[1]]
    if not outputs or not os.path.exists(labels):
        print("need example/output/processed_*.gpkg and data/autolabels.gpkg "
              "(run train_full.py then example.py first)", file=sys.stderr)
        return 1

    gt_geoms, _, _ = read_gpkg(labels)
    gt = [np.asarray(g[0][0], dtype=np.float64) for g in gt_geoms if g and g[0]]

    preds, scores = [], []
    for p in outputs:
        geoms, props, _ = read_gpkg(p)
        for g, pr in zip(geoms, props):
            if g and g[0]:
                preds.append(np.asarray(g[0][0], dtype=np.float64))
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
              "sweep": rows, "best_f1": best["f1"], "best_point": best}
    out = os.path.join(HERE, "data", "eval_report.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"best_f1": round(best["f1"], 4),
                      "n_predictions": len(preds), "n_gt": len(gt)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
