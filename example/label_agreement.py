"""Quantify autolabel noise and build a consensus label set (VERDICT r4
task 4).

The pipeline's quality numbers are measured against Voronoi autolabels
(``data/autolabels.gpkg``, ``autolabel/voronoi.py``); a second independent
generator (region-grow, ``autolabel/sam.py::region_grow`` path) produced
``data/autolabels_rg.gpkg``.  The round-4 eval showed the model's held-out F1
against Voronoi (0.401) far above its F1 against region-grow (0.290) — this
script measures how much of that gap is the GENERATORS disagreeing with each
other (the label-noise ceiling) rather than the model erring:

1. scores each generator's labels AS predictions against the other's at
   IoU 0.3/0.5, whole-sample and held-out-strip (the ceiling any model can
   reach against either label set is bounded by this agreement);
2. writes a CONSENSUS label set: Voronoi crowns with a region-grow match at
   IoU >= 0.5 keep their (Voronoi) geometry — the high-precision agreed
   core — and the report records how many crowns each rule kept/dropped.

Reference counterpart: the reference's eval assumes independent annotations
(``/root/reference/supplementary/evaluation_compute_scores.py:113-138,232``);
this repo has no independent annotation source in the no-egress environment,
so generator agreement is the measurable proxy for label quality.

Usage: python example/label_agreement.py
Writes data/label_agreement.json and data/autolabels_consensus.gpkg.
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _load(path):
    from treedetection_tpu.vector import read_gpkg
    geoms, _, srs = read_gpkg(path)
    return [np.asarray(g[0][0], dtype=np.float64)
            for g in geoms if g and g[0]], srs


def _centroid_in(poly, b):
    c = poly.mean(axis=0)
    return b[0] <= c[0] <= b[2] and b[1] <= c[1] <= b[3]


def main() -> int:
    from treedetection_tpu.eval.scores import evaluate, greedy_iou_match
    from treedetection_tpu.vector import write_gpkg

    vor_path = os.path.join(HERE, "data", "autolabels.gpkg")
    rg_path = os.path.join(HERE, "data", "autolabels_rg.gpkg")
    if not (os.path.exists(vor_path) and os.path.exists(rg_path)):
        print("need data/autolabels.gpkg and data/autolabels_rg.gpkg "
              "(run train_full.py / the region-grow generator first)",
              file=sys.stderr)
        return 1
    vor, srs = _load(vor_path)
    rg, _ = _load(rg_path)

    holdout = None
    hpath = os.path.join(HERE, "data", "holdout.json")
    if os.path.exists(hpath):
        with open(hpath) as fh:
            holdout = json.load(fh)["held_out_bounds"]

    def agreement(preds, gts, region):
        if region:
            preds = [p for p in preds if _centroid_in(p, region)]
            gts = [g for g in gts if _centroid_in(g, region)]
        ones = [1.0] * len(preds)
        return {
            "n_pred": len(preds), "n_gt": len(gts),
            "iou_0.3": evaluate(preds, ones, gts, 0.3, 0.0),
            "iou_0.5": evaluate(preds, ones, gts, 0.5, 0.0),
        }

    report = {
        "voronoi_labels": os.path.basename(vor_path),
        "region_grow_labels": os.path.basename(rg_path),
        "n_voronoi": len(vor),
        "n_region_grow": len(rg),
        # symmetric: P/R swap roles, F1 is the shared agreement number
        "voronoi_vs_rg_full": agreement(vor, rg, None),
        "rg_vs_voronoi_full": agreement(rg, vor, None),
    }
    if holdout:
        report["held_out_bounds"] = holdout
        report["voronoi_vs_rg_holdout"] = agreement(vor, rg, holdout)
        report["rg_vs_voronoi_holdout"] = agreement(rg, vor, holdout)

    # consensus: Voronoi geometry where region-grow agrees at IoU >= 0.5
    matches, un_v, un_r = greedy_iou_match(vor, rg, 0.5)
    consensus = [vor[i] for i, _, _ in matches]
    cons_path = os.path.join(HERE, "data", "autolabels_consensus.gpkg")
    write_gpkg(cons_path, consensus,
               [{"Confidence_score": 1.0, "consensus_iou": float(iou)}
                for _, _, iou in matches], srs_id=srs)
    report["consensus"] = {
        "rule": "voronoi geometry where a region-grow crown matches at "
                "IoU >= 0.5 (greedy one-to-one)",
        "n_consensus": len(consensus),
        "n_voronoi_dropped": len(un_v),
        "n_region_grow_unmatched": len(un_r),
        "path": os.path.basename(cons_path),
        "mean_match_iou": (float(np.mean([m[2] for m in matches]))
                           if matches else 0.0),
    }

    out = os.path.join(HERE, "data", "label_agreement.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    f1_full = report["voronoi_vs_rg_full"]["iou_0.3"]["f1"]
    print(json.dumps({
        "inter_generator_f1_iou0.3": round(f1_full, 3),
        "inter_generator_f1_iou0.5":
            round(report["voronoi_vs_rg_full"]["iou_0.5"]["f1"], 3),
        "n_consensus": len(consensus),
        "report": os.path.relpath(out, HERE)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
