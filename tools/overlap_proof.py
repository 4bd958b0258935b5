"""Measure the overlapped predict/postprocess pipeline on a 2-file sample
(VERDICT r4 task 5 'Done' criterion: 2-file ``process_files`` wall <= 0.9x
the serial sum).

Builds a fresh workspace with the bundled 1 km^2 sample raster TWICE (the
second copy georeferenced 1 km east, nDSM twin likewise), then runs
``process_files`` once with ``overlap_postprocess: true`` and once with
``false`` — warm order alternated is unnecessary: both runs share the same
process (global jit cache), so the SECOND configuration measured pays no
compile; we run overlap LAST so any residual warmup bias works AGAINST the
overlap claim.

Appends a JSON record to ``tools/overlap_proof.json``.

Usage: timeout 3000 python tools/overlap_proof.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "example"))


def _build_workspace(tmp: str) -> str:
    import numpy as np
    from example import ensure_sample_data
    ensure_sample_data()
    from treedetection_tpu.geo import Affine, GeoTiff, write_geotiff

    data = os.path.join(REPO, "example", "data")
    os.makedirs(os.path.join(tmp, "rgb"))
    os.makedirs(os.path.join(tmp, "nDSM"))
    for sub in ("rgb", "nDSM"):
        src = os.path.join(data, sub, "324125317.tif")
        dst0 = os.path.join(tmp, sub, "324125317.tif")
        shutil.copyfile(src, dst0)
        # second file: same pixels, georeferenced 1 km east, new identifier
        g = GeoTiff(src)
        arr = g.read()
        t = g.transform
        crs, nodata = g.crs, g.nodata
        g.close()
        t2 = Affine(t.a, t.b, t.c + 1000.0, t.d, t.e, t.f)
        write_geotiff(os.path.join(tmp, sub, "324125318.tif"),
                      np.asarray(arr), t2, crs=crs, nodata=nodata)
    return tmp


def _run(ws: str, overlap: bool) -> dict:
    from treedetection_tpu.config import Config, get_config
    from treedetection_tpu.detection import process_files
    from treedetection_tpu.vector import read_gpkg

    out_dir = os.path.join(ws, f"out_{'ov' if overlap else 'st'}")
    tiles = os.path.join(ws, f"tiles_{'ov' if overlap else 'st'}")
    Config.reset()
    config, _ = get_config(os.path.join(REPO, "example", "config.yml"))
    config["image_directory"] = os.path.join(ws, "rgb")
    config["height_data_path"] = os.path.join(ws, "nDSM")
    config["output_directory"] = out_dir
    config["tiles_path"] = tiles
    config["keep_intermediate"] = True
    config["continue"] = os.path.join(ws, "continue.yml")
    config["overlap_postprocess"] = overlap
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(tiles, exist_ok=True)
    t0 = time.time()
    outputs = process_files(config)
    wall = time.time() - t0
    crowns = 0
    for p in outputs:
        if os.path.exists(p):
            geoms, _, _ = read_gpkg(p)
            crowns += len(geoms)
    return {"wall_s": round(wall, 1), "files": len(outputs),
            "crowns": crowns}


def main() -> int:
    from treedetection_tpu.utils.xla_cache import setup_compilation_cache
    setup_compilation_cache()
    import jax
    if jax.default_backend() == "cpu":
        print("overlap_proof: no accelerator; aborting", file=sys.stderr)
        return 2
    tmp = tempfile.mkdtemp(prefix="overlap_proof_")
    try:
        _build_workspace(tmp)
        warm = _run(tmp, overlap=False)  # cold pass (pays the compiles)
        print(f"overlap_proof: cold staged pass {warm}", file=sys.stderr)
        # measured passes on fresh workspaces (same process: jit cache warm)
        shutil.rmtree(os.path.join(tmp, "out_st"), ignore_errors=True)
        shutil.rmtree(os.path.join(tmp, "tiles_st"), ignore_errors=True)
        for sub in ("rgb", "nDSM"):  # drop strips so preprocess reruns
            shutil.rmtree(os.path.join(tmp, sub, "merged"),
                          ignore_errors=True)
        staged = _run(tmp, overlap=False)
        for sub in ("rgb", "nDSM"):
            shutil.rmtree(os.path.join(tmp, sub, "merged"),
                          ignore_errors=True)
        overlapped = _run(tmp, overlap=True)
        rec = {
            "t": time.strftime("%Y-%m-%d %H:%M:%S"),
            "staged_wall_s": staged["wall_s"],
            "overlap_wall_s": overlapped["wall_s"],
            "ratio": round(overlapped["wall_s"] / max(staged["wall_s"],
                                                      1e-9), 3),
            "staged": staged, "overlapped": overlapped,
            "crowns_equal": staged["crowns"] == overlapped["crowns"],
        }
        path = os.path.join(REPO, "tools", "overlap_proof.json")
        with open(path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
