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


def _write_grid(root, rng, nx=2, ny=1):
    """nx x ny adjacent 100 m x 100 m images (right- and down-neighbors)
    + nDSM twins."""
    (root / "rgb").mkdir(parents=True)
    (root / "nDSM").mkdir(parents=True)
    i = 0
    for iy in range(ny):
        for ix in range(nx):
            t = Affine.from_origin(412000.0 + 100.0 * ix,
                                   5318000.0 - 100.0 * iy, 0.5, 0.5)
            rgbi = rng.integers(0, 255, (200, 200, 4), dtype=np.uint8)
            ndsm = (rng.random((200, 200)) * 20).astype(np.float32)
            name = f"{324125317 + i}.tif"
            i += 1
            write_geotiff(str(root / "rgb" / name), rgbi, t, crs=25832)
            write_geotiff(str(root / "nDSM" / name), ndsm, t, crs=25832,
                          nodata=-9999.0)


def _strip_names(root):
    """Merged seam-strip filenames under both source dirs."""
    return (sorted(p.name for p in (root / "rgb" / "merged").glob("*.tif"))
            + sorted(p.name for p in (root / "nDSM" / "merged").glob("*.tif")))


def _write_config(root, extra=None):
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
    cfg.update(extra or {})
    (root / "model.ckpt").write_text("placeholder")  # random-init path
    path = root / "config.yml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def _patch_fake_forward(monkeypatch):
    """Replace the Predictor's jitted forward with a deterministic fake
    emitting ONE centered disk detection per tile (packed wire format).

    Random-init weights produce whole-window polygons that the stitcher's
    shrunk-box filter always drops, making crown-level pipeline comparisons
    vacuous; the fake keeps every orchestration property under test
    (partition, seam strips, manifests, ownership, overlap scheduling)
    while guaranteeing crowns exist."""
    from treedetection_tpu import prediction as pred_mod

    def fake_build(self, key, pad, content, size):
        D = self.cfg.max_detections
        R = self.cfg.mask_pool * 2
        yy, xx = np.mgrid[:R, :R]
        disk = ((yy - R / 2.0) ** 2 + (xx - R / 2.0) ** 2) < (R / 3.0) ** 2

        def fn(batch):
            B = int(np.asarray(batch).shape[0])
            boxes = np.zeros((B, D, 4), dtype="<f4")
            boxes[:, 0] = [content * 0.4, content * 0.4,
                           content * 0.6, content * 0.6]
            scores = np.zeros((B, D), dtype="<f4")
            scores[:, 0] = 0.9
            classes = np.zeros((B, D), dtype="<i4")
            valid = np.zeros((B, D), dtype=np.uint8)
            valid[:, 0] = 1
            masks = np.zeros((B, D, R, R), dtype=np.uint8)
            masks[:, 0, disk] = 255
            over = np.zeros((B, 1), dtype="<i4")
            return np.concatenate([
                boxes.reshape(B, -1).view(np.uint8),
                scores.view(np.uint8), classes.view(np.uint8),
                valid, masks.reshape(B, -1),
                over.view(np.uint8), over.view(np.uint8)], axis=1)

        entry = (fn, pad / content)
        self._fwd_cache[key] = entry
        return entry

    monkeypatch.setattr(pred_mod.Predictor, "_build_forward", fake_build)


def _run_stage(stage_fn, cfg_path, monkeypatch, host_id, num_hosts):
    """Run ONE pipeline stage as a simulated host.  Stage-wise sequencing
    (all hosts preprocess, then all predict, then all postprocess) mirrors
    the real multihost barriers in ``process_files`` — a host's predict
    partition must see every other host's seam strips, which exist only
    after ALL hosts finished preprocessing."""
    from treedetection_tpu.config import get_config, Config
    monkeypatch.setenv("TREEDETECTION_NUM_HOSTS", str(num_hosts))
    monkeypatch.setenv("TREEDETECTION_HOST_ID", str(host_id))
    Config.reset()
    config, _ = get_config(cfg_path)
    return stage_fn(config)


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

    @pytest.mark.slow
    def test_eight_host_run_matches_single_host(self, tmp_path, rng,
                                                monkeypatch):
        """8 simulated hosts — the BASELINE v5e-8 host count (VERDICT r4
        task 8) — over a 4x2 image grid: file-list partition, cross-host
        seam strips in BOTH directions (right and down neighbors), per-host
        manifest shards, and orphan ownership must reproduce the single-host
        run's crown multiset exactly."""
        mh = tmp_path / "mh"
        sh = tmp_path / "sh"
        seed = rng.integers(0, 2**31)
        _write_grid(mh, np.random.default_rng(int(seed)), nx=4, ny=2)
        _write_grid(sh, np.random.default_rng(int(seed)), nx=4, ny=2)
        cfg_mh = _write_config(mh)
        cfg_sh = _write_config(sh)
        # deterministic centered detections so the crown multiset is
        # non-vacuous (random-init crowns never survive the shrunk-box
        # stitch filter)
        _patch_fake_forward(monkeypatch)

        # stage-wise host simulation: sequential hosts WITHIN each stage,
        # stages in order — the simulation of process_files' cross-host
        # barriers (preprocess_done / predict_done)
        from treedetection_tpu.detection import (
            postprocess_files, predict_tiles, preprocess_files)
        for stage in (preprocess_files, predict_tiles, postprocess_files):
            for host in range(8):
                _run_stage(stage, cfg_mh, monkeypatch, host, 8)
        _run_pipeline(cfg_sh, monkeypatch)

        # identical strip set: 6 right + 4 down seams, rgbi + height each
        mh_strips = _strip_names(mh)
        assert mh_strips == _strip_names(sh)
        assert len(mh_strips) == 20
        # every stitched layer processed exactly once, none missing
        mh_crowns = _crown_multiset(mh / "out")
        sh_crowns = _crown_multiset(sh / "out")
        assert sum(sh_crowns.values()) > 0, "vacuous: no crowns detected"
        assert mh_crowns == sh_crowns
        n_mh = len(list((mh / "out").glob("processed_*.gpkg")))
        n_sh = len(list((sh / "out").glob("processed_*.gpkg")))
        assert n_mh == n_sh == 18  # 8 base images + 10 seam strips
        # per-host manifest shards exist (recovery.<host>.yaml, one per
        # host that postprocessed at least one layer)
        shards = {p.name for p in (mh / "out").glob("recovery.*.yaml")}
        assert len(shards) >= 2, shards

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


class TestOverlapPipeline:
    @pytest.mark.slow
    def test_overlap_matches_staged(self, tmp_path, rng, monkeypatch):
        """The overlapped predict/postprocess pipeline (VERDICT r4 task 5,
        ``detection._predict_postprocess_overlapped``, default ON for
        single-host single-model) must produce exactly the staged pipeline's
        outputs — same crown multiset, same processed layers."""
        ov = tmp_path / "ov"
        st = tmp_path / "st"
        seed = rng.integers(0, 2**31)
        _write_grid(ov, np.random.default_rng(int(seed)))
        _write_grid(st, np.random.default_rng(int(seed)))
        cfg_ov = _write_config(ov)
        cfg_st = _write_config(st, {"overlap_postprocess": False})
        _patch_fake_forward(monkeypatch)
        _run_pipeline(cfg_ov, monkeypatch)
        _run_pipeline(cfg_st, monkeypatch)
        ov_crowns = _crown_multiset(ov / "out")
        st_crowns = _crown_multiset(st / "out")
        assert sum(st_crowns.values()) > 0, "vacuous: no crowns detected"
        assert ov_crowns == st_crowns
        assert (len(list((ov / "out").glob("processed_*.gpkg")))
                == len(list((st / "out").glob("processed_*.gpkg"))) == 3)


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
