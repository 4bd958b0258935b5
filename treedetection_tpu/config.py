"""Configuration system: YAML schema, defaults, logging, and device selection.

Behavioral parity with the reference config layer (reference
``TreeDetection/config.py:144-238``): same YAML keys, same defaults, same
``(dict, Config)`` return pair, and the same process-global ``Config`` attribute
bag that all stages read.  Differences (TPU-native):

* ``device`` selects a JAX platform (``tpu``/``cpu``) instead of a CUDA index
  (reference ``config.py:112-142``), and a ``mesh_shape`` key describes the
  device mesh used to shard tile batches (no reference counterpart — the
  reference is single-GPU).
* the detectron2 model-cfg builder (reference ``config.py:25-66``) is replaced
  by :func:`model_spec`, a plain dataclass consumed by the Flax Mask R-CNN.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import sys
import time
from typing import Any, Dict, Optional, Tuple

import yaml

LOGGER_NAME = "treedetection_tpu"


class Config:
    """Process-global attribute bag shared by every stage.

    Mirrors the reference singleton (reference ``config.py:12-23``): config dict
    keys become class attributes.  Kept for API parity; new code should prefer
    passing the config dict explicitly.
    """

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def _load_into_config(self, config: Dict[str, Any]) -> None:
        for key, value in config.items():
            setattr(type(self), key, value)

    @classmethod
    def reset(cls) -> None:
        """Drop all loaded attributes (used by tests; no reference counterpart)."""
        for key in list(vars(cls)):
            if not key.startswith("_") and key != "reset":
                try:
                    delattr(cls, key)
                except AttributeError:
                    pass
        cls._instance = None


def load_config(config_path: str) -> Dict[str, Any]:
    """Load a raw YAML config file into a dict (reference ``config.py:68-79``)."""
    if not os.path.exists(config_path):
        raise FileNotFoundError(f"Config file not found: {config_path}")
    with open(config_path, "r") as fh:
        config = yaml.safe_load(fh) or {}
    if not isinstance(config, dict):
        raise ValueError(f"Config file {config_path} must contain a YAML mapping.")
    return config


def setup_logging(log_dir: str, debug: bool = False) -> logging.Logger:
    """Timestamped file log + console handler (reference ``config.py:81-110``)."""
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(logging.DEBUG if debug else logging.INFO)
    # Reset handlers so repeated get_config calls don't stack duplicates.
    for handler in list(logger.handlers):
        logger.removeHandler(handler)
    timestamp = time.strftime("%Y%m%d-%H%M%S")
    file_handler = logging.FileHandler(os.path.join(log_dir, f"run_{timestamp}.log"))
    file_handler.setLevel(logging.DEBUG)
    console = logging.StreamHandler(sys.stdout)
    console.setLevel(logging.DEBUG if debug else logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    file_handler.setFormatter(fmt)
    console.setFormatter(fmt)
    logger.addHandler(file_handler)
    logger.addHandler(console)
    logger.propagate = False
    return logger


def set_device_configuration(config: Dict[str, Any], raw_device) -> None:
    """Normalize the ``device`` key to a JAX platform selection.

    The reference picks a CUDA device index with CPU fallback (reference
    ``config.py:112-142``).  Here the equivalent decision is TPU vs CPU, and the
    number of local devices to use; accepted forms:

    * ``None`` / ``"auto"``: use whatever ``jax.devices()`` reports (TPU if live)
    * ``"cpu"``: force CPU
    * ``"tpu"`` / ``"tpu:N"``: require TPU, optionally the first N chips
    """
    import jax  # local import: keep config importable without jax initialized

    from treedetection_tpu.utils.xla_cache import setup_compilation_cache
    config["compilation_cache_dir"] = setup_compilation_cache(
        config.get("compilation_cache_dir"))

    platform = None
    n_devices: Optional[int] = None
    if raw_device is None or raw_device == "auto":
        platform = None
    elif isinstance(raw_device, int):
        platform = None
        n_devices = max(1, raw_device)
    elif isinstance(raw_device, str):
        dev = raw_device.strip().lower()
        if ":" in dev:
            dev, _, idx = dev.partition(":")
            n_devices = max(1, int(idx)) if idx.isdigit() else None
        if dev in ("cpu", "tpu"):
            platform = dev
        elif dev.isdigit():
            n_devices = max(1, int(dev))
        elif dev.startswith("cuda"):
            # Reference configs may carry cuda device strings; run on the
            # available accelerator instead (reference fell back to CPU,
            # config.py:138-142 — here falling "up" to TPU is the right move).
            platform = None
        else:
            raise ValueError(f"Unrecognized device specification: {raw_device!r}")
    else:
        raise ValueError(f"Unrecognized device specification: {raw_device!r}")

    try:
        devices = jax.devices(platform) if platform else jax.devices()
    except RuntimeError:
        # "tpu" requested but the chip registers under a vendor platform
        # name (e.g. "axon" on relayed v5e): any non-cpu accelerator
        # satisfies the request.  Only fall back to CPU when there is no
        # accelerator at all — and say so, since silently running a
        # county-scale job on CPU (and skipping the TPU-input-size crash
        # gate) is exactly what the user asked to prevent.
        accel = [d for d in jax.devices() if d.platform != "cpu"]
        if platform == "tpu" and accel:
            devices = accel
        else:
            import warnings
            warnings.warn(
                f"device: {raw_device!r} requested but no such platform is "
                f"available; falling back to CPU")
            devices = jax.devices("cpu")
    if n_devices is not None:
        devices = devices[:n_devices]
    config["device"] = devices[0].platform
    config["devices"] = devices
    config["num_devices"] = len(devices)


_DEFAULTS: Tuple[Tuple[str, Any], ...] = (
    # Paths / staging (reference config.py:183-190)
    ("output_directory", "./output"),
    ("tiles_path", "./tiles"),
    # Tiling (reference config.py:193-197)
    ("tile_width", 50),
    ("tile_height", 50),
    ("buffer", 20),
    ("batch_size", 10),
    # Overlap machinery (reference config.py:199-205)
    ("use_overlap", True),
    ("overlapping_tiles_width", 3),
    ("overlapping_tiles_height", 3),
    ("merged_path", "merged"),
    ("image_merged_regex", "FDOP20_(\\d+)_(\\d+)_(\\d+)_(\\d+)_(\\d+)\\.tif"),
    ("height_data_merged_regex", "FDOP20_(\\d+)_(\\d+)\\.tif"),
    # Stitching (reference config.py:209-211)
    ("iou_threshold", 0.5),
    ("confidence_threshold_stitching", 0.3),
    ("area_threshold", 1),
    # Postprocessing (reference config.py:214-217)
    ("exclude_files", []),
    ("confidence_threshold", 0.3),
    ("containment_threshold", 0.9),
    ("height_threshold", 3),
    # Raster scaling factors (reference example/config.yml:36-37; the reference
    # reads these undefaulted off the singleton — we default them instead of
    # crashing, keeping the documented example values)
    ("ndvi_scaling_factor", 0.2),
    ("height_scaling_factor", 1.0),
    # Runtime (reference config.py:222-233)
    ("parallel", True),
    ("num_workers", None),
    ("verbose", False),
    ("debug", False),
    ("keep_intermediate", False),
    ("timestamped_output_directory", False),
    ("simplify_tolerance", 0.2),
    ("building_shapes", None),
    # NDVI gates: the reference leaves these with NO default and crashes when
    # absent (reference postprocessing.py:612, config gotcha noted in SURVEY §5).
    # We default to the example-config values but warn, preserving behavior for
    # configs that do set them.
    ("ndvi_mean_threshold", 0.1),
    ("ndvi_var_threshold", 0.1),
    # TPU-native additions (no reference counterpart)
    ("mesh_shape", None),          # e.g. {"data": 8}; None -> 1D mesh over all devices
    ("model_input_size", 1024),    # static model input resolution (px)
    ("max_detections", 100),       # static per-tile detection budget
    ("mixed_precision", True),     # bfloat16 conv path
    ("prefetch_batches", 2),       # Predictor pipeline depth: decode-prefetch
                                   # window AND batches kept in flight
    ("eager_stitch", True),        # stitch transform at predict flush (the
                                   # stitch stage then skips JSON re-parse)
    ("stitch_cache_images", 8),    # eager-sink capacity before file fallback
    ("pixel_mean", None),          # BGR mean override (default caffe values)
    ("pixel_std", None),           # BGR std override; set [57.375, 57.12,
                                   # 58.395] for checkpoints trained by
                                   # treedetection_tpu.train (random init)
)


# Model input sizes that crash the remote TPU worker mid-program (backend
# bug, not a model bug): the full Mask R-CNN program at 512^2 reproducibly
# kills the worker while 1024^2 (the validated production shape) and the
# backbone alone at 512 run fine.  Reproducer + bisect notes:
# ``tools/repro_512_crash.py``.  Fail fast at config load instead of dying
# mid-county-run; lift via TD_ALLOW_UNSAFE_INPUT_SIZE=1 once the backend is
# fixed.
KNOWN_BAD_TPU_INPUT_SIZES = frozenset({512})


def _validate_model_input_size(config: Dict[str, Any]) -> None:
    size = int(config.get("model_input_size", 1024))
    # any accelerator platform counts: on the target machine the TPU chip
    # reports platform "axon", never the literal "tpu"
    device = str(config.get("device") or "")
    if (device not in ("", "cpu")
            and size in KNOWN_BAD_TPU_INPUT_SIZES
            and os.environ.get("TD_ALLOW_UNSAFE_INPUT_SIZE") != "1"):
        raise ValueError(
            f"model_input_size={size} is known to crash the TPU worker on "
            f"this backend (see tools/repro_512_crash.py). Use 1024 (the "
            f"validated shape), run on device: cpu, or set "
            f"TD_ALLOW_UNSAFE_INPUT_SIZE=1 to override once the backend bug "
            f"is fixed.")


def get_config(config_path: str) -> Tuple[Dict[str, Any], Config]:
    """Load + validate + default-fill the YAML config.

    Same contract as the reference (reference ``config.py:144-238``): returns
    ``(config_dict, Config_singleton)``.  Model validation accepts either a
    ``combined_model`` or the (urban, forest, outline) triple (reference
    ``config.py:177-180``); model files here are Orbax/Flax checkpoints or
    detectron2 ``.pth`` files (converted on load).
    """
    config = load_config(config_path)

    base = os.path.dirname(os.path.abspath(config_path))

    def _resolve(p):
        if p is None:
            return None
        return p if os.path.isabs(p) else os.path.normpath(os.path.join(base, p))

    # NOTE: merged_path is deliberately NOT resolved — it is a bare
    # subdirectory NAME joined under each image directory (detection.py,
    # merging.py), not a path; resolving it to an absolute path would make
    # os.path.join discard the image directory and lose every seam strip.
    for key in ("image_directory", "height_data_path", "combined_model",
                "urban_model", "forrest_model", "forrest_outline",
                "output_directory", "tiles_path", "continue_path"):
        if config.get(key):
            config[key] = _resolve(config[key])
    if config.get("exclude_files"):
        config["exclude_files"] = [_resolve(p) for p in config["exclude_files"]]

    assert config.get("image_directory") and os.path.exists(config["image_directory"]), (
        "Config key 'image_directory' is unset or does not point to an existing path.")
    assert config.get("height_data_path") and os.path.exists(config["height_data_path"]), (
        "Config key 'height_data_path' (nDSM rasters) is unset or does not point to an existing path.")

    if not config.get("combined_model") or not os.path.exists(config["combined_model"]):
        assert config.get("urban_model") and os.path.exists(config["urban_model"]), (
            "No 'combined_model' given, and 'urban_model' is unset or not an existing file.")
        assert config.get("forrest_model") and os.path.exists(config["forrest_model"]), (
            "No 'combined_model' given, and 'forrest_model' is unset or not an existing file.")
        assert config.get("forrest_outline") and os.path.exists(config["forrest_outline"]), (
            "Two-model routing needs 'forrest_outline', which is unset or not an existing file.")

    config["continue"] = config.get(
        "continue_path", os.path.join(config.get("output_directory", "./output"), "continue.yml"))

    # the reference CRASHES when the NDVI gates are absent (SURVEY §5 config
    # gotcha); we default them instead, but that changes postprocess filters
    # for migrated reference configs — warn so the assumption is visible
    missing_ndvi = [k for k in ("ndvi_mean_threshold", "ndvi_var_threshold")
                    if k not in config]

    for key, default in _DEFAULTS:
        config[key] = config.get(key, default)

    os.makedirs(config["output_directory"], exist_ok=True)
    os.makedirs(config["tiles_path"], exist_ok=True)

    set_device_configuration(config, config.get("device"))
    _validate_model_input_size(config)

    config["logger"] = setup_logging(
        os.path.join(config["output_directory"], "logs"), config["debug"])
    if missing_ndvi:
        config["logger"].warning(
            f"Config keys {missing_ndvi} not set; defaulting to the "
            f"example-config values (0.1). The reference requires these "
            f"explicitly — review the NDVI gates for your imagery.")

    config_obj = Config()
    config_obj._load_into_config(config)
    return config, config_obj


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static Mask R-CNN inference spec — the TPU-native stand-in for the
    detectron2 cfg built at reference ``config.py:25-66``.

    All counts are static so the whole forward compiles to one XLA program.
    """

    depth: int = 101                  # ResNet depth (50 or 101); ref base model R101-FPN
    num_classes: int = 1              # reference config.py:35,59
    score_threshold: float = 0.3      # reference config.py:60
    nms_threshold: float = 0.5        # reference config.py:61
    input_size: int = 1024            # static square input (tiles padded/resized)
    # RPN static budgets (detectron2 test-time defaults)
    pre_nms_topk: int = 1000          # per FPN level
    post_nms_topk: int = 1000
    rpn_nms_threshold: float = 0.7
    max_detections: int = 100
    # approx_max_k for RPN levels above this anchor count (0 = exact; the
    # TPU-shaped top-k for P2's 196k anchors — recall 0.99, sub-NMS effect)
    rpn_approx_topk_from: int = 16384
    mask_resolution: int = 28
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # detectron2 caffe-style preprocessing: BGR order, per-channel mean subtract
    pixel_mean: Tuple[float, ...] = (103.53, 116.28, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    bf16: bool = True
    # Test-time resize semantics (reference ``prediction.py:169`` pushes tiles
    # through detectron2 ``ResizeShortestEdge(800, 1333)``):
    # * "fixed"        — scale the tile window to fill the full input canvas
    #                    (the native mode for checkpoints trained at
    #                    ``input_size``; validated TPU shape)
    # * "shortest_edge" — reproduce the reference scaling: content scaled by
    #                    min(shortest_edge/side, max_size/side), placed
    #                    top-left in the static canvas, rest zero-padded
    #                    (use for converted detectron2 checkpoints)
    test_resize: str = "fixed"
    resize_shortest_edge: int = 800
    resize_max_size: int = 1333
    # lax.scan over identical backbone blocks (resnet.ResNet.scan_blocks):
    # identical math, much smaller/faster-compiling executables.  Escape
    # hatch (`scan_blocks: false`) in case a backend mishandles the scanned
    # program — checkpoints load either way (convert.restack_backbone).
    scan_blocks: bool = True
    # W-folded res2 execution (resnet.fold_kernel_w): res2's 64-channel
    # convs fill only half the 128-lane MXU (~18% MFU measured); running the
    # stage on W-paired channels doubles the FLOPs but ~4x the MXU fill
    # (~38% effective).  Identical math + param tree (parity-tested);
    # serving default ON, applied only on accelerators with frozen norms.
    # Escape hatch: `fold_w: false` in the YAML.
    fold_w: bool = True


def model_spec(config: Dict[str, Any]) -> ModelSpec:
    """Build the static model spec from the user config."""
    overrides = {}
    if config.get("pixel_mean"):
        overrides["pixel_mean"] = tuple(float(v) for v in config["pixel_mean"])
    if config.get("pixel_std"):
        overrides["pixel_std"] = tuple(float(v) for v in config["pixel_std"])
    return ModelSpec(
        depth=int(config.get("model_depth", 101)),
        score_threshold=float(config.get("confidence_threshold_stitching", 0.3)),
        nms_threshold=0.5,
        input_size=int(config.get("model_input_size", 1024)),
        pre_nms_topk=int(config.get("rpn_pre_nms_topk", 1000)),
        post_nms_topk=int(config.get("rpn_post_nms_topk", 1000)),
        max_detections=int(config.get("max_detections", 100)),
        rpn_approx_topk_from=int(config.get("rpn_approx_topk_from", 16384)),
        bf16=bool(config.get("mixed_precision", True)),
        scan_blocks=bool(config.get("scan_blocks", True)),
        fold_w=bool(config.get("fold_w", True)),
        test_resize=str(config.get("test_resize", "fixed")),
        resize_shortest_edge=int(config.get("resize_shortest_edge", 800)),
        resize_max_size=int(config.get("resize_max_size", 1333)),
        **overrides,
    )
