"""One-process TPU perf validation + parameter sweep.

The axon relay degrades when hammered with many short-lived processes, so
every live-TPU experiment for a session is batched here: ONE process runs
(1) chip warmup + median-of-5 compute timing for the current program,
(2) the BENCH_DETAIL cumulative stage breakdown,
(3) a TD_ROI_CHUNK x TD_ROI_SLOTS sweep of the Pallas boxpool, and
(4) an executable-size / warm-compile-time probe for the scanned backbone.

Each phase prints its own stderr lines and appends a JSON record to
``tools/tpu_sweep_results.jsonl`` so a dropped tunnel mid-run loses nothing.

Usage:  timeout 3000 python tools/tpu_sweep.py [phase ...]
        phases: chip detail roi compile   (default: all)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_PATH = os.path.join(REPO, "tools", "tpu_sweep_results.jsonl")


def record(phase: str, payload: dict) -> None:
    payload = {"phase": phase, "t": time.strftime("%H:%M:%S"), **payload}
    with open(OUT_PATH, "a") as fh:
        fh.write(json.dumps(payload) + "\n")
    print(f"sweep[{phase}]: {json.dumps(payload)}", file=sys.stderr)


def median_ms(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3, [round(t * 1e3) for t in ts]


def main(phases) -> int:
    import jax
    import jax.numpy as jnp
    from treedetection_tpu.utils.xla_cache import setup_compilation_cache
    setup_compilation_cache()
    from treedetection_tpu.models.mask_rcnn import MaskRCNNConfig, create_model
    from treedetection_tpu.ops.image import normalize_bgr
    from treedetection_tpu.ops.pack import pack_model_output

    dev = jax.devices()[0]
    print(f"sweep: backend={dev.platform}", file=sys.stderr)
    if dev.platform == "cpu":
        print("sweep: no accelerator; aborting", file=sys.stderr)
        return 2

    size, batch = 1024, 8
    # PRODUCTION knob set (bench.py / example config): topk 512, fold_w on.
    # Earlier rounds ran the d2-default topk 1000 here, which overstated the
    # boxpool/proposal stage costs ~2x vs the shipped operating point.
    cfg = MaskRCNNConfig(depth=101, input_size=size, bf16=True,
                         rpn_post_nms_topk=512, fold_w=True,
                         rpn_approx_topk_from=16384)
    model, params = create_model(cfg)
    params = jax.device_put(params, dev)
    rng = np.random.default_rng(0)
    tiles_np = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    tiles = jax.device_put(tiles_np, dev)

    @jax.jit
    def _forward(p, t):
        return pack_model_output(model.apply(p, normalize_bgr(t)))

    forward = functools.partial(_forward, params)

    if "chip" in phases:
        t0 = time.time()
        jax.device_get(forward(tiles))
        compile_s = time.time() - t0
        med, runs = median_ms(lambda: jax.device_get(forward(tiles)))
        record("chip", {"first_compile_s": round(compile_s, 1),
                        "compute_ms_median5": round(med, 1), "runs_ms": runs,
                        "tiles_per_s_serial": round(batch / (med / 1e3), 1)})

    if "compile" in phases:
        # serialized-executable size = the warm-compile (cache load) floor
        try:
            lowered = _forward.lower(params, tiles)
            comp = lowered.compile()
            try:
                ser = comp.runtime_executable().serialize()
                sz = len(ser)
            except Exception:
                sz = -1
            record("compile", {"exec_bytes": sz,
                               "exec_mb": round(sz / 1e6, 1) if sz > 0 else None})
        except Exception as exc:
            record("compile", {"error": str(exc)[:200]})

    if "detail" in phases:
        from treedetection_tpu.models.mask_rcnn import FPN_STRIDES
        from treedetection_tpu.models.rpn import generate_proposals
        from treedetection_tpu.models.roi_heads import box_inference
        from treedetection_tpu.ops.roi_align import multilevel_roi_align_batched

        def _stage_fn(upto):
            def fn(self, images):
                c = self.cfg
                B = images.shape[0]
                feats = self.backbone(images.astype(c.dtype))
                logits, deltas = self.rpn_head(feats)
                if upto == "rpn":
                    return logits[0].astype(jnp.float32).sum()
                props = jax.vmap(lambda lg, dl: generate_proposals(
                    lg, dl, self._anchors, c.input_size,
                    c.rpn_pre_nms_topk, c.rpn_post_nms_topk,
                    c.rpn_nms_threshold,
                    approx_topk_from=c.rpn_approx_topk_from))(logits, deltas)
                if upto == "proposals":
                    return props.scores.astype(jnp.float32).sum()
                K = props.boxes.shape[1]
                feats4 = [f.astype(c.dtype) for f in feats[:4]]
                pooled = multilevel_roi_align_batched(
                    feats4, props.boxes, c.box_pool, FPN_STRIDES[:4])
                if upto == "boxpool":
                    return pooled.astype(jnp.float32).sum()
                cls_logits, box_deltas = self.box_head(
                    pooled.reshape((B * K,) + pooled.shape[2:]).astype(c.dtype))
                det = jax.vmap(lambda cl, bd, pb, ps: box_inference(
                    cl, bd, pb, ps, c.input_size, c.score_threshold,
                    c.nms_threshold, c.max_detections))(
                    cls_logits.reshape(B, K, -1), box_deltas.reshape(B, K, -1),
                    props.boxes, props.scores)
                if upto == "boxhead":
                    return det.scores.astype(jnp.float32).sum()
                D = det.boxes.shape[1]
                mask_pooled = multilevel_roi_align_batched(
                    feats4, det.boxes, c.mask_pool, FPN_STRIDES[:4])
                ml = self.mask_head(
                    mask_pooled.reshape((B * D,) + mask_pooled.shape[2:])
                    .astype(c.dtype))
                return ml.astype(jnp.float32).sum()
            return fn

        prev = 0.0
        out = {}
        for upto in ("rpn", "proposals", "boxpool", "boxhead", "maskhead"):
            method = _stage_fn(upto)

            @jax.jit
            def _staged(p, t, _m=method):
                return model.apply(p, normalize_bgr(t), method=_m)

            staged = functools.partial(_staged, params)
            float(staged(tiles))  # compile
            med, _ = median_ms(lambda: float(staged(tiles)), n=3)
            out[upto] = {"cum_ms": round(med, 1), "delta_ms": round(med - prev, 1)}
            prev = med
        record("detail", out)

    if "roi" in phases or "roimask" in phases:
        # standalone ROI-pool benchmark over (chunk, slots) grids, for both
        # pool geometries: box head (R=7, 8 x 1008 proposals) and mask head
        # (R=14, 8 x 100 detections).  Realistic level sizes for 1024^2.
        # ops/__init__ re-exports a FUNCTION named roi_align that shadows the
        # submodule attribute; importlib resolves the real module
        import importlib
        ra = importlib.import_module("treedetection_tpu.ops.roi_align")
        C = 256
        hs = [256, 128, 64, 32]
        strides = [4, 8, 16, 32]
        fmaps = [jnp.asarray(rng.normal(size=(batch, h, h, C)).astype(np.float32),
                             dtype=jnp.bfloat16) for h in hs]
        fmaps = jax.device_put(fmaps, dev)

        def mk_boxes(n_boxes):
            sizes_px = rng.uniform(16, 440, size=(batch, n_boxes))
            cx = rng.uniform(0, 1024, size=(batch, n_boxes))
            cy = rng.uniform(0, 1024, size=(batch, n_boxes))
            arr = np.stack([np.clip(cx - sizes_px / 2, 0, 1023),
                            np.clip(cy - sizes_px / 2, 0, 1023),
                            np.clip(cx + sizes_px / 2, 1, 1024),
                            np.clip(cy + sizes_px / 2, 1, 1024)], axis=-1)
            return jax.device_put(jnp.asarray(arr, dtype=jnp.float32), dev)

        jobs = []
        if "roi" in phases:
            jobs.append(("roi", 7, 1008))
        if "roimask" in phases:
            jobs.append(("roimask", 14, 104))
        for name, res, n_boxes in jobs:
            boxes = mk_boxes(n_boxes)
            results = {}
            for chunk in (16, 32, 64, 128):
                for slots in (2, 4, 6, 8):
                    os.environ["TD_ROI_CHUNK"] = str(chunk)
                    os.environ["TD_ROI_SLOTS"] = str(slots)

                    @jax.jit
                    def _pool(fm, bx, _r=res):
                        return ra.multilevel_roi_align_batched(
                            list(fm), bx, _r, strides).astype(jnp.float32).sum()

                    try:
                        float(_pool(fmaps, boxes))  # compile
                        med, _ = median_ms(lambda: float(_pool(fmaps, boxes)),
                                           n=3)
                        results[f"c{chunk}_s{slots}"] = round(med, 1)
                        print(f"sweep[{name}]: chunk={chunk} slots={slots} "
                              f"{med:.1f}ms", file=sys.stderr)
                    except Exception as exc:
                        results[f"c{chunk}_s{slots}"] = f"err:{str(exc)[:80]}"
            os.environ.pop("TD_ROI_CHUNK", None)
            os.environ.pop("TD_ROI_SLOTS", None)
            record(name, results)

    if "roi2" in phases:
        # two-class overlay pooler vs single-class 48-patch, both geometries
        import importlib
        ra = importlib.import_module("treedetection_tpu.ops.roi_align")
        C = 256
        hs = [256, 128, 64, 32]
        strides = [4, 8, 16, 32]
        fmaps = [jnp.asarray(
            rng.normal(size=(batch, h, h, C)).astype(np.float32),
            dtype=jnp.bfloat16) for h in hs]
        fmaps = jax.device_put(fmaps, dev)

        def mk_boxes(n_boxes, frac_large=0.15):
            n_l = int(n_boxes * frac_large)
            sizes_px = np.concatenate([
                rng.uniform(16, 90, size=(batch, n_boxes - n_l)),
                rng.uniform(100, 440, size=(batch, n_l))], axis=1)
            cx = rng.uniform(0, 1024, size=(batch, n_boxes))
            cy = rng.uniform(0, 1024, size=(batch, n_boxes))
            arr = np.stack([np.clip(cx - sizes_px / 2, 0, 1023),
                            np.clip(cy - sizes_px / 2, 0, 1023),
                            np.clip(cx + sizes_px / 2, 1, 1024),
                            np.clip(cy + sizes_px / 2, 1, 1024)], axis=-1)
            return jax.device_put(jnp.asarray(arr, dtype=jnp.float32), dev)

        results = {}
        for name, res, n_boxes in (("box", 7, 1008), ("mask", 14, 104)):
            boxes = mk_boxes(n_boxes)
            for small in ("0", "16", "24", "32"):
                os.environ["TD_ROI_SMALL"] = small

                @jax.jit
                def _pool(fm, bx, _r=res):
                    return ra.multilevel_roi_align_batched(
                        list(fm), bx, _r, strides).astype(jnp.float32).sum()

                try:
                    float(_pool(fmaps, boxes))  # compile
                    med, _ = median_ms(lambda: float(_pool(fmaps, boxes)), n=3)
                    results[f"{name}_s{small}"] = round(med, 1)
                    print(f"sweep[roi2]: {name} small={small} {med:.1f}ms",
                          file=sys.stderr)
                except Exception as exc:
                    results[f"{name}_s{small}"] = f"err:{str(exc)[:80]}"
            os.environ.pop("TD_ROI_SMALL", None)
        record("roi2", results)

    if "span" in phases:
        # REAL-data span distribution: the example checkpoint on sample tiles
        # -> what fraction of box-pool proposals / mask-pool detections fit
        # the SMALL_PATCH window (validates TD_ROI_LARGE_FRAC's default)
        sys.path.insert(0, os.path.join(REPO, "example"))
        from example import ensure_sample_data
        ensure_sample_data()
        from treedetection_tpu.geo import GeoTiff
        from treedetection_tpu.models.convert import load_checkpoint
        from treedetection_tpu.models.mask_rcnn import FPN_STRIDES
        from treedetection_tpu.models.rpn import generate_proposals
        from treedetection_tpu.models.roi_heads import box_inference
        import importlib
        ra = importlib.import_module("treedetection_tpu.ops.roi_align")
        from treedetection_tpu.ops.image import resize_bilinear

        scfg = MaskRCNNConfig(depth=50, input_size=size, bf16=True,
                              rpn_approx_topk_from=16384)
        from treedetection_tpu.models.mask_rcnn import MaskRCNN
        smodel = MaskRCNN(scfg)
        sparams = load_checkpoint(
            os.path.join(REPO, "example", "data", "model_full.npz"),
            depth=50, param_dtype=None)
        sparams = jax.device_put(sparams, dev)
        g = GeoTiff(os.path.join(REPO, "example", "data", "rgb",
                                 "324125317.tif"))
        full = g.read()[:, :, :3]
        tiles_l = []
        rng2 = np.random.default_rng(1)
        for _ in range(batch):
            y0, x0 = rng2.integers(0, full.shape[0] - 90, 2)
            tiles_l.append(full[y0:y0 + 90, x0:x0 + 90, :3])
        tiles_r = np.stack(tiles_l).astype(np.uint8)
        tiles_d = jax.device_put(tiles_r, dev)

        hs4 = np.asarray([size // s for s in FPN_STRIDES[:4]])

        def spans_of(flat_boxes, resolution):
            _, _, ox, sy, sx, _, _ = ra._patch_pool_prep(
                flat_boxes, hs4, hs4, FPN_STRIDES[:4], resolution, 2, 4)
            ox_al = (ox // 8) * 8
            sx_al = sx + (ox - ox_al).astype(flat_boxes.dtype)[:, None]
            return jnp.max(sy, axis=1), jnp.max(sx_al, axis=1)

        @jax.jit
        def _span_stats(p, t):
            c = scfg
            x = jax.vmap(lambda im: resize_bilinear(
                im.astype(jnp.float32), size, size))(t)
            # the example checkpoint is trained on std-normalized inputs
            # (train.data); serving passes pixel_std via config.yml — the
            # raw-normalize variant produces ZERO detections here
            x = normalize_bgr(x, pixel_std=(57.375, 57.12, 58.395))
            feats = smodel.apply(p, x, method=lambda self, im: self.backbone(
                im.astype(c.dtype)))
            logits, deltas = smodel.apply(
                p, feats, method=lambda self, f: self.rpn_head(f))
            from treedetection_tpu.models.anchors import pyramid_anchors_jnp
            anchors = pyramid_anchors_jnp(
                c.input_size, FPN_STRIDES,
                sizes=c.anchor_sizes, ratios=c.anchor_ratios)
            props = jax.vmap(lambda lg, dl: generate_proposals(
                lg, dl, anchors, c.input_size, c.rpn_pre_nms_topk,
                c.rpn_post_nms_topk, c.rpn_nms_threshold,
                approx_topk_from=c.rpn_approx_topk_from))(logits, deltas)
            pb = props.boxes.reshape(-1, 4)
            sy_p, sx_p = spans_of(pb, 7)
            # detections via the real box head
            feats4 = [f.astype(c.dtype) for f in feats[:4]]
            pooled = ra.multilevel_roi_align_batched(
                feats4, props.boxes, c.box_pool, FPN_STRIDES[:4])
            B, K = props.boxes.shape[:2]
            cl, bd = smodel.apply(
                p, pooled.reshape((B * K,) + pooled.shape[2:]).astype(c.dtype),
                method=lambda self, x_: self.box_head(x_))
            det = jax.vmap(lambda cl_, bd_, pb_, ps_: box_inference(
                cl_, bd_, pb_, ps_, c.input_size, c.score_threshold,
                c.nms_threshold, c.max_detections))(
                cl.reshape(B, K, -1), bd.reshape(B, K, -1),
                props.boxes, props.scores)
            db = det.boxes.reshape(-1, 4)
            sy_d, sx_d = spans_of(db, 14)
            return (sy_p, sx_p, props.scores.reshape(-1),
                    sy_d, sx_d, det.valid.reshape(-1))

        sy_p, sx_p, psc, sy_d, sx_d, dval = [
            np.asarray(a) for a in jax.device_get(
                _span_stats(sparams, tiles_d))]
        pvalid = np.isfinite(psc)
        out = {}
        for small in (16, 24, 32):
            nl_p = ((sy_p > small - 1) | (sx_p > small + 7)) & pvalid
            nl_d = ((sy_d > small - 1) | (sx_d > small + 7)) & dval
            out[f"prop_needlarge_s{small}"] = round(
                float(nl_p.sum() / max(pvalid.sum(), 1)), 4)
            out[f"det_needlarge_s{small}"] = round(
                float(nl_d.sum() / max(dval.sum(), 1)), 4)
        out["n_props"] = int(pvalid.sum())
        out["n_dets"] = int(dval.sum())
        out["prop_span_p50_p90_max"] = [
            round(float(np.percentile(np.maximum(sy_p, sx_p)[pvalid], q)), 1)
            for q in (50, 90, 100)]
        record("span", out)

    if "roi3" in phases:
        # round-4 three-class pooler variants at production geometry with a
        # REALISTIC span mix (45% fit s16, ~45% need the 48-patch, ~10%
        # whole-image strips that outspan any patch — the measured 'span'
        # distribution): which (small, large_frac, exact_frac) is fastest,
        # and how fast is the pure-gather path (exact for everything)?
        import importlib
        ra = importlib.import_module("treedetection_tpu.ops.roi_align")
        C = 256
        hs = [256, 128, 64, 32]
        strides = [4, 8, 16, 32]
        fmaps = [jnp.asarray(
            rng.normal(size=(batch, h, h, C)).astype(np.float32),
            dtype=jnp.bfloat16) for h in hs]
        fmaps = jax.device_put(fmaps, dev)

        def mk_boxes_spanmix(n_boxes):
            n_strip = int(n_boxes * 0.10)
            n_large = int(n_boxes * 0.45)
            n_small = n_boxes - n_strip - n_large
            sizes_px = np.concatenate([
                rng.uniform(16, 60, size=(batch, n_small)),
                rng.uniform(100, 440, size=(batch, n_large))], axis=1)
            cx = rng.uniform(0, 1024, size=(batch, n_small + n_large))
            cy = rng.uniform(0, 1024, size=(batch, n_small + n_large))
            arr = np.stack([np.clip(cx - sizes_px / 2, 0, 1023),
                            np.clip(cy - sizes_px / 2, 0, 1023),
                            np.clip(cx + sizes_px / 2, 1, 1024),
                            np.clip(cy + sizes_px / 2, 1, 1024)], axis=-1)
            y = rng.uniform(0, 1000, size=(batch, n_strip))
            strips = np.stack([np.zeros((batch, n_strip)), y,
                               np.full((batch, n_strip), 1024.0), y + 20],
                              axis=-1)
            return jax.device_put(jnp.asarray(
                np.concatenate([arr, strips], axis=1), dtype=jnp.float32),
                dev)

        variants = [
            ("default_s16_L50_E15", {"TD_ROI_SMALL": "16",
                                     "TD_ROI_LARGE_FRAC": "0.5",
                                     "TD_ROI_EXACT_FRAC": "0.15"}),
            ("r3_s16_L25_E0", {"TD_ROI_SMALL": "16",
                               "TD_ROI_LARGE_FRAC": "0.25",
                               "TD_ROI_EXACT_FRAC": "0"}),
            ("tail_s16_L0_E625", {"TD_ROI_SMALL": "16",
                                  "TD_ROI_LARGE_FRAC": "0",
                                  "TD_ROI_EXACT_FRAC": "0.625"}),
            ("all48_E15", {"TD_ROI_SMALL": "0",
                           "TD_ROI_EXACT_FRAC": "0.15"}),
            ("all48_E15_patchdma", {"TD_ROI_SMALL": "0",
                                    "TD_ROI_EXACT_FRAC": "0.15",
                                    "TD_ROI_RESIDENT": "0"}),
            ("puregather", {"TD_PALLAS_ROIALIGN": "0"}),
        ]
        results = {}
        for geom, res, n_boxes in (("box", 7, 1008), ("mask", 14, 104)):
            boxes = mk_boxes_spanmix(n_boxes)
            for name, env in variants:
                for k, v in env.items():
                    os.environ[k] = v

                @jax.jit
                def _pool(fm, bx, _r=res):
                    out, trunc = ra.multilevel_roi_align_batched(
                        list(fm), bx, _r, strides, return_overflow=True)
                    return out.astype(jnp.float32).sum(), trunc.sum()

                try:
                    _, tr = _pool(fmaps, boxes)  # compile
                    float(tr)
                    med, _ = median_ms(
                        lambda: float(_pool(fmaps, boxes)[0]), n=3)
                    results[f"{geom}_{name}"] = round(med, 1)
                    results[f"{geom}_{name}_trunc"] = int(tr)
                    print(f"sweep[roi3]: {geom} {name} {med:.1f}ms "
                          f"trunc={int(tr)}", file=sys.stderr)
                except Exception as exc:
                    results[f"{geom}_{name}"] = f"err:{str(exc)[:80]}"
                for k in env:
                    os.environ.pop(k, None)
        record("roi3", results)

    if "truncerr" in phases:
        # ROI-truncation error quantification (VERDICT r3 task 3): run the
        # real checkpoint on real sample tiles under (a) the round-3 pooling
        # defaults (s16, large 25%, no exact tail), (b) the round-4 defaults,
        # and (c) fully-exact gather pooling; match detections (a)/(b) to (c)
        # by best box IoU and report score/IoU deltas + truncation counts.
        sys.path.insert(0, os.path.join(REPO, "example"))
        from example import ensure_sample_data
        ensure_sample_data()
        from treedetection_tpu.geo import GeoTiff
        from treedetection_tpu.models.convert import load_checkpoint
        from treedetection_tpu.models.mask_rcnn import MaskRCNN
        from treedetection_tpu.ops.image import resize_bilinear

        scfg = MaskRCNNConfig(depth=50, input_size=size, bf16=True,
                              rpn_approx_topk_from=16384)
        smodel = MaskRCNN(scfg)
        sparams = load_checkpoint(
            os.path.join(REPO, "example", "data", "model_full.npz"),
            depth=50, param_dtype=None)
        sparams = jax.device_put(sparams, dev)
        g = GeoTiff(os.path.join(REPO, "example", "data", "rgb",
                                 "324125317.tif"))
        full = g.read()[:, :, :3]
        rng2 = np.random.default_rng(1)
        tiles_l = []
        for _ in range(batch):
            y0, x0 = rng2.integers(0, full.shape[0] - 90, 2)
            tiles_l.append(full[y0:y0 + 90, x0:x0 + 90, :3])
        tiles_r = jax.device_put(np.stack(tiles_l).astype(np.uint8), dev)

        def run_variant(env):
            for k, v in env.items():
                os.environ[k] = v

            @jax.jit
            def _f(p, t):
                x = jax.vmap(lambda im: resize_bilinear(
                    im.astype(jnp.float32), size, size))(t)
                out = smodel.apply(p, normalize_bgr(
                    x, pixel_std=(57.375, 57.12, 58.395)))
                return out.boxes, out.scores, out.valid, out.roi_overflow

            r = jax.device_get(_f(sparams, tiles_r))
            for k in env:
                os.environ.pop(k, None)
            return [np.asarray(a) for a in r]

        def iou_match(bx_a, va, bx_c, vc):
            """For each valid det in c, best-IoU det in a -> (iou, pair idx)."""
            ious, pairs = [], []
            for b in range(bx_c.shape[0]):
                ca = bx_a[b][va[b]]
                for box in bx_c[b][vc[b]]:
                    if not len(ca):
                        ious.append(0.0)
                        pairs.append(None)
                        continue
                    x0 = np.maximum(ca[:, 0], box[0])
                    y0 = np.maximum(ca[:, 1], box[1])
                    x1 = np.minimum(ca[:, 2], box[2])
                    y1 = np.minimum(ca[:, 3], box[3])
                    inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
                    area_c = (box[2] - box[0]) * (box[3] - box[1])
                    area_a = (ca[:, 2] - ca[:, 0]) * (ca[:, 3] - ca[:, 1])
                    iou = inter / np.maximum(area_c + area_a - inter, 1e-9)
                    ious.append(float(iou.max()))
            return np.asarray(ious)

        exact = run_variant({"TD_PALLAS_ROIALIGN": "0"})
        r3 = run_variant({"TD_ROI_SMALL": "16", "TD_ROI_LARGE_FRAC": "0.25",
                          "TD_ROI_EXACT_FRAC": "0"})
        r4 = run_variant({})
        out = {"n_dets_exact": int(exact[2].sum()),
               "n_dets_r3": int(r3[2].sum()),
               "n_dets_r4": int(r4[2].sum()),
               "trunc_r3": int(r3[3].sum()),
               "trunc_r4": int(r4[3].sum())}
        for name, var in (("r3", r3), ("r4", r4)):
            m = iou_match(var[0], var[2], exact[0], exact[2])
            out[f"{name}_match_iou_mean"] = round(float(m.mean()), 4) \
                if len(m) else None
            out[f"{name}_missed_at_iou50"] = int((m < 0.5).sum())
        record("truncerr", out)

    if "stats" in phases:
        # postprocess raster-stats cost at the sample's real shapes: single
        # calls vs the fused two-raster program, first call vs warm call
        from treedetection_tpu.ops.stats import (
            polygon_raster_stats_batch, polygon_raster_stats_two)
        N, P = 2560, 128
        polys = np.full((N, P, 2), np.nan, dtype=np.float32)
        rng3 = np.random.default_rng(3)
        for i in range(N):
            n = rng3.integers(4, 24)
            ang = np.sort(rng3.uniform(0, 2 * np.pi, n))
            r = rng3.uniform(2, 10)
            cx, cy = rng3.uniform(20, 980, 2)
            polys[i, :n, 0] = cx + r * np.cos(ang)
            polys[i, :n, 1] = cy + r * np.sin(ang)
        hr = rng3.standard_normal((1000, 1000)).astype(np.float32)
        nr = rng3.standard_normal((200, 200)).astype(np.float32)
        aff_h = jnp.asarray([1.0, 0, 0, 0, -1.0, 1000.0], dtype=jnp.float32)
        aff_n = jnp.asarray([5.0, 0, 0, 0, -5.0, 1000.0], dtype=jnp.float32)
        pj = jax.device_put(jnp.asarray(polys), dev)
        hj = jax.device_put(jnp.asarray(hr), dev)
        nj = jax.device_put(jnp.asarray(nr), dev)
        out = {}
        t0 = time.time()
        st = polygon_raster_stats_batch(pj, hj, aff_h)
        float(st.max[0])
        out["single_h_first_s"] = round(time.time() - t0, 2)
        med, _ = median_ms(lambda: float(
            polygon_raster_stats_batch(pj, hj, aff_h).max[0]), n=3)
        out["single_h_warm_ms"] = round(med, 1)
        t0 = time.time()
        st = polygon_raster_stats_batch(pj, nj, aff_n)
        float(st.max[0])
        out["single_n_first_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        a, b = polygon_raster_stats_two(pj, hj, aff_h, nj, aff_n)
        float(a.max[0])
        out["fused_first_s"] = round(time.time() - t0, 2)
        med, _ = median_ms(lambda: float(
            polygon_raster_stats_two(pj, hj, aff_h, nj, aff_n)[0].max[0]), n=3)
        out["fused_warm_ms"] = round(med, 1)
        record("stats", out)

    if "backbone" in phases:
        # cumulative sub-stage timing inside the backbone: where do the
        # ~31 ms (relay-corrected) of backbone+rpn actually go?
        from treedetection_tpu.models import resnet as rn

        # Standalone partial-backbone modules (child names identical to
        # ResNet's, so the real param tree applies; extra params are ignored).
        bparams = jax.device_get(params)["params"]["backbone"]
        bparams = jax.device_put(bparams, dev)
        cdt = cfg.dtype

        class _PartialResNet(rn.nn.Module):
            depth: int
            upto: str
            dtype: object = jnp.float32

            @rn.nn.compact
            def __call__(self, x):
                blocks = rn.STAGE_BLOCKS[self.depth]
                x = rn.ConvBN(64, kernel=7, stride=2, dtype=self.dtype,
                              name="stem")(x)
                x = rn.nn.max_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))
                if self.upto == "stem":
                    return [x]
                outs = []
                width, features = 64, 256
                for stage, n_blocks in enumerate(blocks):
                    stride = 1 if stage == 0 else 2
                    x = rn.Bottleneck(width, features, stride=stride,
                                      dtype=self.dtype,
                                      name=f"res{stage + 2}_0")(x)
                    scan = rn.nn.scan(rn._ScanBody,
                                      variable_axes={"params": 0},
                                      split_rngs={"params": True},
                                      length=n_blocks - 1)
                    x, _ = scan(width, features, dtype=self.dtype,
                                name=f"res{stage + 2}_rest")(x, None)
                    outs.append(x)
                    width *= 2
                    features *= 2
                    if self.upto == f"res{stage + 2}":
                        return outs
                return outs

        def run_backbone(bp, x, upto):
            bu = _PartialResNet(cfg.depth, upto, dtype=cdt)
            outs = bu.apply({"params": bp["bottom_up"]}, x)
            if upto != "fpn":
                return outs
            fpn = rn.FPN(256, dtype=cdt)
            return fpn.apply({"params": bp["fpn"]}, outs)

        prev = 0.0
        out = {}
        norm = jax.jit(lambda t: normalize_bgr(t).astype(cdt))
        xin = jax.device_put(jax.device_get(norm(tiles)), dev)
        for upto in ("stem", "res2", "res3", "res4", "res5", "fpn"):
            try:
                def scalar(bp, x, _u=upto):
                    o = run_backbone(bp, x, _u)
                    leaf = o[-1] if isinstance(o, (list, tuple)) else o
                    return leaf.astype(jnp.float32).sum()
                f = jax.jit(scalar)

                def go():
                    float(f(bparams, xin))
                go()  # compile
                med, _ = median_ms(go, n=3)
                out[upto] = {"cum_ms": round(med, 1),
                             "delta_ms": round(med - prev, 1)}
                prev = med
                print(f"sweep[backbone]: {upto} {med:.1f}ms", file=sys.stderr)
            except Exception as exc:
                out[upto] = f"err:{str(exc)[:120]}"
        record("backbone", out)

    if "convmicro" in phases:
        # Per-conv MFU microbench: each op is looped IN-PROGRAM via
        # lax.fori_loop over a shape-preserving carry so the ~31 ms relay
        # RTT amortizes across LOOPS iterations; per-op ms =
        # (measured - rtt_floor) / loops.  Identifies which convs of the
        # production forward underuse the MXU (VERDICT r3 task 4).
        from jax import lax
        PEAK = 197e12  # v5e bf16 peak FLOP/s
        dn = ("NHWC", "HWIO", "NHWC")
        out = {}

        tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
        rtt_fn = jax.jit(lambda v: (v + 1.0).sum())
        float(rtt_fn(tiny))
        rtt_ms, _ = median_ms(lambda: float(rtt_fn(tiny)), n=5)
        out["rtt_ms"] = round(rtt_ms, 1)
        print(f"sweep[convmicro]: rtt floor {rtt_ms:.1f}ms", file=sys.stderr)

        def convw(k, cin, cout):
            return jnp.asarray(
                0.05 * rng.normal(size=(k, k, cin, cout)), jnp.bfloat16)

        def time_loop(name, x_np, step, flops_per_iter, loops):
            x0 = jax.device_put(jnp.asarray(x_np, jnp.bfloat16), dev)

            @jax.jit
            def run(x):
                return lax.fori_loop(
                    0, loops, lambda i, v: step(v), x
                ).astype(jnp.float32).sum()

            try:
                float(run(x0))  # compile
                med, _ = median_ms(lambda: float(run(x0)), n=5)
                per = max((med - rtt_ms) / loops, 1e-3)
                mfu = flops_per_iter / (per / 1e3) / PEAK
                out[name] = {"per_iter_ms": round(per, 3),
                             "mfu_pct": round(100 * mfu, 1), "loops": loops}
                print(f"sweep[convmicro]: {name:<12} {per:6.3f}ms/op "
                      f"MFU {100 * mfu:5.1f}%", file=sys.stderr)
            except Exception as exc:
                out[name] = f"err:{str(exc)[:120]}"

        def conv_flops(b, hw, cout, k, cin):
            return 2.0 * b * hw * hw * cout * k * k * cin

        # res2 conv2: 3x3 64->64 @ 256^2 (measured stage ~20% MFU)
        w = convw(3, 64, 64)
        time_loop("res2_c2", np.zeros((8, 256, 256, 64), np.float32),
                  lambda x, _w=w: lax.conv_general_dilated(
                      x, _w, (1, 1), "SAME", dimension_numbers=dn),
                  conv_flops(8, 256, 64, 3, 64), 48)
        # res2 1x1 pair: 64->256 then 256->64 @ 256^2
        wa, wb = convw(1, 64, 256), convw(1, 256, 64)
        time_loop("res2_11pair", np.zeros((8, 256, 256, 64), np.float32),
                  lambda x, _a=wa, _b=wb: lax.conv_general_dilated(
                      lax.conv_general_dilated(x, _a, (1, 1), "SAME",
                                               dimension_numbers=dn),
                      _b, (1, 1), "SAME", dimension_numbers=dn),
                  conv_flops(8, 256, 256, 1, 64) * 2, 32)
        # res3 conv2: 3x3 128->128 @ 128^2
        w = convw(3, 128, 128)
        time_loop("res3_c2", np.zeros((8, 128, 128, 128), np.float32),
                  lambda x, _w=w: lax.conv_general_dilated(
                      x, _w, (1, 1), "SAME", dimension_numbers=dn),
                  conv_flops(8, 128, 128, 3, 128), 48)
        # res4 conv2: 3x3 256->256 @ 64^2 (the ~80% MFU reference point)
        w = convw(3, 256, 256)
        time_loop("res4_c2", np.zeros((8, 64, 64, 256), np.float32),
                  lambda x, _w=w: lax.conv_general_dilated(
                      x, _w, (1, 1), "SAME", dimension_numbers=dn),
                  conv_flops(8, 64, 256, 3, 256), 48)
        # FPN output2 / RPN shared conv: 3x3 256->256 @ 256^2 (the single
        # biggest conv in the model)
        w = convw(3, 256, 256)
        time_loop("fpn_out2", np.zeros((8, 256, 256, 256), np.float32),
                  lambda x, _w=w: lax.conv_general_dilated(
                      x, _w, (1, 1), "SAME", dimension_numbers=dn),
                  conv_flops(8, 256, 256, 3, 256), 16)
        # mask-head conv: 3x3 256->256 on (800, 14, 14, 256) box tiles
        w = convw(3, 256, 256)
        time_loop("mask_conv", np.zeros((800, 14, 14, 256), np.float32),
                  lambda x, _w=w: lax.conv_general_dilated(
                      x, _w, (1, 1), "SAME", dimension_numbers=dn),
                  2.0 * 800 * 14 * 14 * 256 * 9 * 256, 32)
        # same FLOPs, grid layout: 800 tiles as a 25x32 grid of 16-px-pitch
        # cells (14^2 interior + 1-px zero gap); the gap re-zero multiply is
        # part of the cost.  Border cells read zeros exactly like SAME
        # padding does per-box, so outputs match the per-box conv.
        gap = np.zeros((1, 400, 512, 1), np.float32)
        for r in range(25):
            for c in range(32):
                gap[0, r * 16 + 1:r * 16 + 15, c * 16 + 1:c * 16 + 15, 0] = 1
        gapm = jax.device_put(jnp.asarray(gap, jnp.bfloat16), dev)
        w = convw(3, 256, 256)
        time_loop("mask_grid", np.zeros((1, 400, 512, 256), np.float32),
                  lambda x, _w=w, _g=gapm: lax.conv_general_dilated(
                      x, _w, (1, 1), "SAME", dimension_numbers=dn) * _g,
                  2.0 * 800 * 14 * 14 * 256 * 9 * 256, 32)
        record("convmicro", out)

    if "fold" in phases:
        # W-fold A/B for res2's 18%-MFU convs: adjacent W-pixel pairs fold
        # into channels (a FREE reshape in NHWC), turning 64-channel convs
        # into 128-channel ones.  The 3x3 becomes a 3x3x128 kernel with a
        # zero-padded support (2x the FLOPs) and the 1x1s become 128->512
        # block-diagonals (2x FLOPs) — net win iff the MXU fill more than
        # doubles throughput (18% -> ~73% expected from res3's shape).
        from jax import lax
        PEAK = 197e12
        dn = ("NHWC", "HWIO", "NHWC")
        out = {}
        tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
        rtt_fn = jax.jit(lambda v: (v + 1.0).sum())
        float(rtt_fn(tiny))
        rtt_ms, _ = median_ms(lambda: float(rtt_fn(tiny)), n=5)
        out["rtt_ms"] = round(rtt_ms, 1)

        def time_loop(name, x_np, step, useful_flops, loops):
            x0 = jax.device_put(jnp.asarray(x_np, jnp.bfloat16), dev)

            @jax.jit
            def run(x):
                return lax.fori_loop(0, loops, lambda i, v: step(v),
                                     x).astype(jnp.float32).sum()
            try:
                float(run(x0))
                med, _ = median_ms(lambda: float(run(x0)), n=5)
                per = max((med - rtt_ms) / loops, 1e-3)
                eff = useful_flops / (per / 1e3) / PEAK
                out[name] = {"per_iter_ms": round(per, 3),
                             "eff_mfu_pct": round(100 * eff, 1)}
                print(f"sweep[fold]: {name:<16} {per:6.3f}ms/op eff-MFU "
                      f"{100 * eff:5.1f}%", file=sys.stderr)
            except Exception as exc:
                out[name] = f"err:{str(exc)[:120]}"

        useful_33 = 2.0 * 8 * 256 * 256 * 64 * 9 * 64
        w = jnp.asarray(0.05 * rng.normal(size=(3, 3, 64, 64)), jnp.bfloat16)
        time_loop("res2_c2_base", np.zeros((8, 256, 256, 64), np.float32),
                  lambda x, _w=w: lax.conv_general_dilated(
                      x, _w, (1, 1), "SAME", dimension_numbers=dn),
                  useful_33, 48)
        # folded 3x3: kernel (3, 3, 128, 128); ~1/3 of taps are zero pads
        wf = jnp.asarray(0.05 * rng.normal(size=(3, 3, 128, 128)),
                         jnp.bfloat16)
        time_loop("res2_c2_wfold", np.zeros((8, 256, 128, 128), np.float32),
                  lambda x, _w=wf: lax.conv_general_dilated(
                      x, _w, (1, 1), "SAME", dimension_numbers=dn),
                  useful_33, 48)
        useful_11 = 2.0 * 8 * 256 * 256 * (64 * 256) * 2
        wa = jnp.asarray(0.05 * rng.normal(size=(1, 1, 64, 256)),
                         jnp.bfloat16)
        wb = jnp.asarray(0.05 * rng.normal(size=(1, 1, 256, 64)),
                         jnp.bfloat16)
        time_loop("res2_11_base", np.zeros((8, 256, 256, 64), np.float32),
                  lambda x, _a=wa, _b=wb: lax.conv_general_dilated(
                      lax.conv_general_dilated(x, _a, (1, 1), "SAME",
                                               dimension_numbers=dn),
                      _b, (1, 1), "SAME", dimension_numbers=dn),
                  useful_11, 32)
        waf = jnp.asarray(0.05 * rng.normal(size=(1, 1, 128, 512)),
                          jnp.bfloat16)
        wbf = jnp.asarray(0.05 * rng.normal(size=(1, 1, 512, 128)),
                          jnp.bfloat16)
        time_loop("res2_11_wfold", np.zeros((8, 256, 128, 128), np.float32),
                  lambda x, _a=waf, _b=wbf: lax.conv_general_dilated(
                      lax.conv_general_dilated(x, _a, (1, 1), "SAME",
                                               dimension_numbers=dn),
                      _b, (1, 1), "SAME", dimension_numbers=dn),
                  useful_11, 32)
        # whole folded bottleneck chain: 1x1 128->128 (folded 256->64 is
        # K=512,N=128 — use the actual folded widths of res2: conv1 sees
        # folded 512-channel input) — approximate with the production
        # folded widths: c1 512->128, c2 3x3 128->128, c3 128->512
        wc1 = jnp.asarray(0.05 * rng.normal(size=(1, 1, 512, 128)),
                          jnp.bfloat16)
        wc2 = jnp.asarray(0.05 * rng.normal(size=(3, 3, 128, 128)),
                          jnp.bfloat16)
        wc3 = jnp.asarray(0.05 * rng.normal(size=(1, 1, 128, 512)),
                          jnp.bfloat16)
        useful_block = (2.0 * 8 * 256 * 256 * (256 * 64 + 9 * 64 * 64 +
                                               64 * 256))
        time_loop("res2_blk_wfold", np.zeros((8, 256, 128, 512), np.float32),
                  lambda x, _1=wc1, _2=wc2, _3=wc3: lax.conv_general_dilated(
                      lax.conv_general_dilated(
                          lax.conv_general_dilated(x, _1, (1, 1), "SAME",
                                                   dimension_numbers=dn),
                          _2, (1, 1), "SAME", dimension_numbers=dn),
                      _3, (1, 1), "SAME", dimension_numbers=dn) + x,
                  useful_block, 24)
        record("fold", out)

    if "foldab" in phases:
        # Production-config A/B of the serving fold_w default (VERDICT r5
        # task 1): full R101 @ 1024^2, bf16, topk 512 (the bench knob set),
        # fold_w off vs on.  Records serial throughput, the backbone+rpn
        # stage time per variant, and an on-chip smoke parity (the exact
        # numerical parity is pinned by tests/test_oracle.py::
        # test_full_model_parity_fold_w and tests/test_model.py::TestFoldW).
        import dataclasses
        cfg_ab = MaskRCNNConfig(depth=101, input_size=size, bf16=True,
                                rpn_post_nms_topk=512,
                                rpn_approx_topk_from=16384)
        model_off, params_ab = create_model(cfg_ab)
        model_on = type(model_off)(cfg=dataclasses.replace(cfg_ab,
                                                           fold_w=True))
        params_ab = jax.device_put(params_ab, dev)
        out = {}

        def bb_fn(self, images):
            c = self.cfg
            feats = self.backbone(images.astype(c.dtype))
            logits, deltas = self.rpn_head(feats)
            return logits[0].astype(jnp.float32).sum()

        bb_sums = {}
        fwds, sts = {}, {}
        for name, m in (("off", model_off), ("on", model_on)):
            @jax.jit
            def fwd(p, t, _m=m):
                return pack_model_output(_m.apply(p, normalize_bgr(t)))

            @jax.jit
            def st(p, t, _m=m):
                return _m.apply(p, normalize_bgr(t), method=bb_fn)

            t0 = time.time()
            jax.device_get(fwd(params_ab, tiles))
            out[name] = {"compile_s": round(time.time() - t0, 1)}
            bb_sums[name] = float(st(params_ab, tiles))  # compile staged
            fwds[name], sts[name] = fwd, st
        # INTERLEAVED timing: the tunnel drifts on minute scales, so
        # alternate the two variants within each round instead of timing
        # them in separate blocks
        runs = {"off": [], "on": []}
        runs_bb = {"off": [], "on": []}
        for _ in range(7):
            for name in ("off", "on"):
                t0 = time.time()
                jax.device_get(fwds[name](params_ab, tiles))
                runs[name].append((time.time() - t0) * 1e3)
                t0 = time.time()
                float(sts[name](params_ab, tiles))
                runs_bb[name].append((time.time() - t0) * 1e3)
        for name in ("off", "on"):
            med = float(np.median(runs[name]))
            out[name].update({
                "compute_ms_median7": round(med, 1),
                "tiles_per_s_serial": round(batch / (med / 1e3), 1),
                "runs_ms": [round(r) for r in runs[name]],
                "backbone_rpn_cum_ms": round(
                    float(np.median(runs_bb[name])), 1)})
            print(f"sweep[foldab]: fold_w={name} {med:.1f}ms "
                  f"({batch / (med / 1e3):.1f} tiles/s serial), "
                  f"backbone+rpn {out[name]['backbone_rpn_cum_ms']}ms",
                  file=sys.stderr)
        denom = max(abs(bb_sums["off"]), 1e-6)
        out["bb_logit_sum_rel_diff"] = abs(
            bb_sums["on"] - bb_sums["off"]) / denom
        record("foldab", out)

    if "foldstage" in phases:
        # Localize the foldab full-model regression: cumulative stage cums
        # for fold_w off vs on (the truncated backbone+rpn program got
        # FASTER under fold while the full program got slower — find which
        # downstream stage pays).
        import dataclasses
        from treedetection_tpu.models.mask_rcnn import FPN_STRIDES
        from treedetection_tpu.models.rpn import generate_proposals
        from treedetection_tpu.models.roi_heads import box_inference
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align_batched)

        cfg_ab = MaskRCNNConfig(depth=101, input_size=size, bf16=True,
                                rpn_post_nms_topk=512,
                                rpn_approx_topk_from=16384)
        model_off, params_ab = create_model(cfg_ab)
        model_on = type(model_off)(cfg=dataclasses.replace(cfg_ab,
                                                           fold_w=True))
        params_ab = jax.device_put(params_ab, dev)

        def _stage_fn(upto):
            def fn(self, images):
                c = self.cfg
                B = images.shape[0]
                feats = self.backbone(images.astype(c.dtype))
                logits, deltas = self.rpn_head(feats)
                if upto == "rpn":
                    return logits[0].astype(jnp.float32).sum()
                props = jax.vmap(lambda lg, dl: generate_proposals(
                    lg, dl, self._anchors, c.input_size,
                    c.rpn_pre_nms_topk, c.rpn_post_nms_topk,
                    c.rpn_nms_threshold,
                    approx_topk_from=c.rpn_approx_topk_from))(logits, deltas)
                if upto == "proposals":
                    return props.scores.astype(jnp.float32).sum()
                K = props.boxes.shape[1]
                feats4 = [f.astype(c.dtype) for f in feats[:4]]
                pooled = multilevel_roi_align_batched(
                    feats4, props.boxes, c.box_pool, FPN_STRIDES[:4])
                if upto == "boxpool":
                    return pooled.astype(jnp.float32).sum()
                cls_logits, box_deltas = self.box_head(
                    pooled.reshape((B * K,) + pooled.shape[2:])
                    .astype(c.dtype))
                det = jax.vmap(lambda cl, bd, pb, ps: box_inference(
                    cl, bd, pb, ps, c.input_size, c.score_threshold,
                    c.nms_threshold, c.max_detections))(
                    cls_logits.reshape(B, K, -1),
                    box_deltas.reshape(B, K, -1),
                    props.boxes, props.scores)
                if upto == "boxhead":
                    return det.scores.astype(jnp.float32).sum()
                D = det.boxes.shape[1]
                mask_pooled = multilevel_roi_align_batched(
                    feats4, det.boxes, c.mask_pool, FPN_STRIDES[:4])
                ml = self.mask_head(
                    mask_pooled.reshape((B * D,) + mask_pooled.shape[2:])
                    .astype(c.dtype))
                return ml.astype(jnp.float32).sum()
            return fn

        out = {}
        for name, m in (("off", model_off), ("on", model_on)):
            prev = 0.0
            stages = {}
            for upto in ("rpn", "proposals", "boxpool", "boxhead",
                         "maskhead"):
                method = _stage_fn(upto)

                @jax.jit
                def _staged(p, t, _m=m, _method=method):
                    return _m.apply(p, normalize_bgr(t), method=_method)

                float(_staged(params_ab, tiles))  # compile
                med, _ = median_ms(
                    lambda: float(_staged(params_ab, tiles)), n=3)
                stages[upto] = {"cum_ms": round(med, 1),
                                "delta_ms": round(med - prev, 1)}
                prev = med
                print(f"sweep[foldstage]: {name} {upto:<10} cum "
                      f"{med:6.1f}ms", file=sys.stderr)
            out[name] = stages
        record("foldstage", out)

    if "prop2" in phases:
        # Finer split of the proposal stage's dominant ~11 ms: raw top-k vs
        # gather vs decode, per level.
        from treedetection_tpu.models.anchors import pyramid_anchors_jnp
        from treedetection_tpu.models.mask_rcnn import FPN_STRIDES
        from treedetection_tpu.ops.boxes import apply_deltas, clip_boxes

        @jax.jit
        def _head(p, t):
            def m(self, images):
                feats = self.backbone(images.astype(self.cfg.dtype))
                lg, dl = self.rpn_head(feats)
                return ([l.astype(jnp.float32) for l in lg],
                        [d.astype(jnp.float32) for d in dl])
            return model.apply(p, normalize_bgr(t), method=m)

        lg, dl = _head(params, tiles)
        jax.block_until_ready(lg)
        out = {}

        def timed(name, fn, *args):
            jfn = jax.jit(fn)
            try:
                float(jfn(*args))
                med, _ = median_ms(lambda: float(jfn(*args)), n=5)
                out[name] = round(med, 1)
                print(f"sweep[prop2]: {name:<20} {med:6.1f}ms",
                      file=sys.stderr)
            except Exception as exc:
                out[name] = f"err:{str(exc)[:120]}"

        def tk_scores(approx, levels=None):
            def fn(lgs):
                def one(lg_i):
                    acc = 0.0
                    for lvl, l in enumerate(lg_i):
                        if levels is not None and lvl not in levels:
                            continue
                        n = int(np.prod(l.shape))
                        s = l.reshape(n)
                        k = min(1000, n)
                        if approx and n > 16384:
                            ts, _ = jax.lax.approx_max_k(
                                s, k, recall_target=0.99)
                        else:
                            ts, _ = jax.lax.top_k(s, k)
                        acc += ts.sum()
                    return acc
                return jax.vmap(one)(lgs).astype(jnp.float32).sum()
            return fn

        def tk_gather(approx=True):
            def fn(lgs, dls):
                anchors = pyramid_anchors_jnp(size, FPN_STRIDES)

                def one(lg_i, dl_i):
                    acc = 0.0
                    for lvl, an in enumerate(anchors):
                        n = an.shape[0]
                        s = lg_i[lvl].reshape(n)
                        d = dl_i[lvl].reshape(n, 4)
                        k = min(1000, n)
                        if approx and n > 16384:
                            ts, idx = jax.lax.approx_max_k(
                                s, k, recall_target=0.99)
                        else:
                            ts, idx = jax.lax.top_k(s, k)
                        acc += ts.sum() + d[idx].sum() + an[idx].sum()
                    return acc
                return jax.vmap(one)(lgs, dls).astype(jnp.float32).sum()
            return fn

        timed("tk_scores_approx", tk_scores(True), lg)
        timed("tk_scores_exact", tk_scores(False), lg)
        timed("tk_scores_p2", tk_scores(True, levels={0}), lg)
        timed("tk_scores_p345", tk_scores(True, levels={1, 2, 3, 4}), lg)
        timed("tk_gather", tk_gather(), lg, dl)
        record("prop2", out)

    if "prop" in phases:
        # Proposal-stage sub-costs at production geometry (the bench-detail
        # delta is ~16 ms/batch): per-level top-k+decode vs NMS vs the full
        # stage, and the pre_nms_topk sensitivity (1000 vs 512 vs 256).
        from treedetection_tpu.models.rpn import generate_proposals, nms_mask
        from treedetection_tpu.models.anchors import pyramid_anchors_jnp
        from treedetection_tpu.models.mask_rcnn import FPN_STRIDES
        from treedetection_tpu.ops.boxes import apply_deltas, clip_boxes

        @jax.jit
        def _head(p, t):
            def m(self, images):
                feats = self.backbone(images.astype(self.cfg.dtype))
                lg, dl = self.rpn_head(feats)
                return ([l.astype(jnp.float32) for l in lg],
                        [d.astype(jnp.float32) for d in dl])
            return model.apply(p, normalize_bgr(t), method=m)

        lg, dl = _head(params, tiles)
        jax.block_until_ready(lg)
        out = {}
        # Measured relay round-trip: every float() fetch pays it, so the raw
        # medians of CHEAP programs are RTT-dominated — record the corrected
        # chip-time estimate alongside (round-4's "NMS-dominated proposal
        # stage" was this artifact: nms_K512 ~27 ms raw is ~0 ms chip).
        tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
        rtt_fn = jax.jit(lambda v: (v + 1.0).sum())
        float(rtt_fn(tiny))
        rtt_ms, _ = median_ms(lambda: float(rtt_fn(tiny)), n=5)
        out["rtt_ms"] = round(rtt_ms, 1)

        def timed(name, fn, *args):
            jfn = jax.jit(fn)
            try:
                float(jfn(*args))
                med, _ = median_ms(lambda: float(jfn(*args)), n=5)
                out[name] = round(med, 1)
                out[name + "_chip"] = round(max(med - rtt_ms, 0.0), 1)
                print(f"sweep[prop]: {name:<18} {med:6.1f}ms "
                      f"(~{max(med - rtt_ms, 0.0):.1f} chip)",
                      file=sys.stderr)
            except Exception as exc:
                out[name] = f"err:{str(exc)[:120]}"

        def full(pre, post=512, approx=16384):
            def fn(lgs, dls):
                anchors = pyramid_anchors_jnp(size, FPN_STRIDES)
                props = jax.vmap(lambda a, b: generate_proposals(
                    a, b, anchors, size, pre, post, 0.7,
                    approx_topk_from=approx))(lgs, dls)
                return props.scores.astype(jnp.float32).sum()
            return fn

        def topk_only(pre, approx=16384):
            # generate_proposals minus the NMS + final top-k: per-level
            # top-k, delta decode, clip
            def fn(lgs, dls):
                anchors = pyramid_anchors_jnp(size, FPN_STRIDES)

                def one(lg_i, dl_i):
                    acc = 0.0
                    for lvl, an in enumerate(anchors):
                        n = an.shape[0]
                        scores = lg_i[lvl].reshape(n)
                        d = dl_i[lvl].reshape(n, 4)
                        k = min(pre, n)
                        if approx and n > approx:
                            ts, idx = jax.lax.approx_max_k(
                                scores, k, recall_target=0.99)
                        else:
                            ts, idx = jax.lax.top_k(scores, k)
                        boxes = clip_boxes(apply_deltas(d[idx], an[idx]),
                                           size, size)
                        acc += boxes.sum() + ts.sum()
                    return acc
                return jax.vmap(one)(lgs, dls).astype(jnp.float32).sum()
            return fn

        timed("full_pre1000", full(1000), lg, dl)
        timed("full_pre512", full(512), lg, dl)
        timed("full_pre256", full(256), lg, dl)
        timed("topk_pre1000", topk_only(1000), lg, dl)
        timed("topk_pre1000_exact", topk_only(1000, approx=0), lg, dl)

        # NMS alone on a realistic stacked (5, K) level tensor
        K = 1000
        lbs = jnp.asarray(rng.uniform(0, 1024, (batch, 5, K, 4)),
                          jnp.float32)
        lbs = lbs.at[..., 2:].set(lbs[..., :2] + 8 +
                                  jnp.abs(lbs[..., 2:] - lbs[..., :2]) * 0.1)
        lss = jnp.asarray(rng.normal(size=(batch, 5, K)), jnp.float32)
        lbs, lss = jax.device_put((lbs, lss), dev)

        def nms_only(bx, sc):
            keep = jax.vmap(jax.vmap(
                lambda b, s: nms_mask(b, s, 0.7)))(bx, sc)
            return keep.astype(jnp.float32).sum()
        timed("nms_K1000", nms_only, lbs, lss)
        timed("nms_K512", nms_only, lbs[:, :, :512], lss[:, :, :512])
        record("prop", out)

    if "mfu" in phases:
        # Backbone MFU levers (VERDICT r3 task 4): scan-over-blocks vs
        # unrolled res stages, and the RPN-head increment, at production
        # geometry (R101 @ 1024^2, batch 8, bf16).  XLA_FLAGS must be set
        # before process start, so flag A/B runs are separate invocations —
        # the active flags are recorded with each measurement.
        import os as _os
        out = {"xla_flags": _os.environ.get("XLA_FLAGS", "")}
        for scan in (True, False):
            tag = "scan" if scan else "unroll"
            try:
                cfgv = MaskRCNNConfig(depth=101, input_size=size, bf16=True,
                                      scan_blocks=scan)
                mv, pv = create_model(cfgv)
                pv = jax.device_put(pv, dev)

                @jax.jit
                def bb_fn(p, x, _m=mv, _c=cfgv):
                    feats = _m.apply(p, x, method=lambda s, im: s.backbone(
                        im.astype(_c.dtype)))
                    return feats[0].astype(jnp.float32).sum()

                @jax.jit
                def bbrpn_fn(p, x, _m=mv, _c=cfgv):
                    feats = _m.apply(p, x, method=lambda s, im: s.backbone(
                        im.astype(_c.dtype)))
                    lg, dl = _m.apply(p, feats,
                                      method=lambda s, f: s.rpn_head(f))
                    return lg[0].astype(jnp.float32).sum()

                xin = jax.device_put(jax.device_get(jax.jit(
                    lambda t: normalize_bgr(t.astype(jnp.float32)))(tiles)),
                    dev)
                t0 = time.time()
                float(bb_fn(pv, xin))
                out[f"compile_bb_{tag}_s"] = round(time.time() - t0, 1)
                med, _ = median_ms(lambda: float(bb_fn(pv, xin)), n=5)
                out[f"backbone_{tag}_ms"] = round(med, 1)
                t0 = time.time()
                float(bbrpn_fn(pv, xin))
                out[f"compile_bbrpn_{tag}_s"] = round(time.time() - t0, 1)
                med2, _ = median_ms(lambda: float(bbrpn_fn(pv, xin)), n=5)
                out[f"bb_rpn_{tag}_ms"] = round(med2, 1)
                print(f"sweep[mfu]: {tag} bb={med:.1f}ms bb+rpn={med2:.1f}ms",
                      file=sys.stderr)
                del mv, pv
            except Exception as exc:
                out[tag] = f"err:{str(exc)[:160]}"
        record("mfu", out)

    return 0


if __name__ == "__main__":
    phases = sys.argv[1:] or ["chip", "compile", "detail", "roi"]
    sys.exit(main(phases))
