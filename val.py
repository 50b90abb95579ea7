"""Validation CLI: mAP@0.5:0.95 evaluation (counterpart of reference val.py).

Pipeline: batched jitted inference (forward + decode + NMS on device) ->
host-side letterbox-inverse rescale -> greedy TP matching at 10 IoU
thresholds -> ap_per_class with the reference's exact protocol
(1000-pt curves, 101-pt AP, F1-argmax operating point; val.py:50-251).

Protocol notes vs the reference:
- run() defaults to the mAP-correct conf 0.001 / IoU 0.6; the reference
  CLI defaults of conf 0.4 / IoU 0.2 (val.py:258-259, which inflate P and
  deflate mAP) are available via flags for comparability.
- the reference hardcodes loading hyp.VisDrone.yaml in standalone eval
  (val.py:124-128, a defect) — not reproduced; pass --hyp if loss values
  are wanted.
- --alpha-iou switches TP matching to alpha-IoU (utils/metrics_aIoU.py).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from yolosomi_tpu.data.datasets import DataLoader, DetectionDataset
from yolosomi_tpu.engine.runner import Runner
from yolosomi_tpu.utils.boxes import scale_coords, xywh2xyxy
from yolosomi_tpu.utils.config import find_config, load_data_cfg
from yolosomi_tpu.utils.general import LOGGER, check_img_size, increment_path
from yolosomi_tpu.utils.metrics import ConfusionMatrix, ap_per_class, fitness, process_batch


def _greedy_nms_host(rows: np.ndarray, iou_thres: float, max_wh: float | None = None) -> np.ndarray:
    """Greedy class-offset NMS on host over (n, 6) [xyxy, conf, cls] rows,
    the same rule as the device path (reference: general.py:680-694). Used
    only by --save-hybrid, where ground-truth rows must join the pool.

    The class offset must exceed every coordinate in the pool: this runs
    AFTER scale_coords (original-image space), unlike the reference's
    in-NMS injection (network-input space, fixed 4096), so for images
    near/above 4096 px a fixed offset would let class regions overlap and
    wrongly suppress cross-class boxes — size it from the data instead."""
    if max_wh is None:
        max_wh = max(4096.0, float(rows[:, :4].max()) + 1.0 if len(rows) else 0.0)
    order = np.argsort(-rows[:, 4], kind="stable")
    boxes = rows[order, :4] + rows[order, 5:6] * max_wh
    keep = []
    alive = np.ones(len(rows), bool)
    for i in range(len(rows)):
        if not alive[i]:
            continue
        keep.append(order[i])
        x1 = np.maximum(boxes[i, 0], boxes[i + 1:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[i + 1:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[i + 1:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[i + 1:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[i + 1:, 2] - boxes[i + 1:, 0]) * (boxes[i + 1:, 3] - boxes[i + 1:, 1])
        iou = inter / (a + b - inter + 1e-7)
        alive[i + 1:] &= iou <= iou_thres
    return rows[np.array(keep, int)] if keep else rows[:0]


def run(
    data,
    weights=None,
    cfg="yolo-somi",
    batch_size=16,
    imgsz=640,
    conf_thres=0.001,
    iou_thres=0.6,
    task="val",
    single_cls=False,
    augment=False,
    save_txt=False,
    save_hybrid=False,
    save_conf=False,
    save_json=False,
    verbose=False,
    project="runs/val",
    name="exp",
    exist_ok=False,
    half=True,
    max_det=300,
    alpha_iou=False,
    plots=False,
    shard_spatial=1,
    int8=False,
    int8_exclude=(),
    int8_per_channel=False,
    runner: Runner = None,
    dataloader: DataLoader = None,
    names=None,
    compute_loss=None,
):
    t_start = time.time()
    data_dict = load_data_cfg(find_config(data, "data")) if isinstance(data, str) else data
    nc = 1 if single_cls else int(data_dict["nc"])
    names = names or data_dict.get("names", [str(i) for i in range(nc)])

    if runner is None:
        runner = Runner(cfg, weights, nc=nc, imgsz=imgsz, spatial_shards=shard_spatial)
    imgsz = check_img_size(imgsz, s=runner.stride)

    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok, mkdir=True)

    if dataloader is None:
        dataset = DetectionDataset(
            data_dict[task], img_size=imgsz, batch_size=batch_size, augment=False,
            rect=False, stride=runner.stride, pad=0.5,
        )
        dataloader = DataLoader(dataset, batch_size, shuffle=False)

    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    jdict = []  # COCO-format prediction records (reference: val.py:220-241)
    confusion = ConfusionMatrix(nc=nc) if plots else None
    # eval path uses exact top-k candidate selection and the reference's
    # max_nms=30000 (general.py:665) so the protocol matches the reference
    # exactly on dense small-object datasets (ADVICE r1).
    infer = runner.infer_fn(
        conf_thres=conf_thres, iou_thres=iou_thres, multi_label=True, max_det=max_det,
        augment=augment, exact=True, max_nms=30000,
    )
    if int8:
        # int8 serving path under the EXACT eval protocol (same top-k +
        # max_nms as the bf16 branch) so the mAP delta isolates
        # quantization error (PERF.md round-3 accuracy bound)
        from yolosomi_tpu.ops.quant import quantized_infer_fn

        # "head" expands to the detect head's module prefix — the usual
        # sensitivity exclusion (head convs carry the box/cls logits, where
        # quantization error lands directly on the output)
        exclude = tuple(
            rf"^layers_{len(runner.model.layers) - 1}/" if p == "head" else p
            for p in int8_exclude
        )
        calib = next(iter(dataloader))[0]
        qfn = quantized_infer_fn(
            runner, calib, exclude=exclude, per_channel=int8_per_channel,
            conf_thres=conf_thres, iou_thres=iou_thres,
            multi_label=True, max_det=max_det, exact=True, max_nms=30000,
        )
        infer = lambda variables, x: qfn(x)  # noqa: E731

    # cached on the runner: defining a fresh jit closure here recompiled
    # the full forward+loss program on every per-epoch call (~30 s/epoch)
    loss_fn_batch = runner.val_loss_fn(compute_loss) if compute_loss is not None else None

    val_losses = np.zeros(3)
    n_loss_batches = 0
    seen = 0
    t_pre = t_inf = t_post = 0.0
    # the DataLoader pads the final partial batch by wrapping to the start
    # of the dataset (fixed shapes for jit); val iterates in order, so the
    # wrapped duplicates are always the tail of the last batch — cap the
    # per-image loop so they are not double-counted in the statistics.
    remaining = len(dataloader.dataset)
    for images, targets, paths, shapes in dataloader:
        t0 = time.time()
        x = images  # uint8; normalized on device
        t1 = time.time()
        out = np.asarray(infer(runner.variables, x))
        if loss_fn_batch is not None:
            val_losses += np.asarray(loss_fn_batch(runner.variables, x, targets))
            n_loss_batches += 1
        t2 = time.time()

        h, w = images.shape[1:3]
        n_real = min(len(paths), remaining)
        remaining -= n_real
        for si in range(n_real):
            seen += 1
            det = out[si]
            det = det[det[:, 4] > 0]
            labs = targets[si]
            labs = labs[labs[:, 0] >= 0]
            tbox = np.zeros((0, 5), np.float32)
            if len(labs):
                tbox = np.concatenate(
                    [labs[:, 0:1], np.asarray(xywh2xyxy(labs[:, 1:5] * [w, h, w, h]))], 1
                )
            if shapes[si] is not None:
                (h0, w0), ratio_pad = shapes[si]
                if len(det):
                    det = det.copy()
                    det[:, :4] = np.asarray(scale_coords((h, w), det[:, :4], (h0, w0), ratio_pad))
                if len(tbox):
                    tbox = tbox.copy()
                    tbox[:, 1:5] = np.asarray(scale_coords((h, w), tbox[:, 1:5], (h0, w0), ratio_pad))
            if single_cls and len(det):
                det[:, 5] = 0
            if save_hybrid and len(tbox):
                # autolabel-hybrid (reference: val.py:162-164 injects labels
                # as conf-1.0 candidates into NMS). Host equivalent: merge
                # label rows at conf 1.0 with the detections and re-run the
                # same greedy class-offset suppression — conf-1.0 rows sort
                # first, so labels always survive and suppress overlapping
                # same-class predictions, matching the in-NMS injection (up
                # to second-order suppression chains among predictions).
                lab_rows = np.concatenate(
                    [tbox[:, 1:5], np.ones((len(tbox), 1), np.float32), tbox[:, 0:1]], 1
                )
                det = _greedy_nms_host(
                    np.concatenate([lab_rows, det], 0).astype(np.float32), iou_thres
                )[:max_det]  # reference NMS truncates to max_det AFTER label injection
            correct = process_batch(det, tbox, iouv, alpha_iou=alpha_iou)
            stats.append((correct, det[:, 4], det[:, 5], tbox[:, 0]))
            if confusion is not None:
                confusion.process_batch(det, tbox)
            if save_txt and len(det):
                # reference txt format (val.py:34-38 save_one_txt): class +
                # xywh normalized by the ORIGINAL image shape, %g fields,
                # confidence appended only with --save-conf. This is also the
                # format wbf.py fuses.
                h0w0 = shapes[si][0] if shapes[si] is not None else (h, w)
                gn = np.array([h0w0[1], h0w0[0], h0w0[1], h0w0[0]], np.float32)
                (save_dir / "labels").mkdir(parents=True, exist_ok=True)
                with open(save_dir / "labels" / (Path(paths[si]).stem + ".txt"), "a") as f:
                    for row in det:
                        xyxy = row[:4]
                        xywh = np.array(
                            [(xyxy[0] + xyxy[2]) / 2, (xyxy[1] + xyxy[3]) / 2,
                             xyxy[2] - xyxy[0], xyxy[3] - xyxy[1]], np.float32,
                        ) / gn
                        line = (int(row[5]), *xywh, row[4]) if save_conf else (int(row[5]), *xywh)
                        f.write(" ".join(f"{v:g}" for v in line) + "\n")
            if save_json and len(det):
                stem = Path(paths[si]).stem
                image_id = int(stem) if stem.isnumeric() else stem
                for row in det:
                    jdict.append(
                        {
                            "image_id": image_id,
                            "category_id": int(row[5]),
                            "bbox": [round(float(v), 3) for v in
                                     (row[0], row[1], row[2] - row[0], row[3] - row[1])],
                            "score": round(float(row[4]), 5),
                        }
                    )
        t_post += time.time() - t2
        t_inf += t2 - t1
        t_pre += t1 - t0

    if stats:
        stats_np = [np.concatenate(x, 0) for x in zip(*stats)]
    else:
        stats_np = []
    mp = mr = map50 = map_ = 0.0
    ap_class = []
    nt = np.zeros(nc)
    if len(stats_np) and stats_np[0].any():
        p, r, ap, f1, ap_class = ap_per_class(
            *stats_np, plot=plots, save_dir=str(save_dir), names=names
        )
        ap50, ap = ap[:, 0], ap.mean(1)
        mp, mr, map50, map_ = p.mean(), r.mean(), ap50.mean(), ap.mean()
        nt = np.bincount(stats_np[3].astype(int), minlength=nc)

    pf = "%20s" + "%11i" * 2 + "%11.3g" * 4
    LOGGER.info(("%20s" + "%11s" * 6) % ("Class", "Images", "Labels", "P", "R", "mAP@.5", "mAP@.5:.95"))
    LOGGER.info(pf % ("all", seen, nt.sum(), mp, mr, map50, map_))
    # per-class rows when verbose or few classes (reference val.py:205-207)
    if len(ap_class) and nc > 1 and (verbose or nc < 50):
        for i, c in enumerate(ap_class):
            LOGGER.info(pf % (names[c] if c < len(names) else c, seen, nt[c], p[i], r[i], ap50[i], ap[i]))

    spd = tuple(x / max(seen, 1) * 1000 for x in (t_pre, t_inf, t_post))
    LOGGER.info("Speed: %.1fms pre, %.1fms inference+NMS, %.1fms post per image" % spd)
    if confusion is not None:
        confusion.plot(save_dir=str(save_dir), names=names)

    if save_json and jdict:
        pred_json = save_dir / "predictions.json"
        pred_json.write_text(json.dumps(jdict))
        LOGGER.info(f"COCO JSON: {pred_json} ({len(jdict)} detections)")
        # pycocotools COCOeval when available (reference: val.py:227-241)
        ann_json = data_dict.get("annotations")
        if ann_json and Path(str(ann_json)).exists():
            try:
                from pycocotools.coco import COCO
                from pycocotools.cocoeval import COCOeval

                coco_gt = COCO(str(ann_json))
                coco_dt = coco_gt.loadRes(str(pred_json))
                ev = COCOeval(coco_gt, coco_dt, "bbox")
                ev.evaluate()
                ev.accumulate()
                ev.summarize()
                map_, map50 = ev.stats[0], ev.stats[1]
            except ImportError:
                # vendored numpy COCO evaluator (same protocol)
                from yolosomi_tpu.utils.cocoeval import COCOEvaluator

                ev = COCOEvaluator.from_files(str(ann_json), str(pred_json)).accumulate()
                stats = ev.summarize(log=LOGGER.info)
                map_, map50 = float(stats[0]), float(stats[1])

    maps = np.zeros(nc) + map_
    for i, c in enumerate(ap_class):
        maps[int(c)] = ap[i]
    vb, vo, vc = (val_losses / max(n_loss_batches, 1)).tolist()
    results = (mp, mr, map50, map_, vb, vo, vc)
    fi = float(fitness(np.array(results[:4])))
    LOGGER.info(f"fitness: {fi:.4f} ({time.time() - t_start:.1f}s)")
    # machine-readable summary for downstream tables (Pareto collector,
    # reproduce_baseline.sh): one JSON per run dir
    (save_dir / "metrics.json").write_text(json.dumps({
        "P": float(mp), "R": float(mr), "mAP50": float(map50), "mAP": float(map_),
        "fitness": fi, "images": int(seen),
        "speed_ms": {"pre": spd[0], "inference_nms": spd[1], "post": spd[2]},
        "int8": bool(int8), "imgsz": int(imgsz), "cfg": str(cfg),
    }))
    return results, maps, spd


def parse_opt(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="visdrone")
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--cfg", type=str, default="yolo-somi")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--imgsz", "--img", "--img-size", type=int, default=640)
    # reference CLI defaults (val.py:258-259); run() itself defaults to the
    # mAP-correct 0.001/0.6
    parser.add_argument("--conf-thres", type=float, default=0.001)
    parser.add_argument("--iou-thres", type=float, default=0.6)
    parser.add_argument("--task", default="val")
    parser.add_argument("--single-cls", action="store_true")
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--save-txt", action="store_true")
    parser.add_argument("--save-hybrid", action="store_true",
                        help="merge ground-truth labels into the NMS pool (autolabelling; reference val.py:162)")
    parser.add_argument("--save-conf", action="store_true", help="append confidence to --save-txt rows")
    parser.add_argument("--save-json", action="store_true")
    parser.add_argument("--verbose", action="store_true", help="per-class metric rows regardless of class count")
    parser.add_argument("--project", default="runs/val")
    parser.add_argument("--name", default="exp")
    parser.add_argument("--exist-ok", action="store_true")
    parser.add_argument("--device", type=str, default="", help="jax platform: cpu or tpu")
    parser.add_argument("--alpha-iou", action="store_true")
    parser.add_argument("--int8", action="store_true", help="post-training int8 eval (calibrates on the first val batch)")
    parser.add_argument(
        "--int8-exclude", nargs="+", default=[], metavar="REGEX",
        help="module-path regexes kept in float under --int8 ('head' = the detect head)",
    )
    parser.add_argument(
        "--int8-per-channel", action="store_true",
        help="per-channel activation scales under --int8 (mixed-scale concat fix)",
    )
    parser.add_argument("--shard-spatial", type=int, default=1,
                        help="split activations along H over N devices (1280px+ inputs)")
    parser.add_argument("--plots", action="store_true")
    return parser.parse_args(argv)


def main(opt):
    opts = vars(opt).copy()
    from yolosomi_tpu.utils.general import select_device

    select_device(opts.pop("device", ""))
    task = opts.get("task", "val")
    if task in ("train", "val", "test"):
        return run(**opts)
    if task == "speed":
        # speed benchmark protocol (reference: val.py:292-295)
        opts.update(task="val", conf_thres=0.25, iou_thres=0.45, save_json=False, plots=False)
        return run(**opts)
    if task == "study":
        # accuracy-vs-size sweep (reference: val.py:296-301)
        results = []
        for imgsz in range(256, 1536 + 128, 128):
            LOGGER.info(f"study: imgsz {imgsz}")
            o = dict(opts, task="val", imgsz=imgsz, plots=False)
            r, _, spd = run(**o)
            results.append([imgsz, *r[:4], *spd])
        out = Path(f"study_{Path(str(opts['data'])).stem}_{opts['cfg']}.txt".replace("/", "_"))
        np.savetxt(out, np.array(results), fmt="%10.4g")
        LOGGER.info(f"study results saved to {out}")
        return results
    raise ValueError(f"unknown task {task}")


if __name__ == "__main__":
    main(parse_opt())
