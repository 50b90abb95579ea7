"""Inference CLI (counterpart of reference detect.py).

Runs a detector over images/dirs/globs/videos, draws boxes, saves
txt/crops/annotated outputs. The hot path (forward + decode + NMS) is one
jitted device program; only drawing and IO stay on host (reference keeps
NMS on GPU but loops per image in Python, detect.py:148-273).

Reference defaults reproduced: conf 0.4 / iou 0.2 (detect.py:40-41) —
note these differ from the mAP protocol (use val.py for metrics).
The reference's always-on feature-map dumping (visualize=True hardcoded,
detect.py:162 — a defect) is NOT reproduced; pass --visualize.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import cv2
import numpy as np

from yolosomi_tpu.data.datasets import LoadImages
from yolosomi_tpu.engine.runner import Runner
from yolosomi_tpu.utils.boxes import scale_coords, xyxy2xywhn
from yolosomi_tpu.utils.general import LOGGER, increment_path

COLORS = [(56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255), (49, 210, 207),
          (10, 249, 72), (23, 204, 146), (134, 219, 61), (52, 147, 26), (187, 212, 0),
          (168, 153, 44), (255, 194, 0), (147, 69, 52), (255, 115, 100), (236, 24, 0),
          (255, 56, 132), (133, 0, 82), (255, 56, 203), (200, 149, 255), (199, 55, 255)]


def draw_box(im, box, label: str, color, lw: int = 2):
    """Annotate one box. `lw` is --line-thickness; the label font scales
    with it like the reference's plot_one_box (utils/plots.py Annotator:
    text thickness max(lw-1,1), fontScale lw/4 — lw=2 reproduces the old
    hardcoded 0.5/1 look exactly)."""
    p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
    cv2.rectangle(im, p1, p2, color, lw, lineType=cv2.LINE_AA)
    if label:
        tf = max(lw - 1, 1)
        fs = lw / 4.0
        w, h = cv2.getTextSize(label, 0, fontScale=fs, thickness=tf)[0]
        outside = p1[1] - h - 3 >= 0
        p2 = p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3
        cv2.rectangle(im, p1, p2, color, -1, cv2.LINE_AA)
        cv2.putText(im, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2), 0, fs,
                    (255, 255, 255), tf, cv2.LINE_AA)


def run(
    weights="somi.msgpack",
    cfg="yolo-somi",
    source="data/images",
    imgsz=640,
    conf_thres=0.4,
    iou_thres=0.2,
    max_det=300,
    save_txt=False,
    save_conf=False,
    save_crop=False,
    nosave=False,
    classes=None,
    agnostic_nms=False,
    project="runs/detect",
    name="exp",
    exist_ok=False,
    line_thickness=2,
    hide_labels=False,
    hide_conf=False,
    names=None,
    data=None,
    augment=False,
    visualize=False,
    classify=None,
    shard_spatial=1,
):
    if names is None and data:
        from yolosomi_tpu.utils.config import find_config, load_data_cfg

        names = load_data_cfg(find_config(data, "data")).get("names")
    classify_fn = classify
    if isinstance(classify, str):
        # "cfg" or "cfg:weights" -> a Classify-head model (models/layers.py
        # Classify); the reference's resnet50.pt analogue
        from yolosomi_tpu.engine.runner import Runner

        ccfg, _, cweights = classify.partition(":")
        crunner = Runner(ccfg, weights=cweights or None, imgsz=224)
        cvars = crunner.variables
        cmodel = crunner.model
        import jax as _jax

        classify_fn = _jax.jit(lambda imgs: cmodel.apply(cvars, imgs, False))
    save_img = not nosave
    # validate the source BEFORE the (slow) model build/compile
    src = Path(source)
    if "*" not in str(source) and not src.exists():
        raise FileNotFoundError(f"source {source} does not exist")
    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok, mkdir=True)
    (save_dir / "labels" if save_txt else save_dir).mkdir(parents=True, exist_ok=True)

    # multi-weight -> ensemble (reference: experimental.py:74-87)
    from yolosomi_tpu.engine.runner import attempt_load

    runner = attempt_load(weights, cfg, imgsz=imgsz, spatial_shards=shard_spatial)
    names = names or runner.names
    dataset = LoadImages(source, img_size=imgsz, stride=runner.stride, auto=False)

    cls_mask = None
    if classes is not None:
        cls_mask = np.zeros(runner.meta.nc, bool)
        cls_mask[classes] = True

    t_pre = t_inf = 0.0
    seen = 0
    vid_writer = None
    for path, img, im0, cap in dataset:
        t0 = time.time()
        x = img[None]  # uint8; normalized on device
        t1 = time.time()
        infer = runner.infer_fn(
            conf_thres=conf_thres, iou_thres=iou_thres, agnostic=agnostic_nms, max_det=max_det,
            augment=augment, class_mask=cls_mask,
        )
        det = np.asarray(infer(runner.variables, x))[0]
        if visualize:
            # feature-map dump via the graph capture hook (the reference
            # hardcodes visualize=True in its loop, detect.py:162 — a
            # defect; here it is opt-in)
            from yolosomi_tpu.utils.plots import feature_visualization

            vis_dir = save_dir / "features"
            vis_dir.mkdir(parents=True, exist_ok=True)
            import jax as _jax

            for li in (2, len(runner.model.layers) // 2):
                _, feat = runner.model.apply(runner.variables, _jax.numpy.asarray(x), train=False, capture=li)
                feature_visualization(np.asarray(feat), f"{Path(path).stem}_layer{li}", save_dir=str(vis_dir))
        t2 = time.time()
        t_pre += t1 - t0
        t_inf += t2 - t1
        seen += 1

        det = det[det[:, 4] > 0]
        if len(det):
            det[:, :4] = np.asarray(scale_coords(img.shape[:2], det[:, :4], im0.shape[:2]))
        if classify is not None and len(det):
            # second-stage classifier filter (reference detect.py:93-95)
            from yolosomi_tpu.utils.classifier import apply_classifier

            det = apply_classifier(det, classify_fn, im0)
        p = Path(path)
        txt_path = str(save_dir / "labels" / p.stem)
        s = f"{p.name}: {img.shape[1]}x{img.shape[0]} "
        for c in np.unique(det[:, 5].astype(int)) if len(det) else []:
            n = (det[:, 5] == c).sum()
            s += f"{n} {names[int(c)] if int(c) < len(names) else c}, "
        LOGGER.info(f"{s}({(t2 - t1) * 1000:.1f}ms)")

        for *xyxy, conf, c in det:
            c = int(c)
            if save_txt:
                xywh = np.asarray(xyxy2xywhn(np.array(xyxy)[None], w=im0.shape[1], h=im0.shape[0]))[0]
                line = (c, *xywh, conf) if save_conf else (c, *xywh)
                with open(f"{txt_path}.txt", "a") as f:
                    f.write(("%g " * len(line)).rstrip() % line + "\n")
            if save_img or save_crop:
                label = None if hide_labels else (
                    names[c] if hide_conf else f"{names[c]} {conf:.2f}"
                ) if c < len(names) else str(c)
                draw_box(im0, xyxy, label, COLORS[c % len(COLORS)], lw=line_thickness)
            if save_crop:
                crop_dir = save_dir / "crops" / (names[c] if c < len(names) else str(c))
                crop_dir.mkdir(parents=True, exist_ok=True)
                x1, y1, x2, y2 = (int(v) for v in xyxy)
                cv2.imwrite(str(crop_dir / f"{p.stem}.jpg"), im0[max(y1, 0) : y2, max(x1, 0) : x2])

        if save_img:
            if dataset.mode == "image":
                cv2.imwrite(str(save_dir / p.name), im0)
            else:
                if vid_writer is None:
                    fps = cap.get(cv2.CAP_PROP_FPS) or 30
                    w, h = im0.shape[1], im0.shape[0]
                    vid_writer = cv2.VideoWriter(
                        str(save_dir / (p.stem + ".mp4")), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
                    )
                vid_writer.write(im0)
    if vid_writer is not None:
        vid_writer.release()
    LOGGER.info(
        f"Speed: {t_pre / max(seen, 1) * 1000:.1f}ms pre, {t_inf / max(seen, 1) * 1000:.1f}ms "
        f"inference+NMS per image; results saved to {save_dir}"
    )
    return save_dir


def parse_opt(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, nargs="+", default="somi.msgpack",
                        help="checkpoint path(s); several -> ensemble inference")
    parser.add_argument("--cfg", type=str, default="yolo-somi")
    parser.add_argument("--source", type=str, default="data/images")
    parser.add_argument("--imgsz", "--img", "--img-size", type=int, default=640)
    parser.add_argument("--conf-thres", type=float, default=0.4)
    parser.add_argument("--iou-thres", type=float, default=0.2)
    parser.add_argument("--max-det", type=int, default=300)
    parser.add_argument("--save-txt", action="store_true")
    parser.add_argument("--save-conf", action="store_true")
    parser.add_argument("--save-crop", action="store_true")
    parser.add_argument("--nosave", action="store_true")
    parser.add_argument("--classes", nargs="+", type=int)
    parser.add_argument("--agnostic-nms", action="store_true")
    parser.add_argument("--project", default="runs/detect")
    parser.add_argument("--name", default="exp")
    parser.add_argument("--exist-ok", action="store_true")
    parser.add_argument("--device", type=str, default="", help="jax platform: cpu or tpu")
    parser.add_argument("--shard-spatial", type=int, default=1,
                        help="split activations along H over N devices (1280px+ inputs)")
    parser.add_argument("--hide-labels", action="store_true")
    parser.add_argument("--hide-conf", action="store_true")
    parser.add_argument("--line-thickness", type=int, default=2, help="annotation box line width (px)")
    parser.add_argument("--data", type=str, default=None, help="data yaml for class names")
    parser.add_argument("--classify", type=str, default=None,
                        help="second-stage classifier checkpoint (cfg:weights); reference detect.py:93")
    parser.add_argument("--augment", action="store_true", help="TTA inference")
    parser.add_argument("--visualize", action="store_true", help="save feature-map grids")
    return parser.parse_args(argv)


def main(opt):
    opts = vars(opt).copy()
    from yolosomi_tpu.utils.general import select_device
    select_device(opts.pop("device", ""))
    run(**opts)


if __name__ == "__main__":
    main(parse_opt())
