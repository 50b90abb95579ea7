"""Grad-CAM explainability suite.

Counterpart of the reference's yolo-gradcam/ package
(yolov5_heatmap.py:22-212 + gradcam.py): class-activation heatmaps from
the gradients of detection scores w.r.t. an intermediate feature map.
Where the reference registers forward/backward torch hooks
(ActivationsAndGradients), here the graph interpreter exposes
capture/inject points and jax.grad differentiates straight through —
no hooks, no state.

Score target: the summed top-`ratio` class+objectness scores over all
decoded boxes (the reference's yolov5_target with 'class' backward type,
yolov5_heatmap.py:87-104).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from yolosomi_tpu.models.heads import decode
from yolosomi_tpu.utils.general import LOGGER


def _target_score(dec: jax.Array, ratio: float, class_idx: Optional[int]) -> jax.Array:
    """Sum of top-ratio (obj * cls) scores (reference: yolov5_heatmap.py:92-104)."""
    obj = dec[..., 4]
    cls = dec[..., 5:]
    score = obj * (cls[..., class_idx] if class_idx is not None else cls.max(-1))
    k = max(int(score.shape[1] * ratio), 1)
    top, _ = jax.lax.top_k(score, k)
    return top.sum()


def gradcam(
    runner,
    image: np.ndarray,  # (H, W, 3) uint8 BGR (native size; will be letterboxed)
    layer: int,
    imgsz: int = 640,
    class_idx: Optional[int] = None,
    ratio: float = 0.02,
    method: str = "gradcam",  # or 'gradcampp'
) -> np.ndarray:
    """Heatmap (H, W) float [0,1] for one image at one backbone layer."""
    from yolosomi_tpu.data.augment import letterbox

    lb = letterbox(image, imgsz, auto=False)[0]
    x = jnp.asarray(lb[None].astype(np.float32) / 255.0)
    variables = runner.variables
    model = runner.model
    meta = runner.meta

    # phase 1: capture the target activation (jitted; compiles once per shape)
    cap = jax.jit(lambda v, xx: model.apply(v, xx, train=False, capture=layer)[1])
    feat = cap(variables, x)

    # phase 2: differentiate the detection score w.r.t. that activation
    def score_of(f, v, xx):
        preds = model.apply(v, xx, train=False, inject={layer: f})
        dec = decode(preds, meta.anchors_px, meta.strides)
        return _target_score(dec, ratio, class_idx)

    grads = jax.jit(jax.grad(score_of))(feat, variables, x)  # (1, h, w, c)

    g = np.asarray(grads[0], np.float32)
    a = np.asarray(feat[0], np.float32)
    if method == "gradcampp":
        # Grad-CAM++ weights (reference gradcam.py GradCAMpp)
        g2, g3 = g**2, g**3
        denom = 2 * g2 + (a * g3).sum((0, 1), keepdims=True)
        alpha = np.where(denom != 0, g2 / (denom + 1e-7), 0.0)
        w = (alpha * np.maximum(g, 0)).sum((0, 1))
    else:
        w = g.mean((0, 1))  # GAP of gradients
    cam = np.maximum((a * w).sum(-1), 0.0)
    if cam.max() > 0:
        cam /= cam.max()

    import cv2

    cam = cv2.resize(cam, (image.shape[1], image.shape[0]))
    return cam


def overlay_heatmap(image: np.ndarray, cam: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Blend a jet-colormapped CAM over the image (reference:
    show_cam_on_image usage, yolov5_heatmap.py:150-160)."""
    import cv2

    heat = cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)
    return cv2.addWeighted(image, 1 - alpha, heat, alpha, 0)


def run_heatmaps(
    cfg: str,
    weights: Optional[str],
    source: str,
    layer: int = 17,
    imgsz: int = 640,
    method: str = "gradcam",
    save_dir: str = "runs/gradcam",
):
    """CLI body: heatmap every image in `source` (reference:
    yolov5_heatmap.py __main__)."""
    import cv2

    from yolosomi_tpu.engine.runner import Runner

    runner = Runner(cfg, weights, imgsz=imgsz)
    save = Path(save_dir)
    save.mkdir(parents=True, exist_ok=True)
    files = sorted(Path(source).glob("*.*")) if Path(source).is_dir() else [Path(source)]
    for f in files:
        im = cv2.imread(str(f))
        if im is None:
            continue
        cam = gradcam(runner, im, layer, imgsz=imgsz, method=method)
        out = overlay_heatmap(im, cam)
        cv2.imwrite(str(save / f.name), out)
        LOGGER.info(f"heatmap -> {save / f.name}")
    return save
