"""Graph-build + decode-shape tests for the full Detect-head family
(spec: reference models/yolo.py:46-1158).

Each head builds on a tiny shared backbone, initializes, forwards in both
train and eval modes, and (for anchor-based heads) decodes to the expected
static row count.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosomi_tpu.losses import ComputeLoss, pad_targets
from yolosomi_tpu.models.heads import decode, decode_v8, postprocess_end2end
from yolosomi_tpu.models.yolo import build_model, init_model

ANCHORS3 = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119], [116, 90, 156, 198, 373, 326]]


def tiny_cfg(head_row, extra_head_rows=(), anchors=ANCHORS3):
    """Small 3-level v5-style graph ending in `head_row`."""
    return {
        "nc": 4,
        "depth_multiple": 0.33,
        "width_multiple": 0.125,
        "anchors": anchors,
        "backbone": [
            [-1, 1, "Conv", [64, 6, 2, 2]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "C3", [128]],
            [-1, 1, "Conv", [256, 3, 2]],
            [-1, 1, "C3", [256]],
            [-1, 1, "Conv", [512, 3, 2]],
            [-1, 1, "C3", [512]],
            [-1, 1, "Conv", [1024, 3, 2]],
            [-1, 1, "C3", [1024]],
            [-1, 1, "SPPF", [1024, 5]],
        ],
        "head": [
            [-1, 1, "Conv", [512, 1, 1]],
            [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
            [[-1, 6], 1, "Concat", [1]],
            [-1, 1, "C3", [512, False]],
            [-1, 1, "Conv", [256, 1, 1]],
            [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
            [[-1, 4], 1, "Concat", [1]],
            [-1, 1, "C3", [256, False]],  # 17: P3/8
            [-1, 1, "Conv", [256, 3, 2]],
            [[-1, 14], 1, "Concat", [1]],
            [-1, 1, "C3", [512, False]],  # 20: P4/16
            [-1, 1, "Conv", [512, 3, 2]],
            [[-1, 10], 1, "Concat", [1]],
            [-1, 1, "C3", [1024, False]],  # 23: P5/32
            *extra_head_rows,
            head_row,
        ],
    }


def build_forward(cfg, imgsz=64, train=False):
    model, meta = build_model(cfg)
    variables = init_model(model, meta, imgsz=imgsz)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, imgsz, imgsz, 3)), jnp.float32)
    if train:
        out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    else:
        out = model.apply(variables, x, train=False)
    return model, meta, variables, out


def expected_rows(meta, imgsz):
    return sum(int(meta.na * (imgsz / s) ** 2) for s in meta.strides)


@pytest.mark.parametrize(
    "head",
    ["Detect", "DecoupledDetect", "IDetect", "ASFF_Detect", "DetectODConv"],
)
def test_standard_3level_heads(head):
    cfg = tiny_cfg([[17, 20, 23], 1, head, ["nc", "anchors"]])
    _, meta, _, out = build_forward(cfg)
    assert meta.nl == 3 and meta.na == 3
    assert len(out) == 3
    for i, p in enumerate(out):
        assert p.shape == (1, 64 // int(meta.strides[i]), 64 // int(meta.strides[i]), 3, 9)
    dec = decode(out, meta.anchors_px, meta.strides)
    assert dec.shape == (1, expected_rows(meta, 64), 9)
    assert np.isfinite(np.asarray(dec)).all()


def test_iaux_detect():
    # lead levels 17/20/23 + aux levels reuse the same maps (shape test)
    cfg = tiny_cfg([[17, 20, 23, 17, 20, 23], 1, "IAuxDetect", ["nc", "anchors"]])
    model, meta, variables, out = build_forward(cfg, train=True)
    assert meta.nl == 3
    assert len(out) == 6  # lead + aux maps in train mode
    ev = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(ev) == 3  # eval: lead only
    dec = decode(ev, meta.anchors_px, meta.strides)
    assert dec.shape[1] == expected_rows(meta, 64)
    # loss consumes 2*nl maps (aux at 0.25 weight)
    loss_fn = ComputeLoss(meta, {"box": 0.05, "obj": 1.0, "cls": 0.5, "anchor_t": 4.0,
                                 "cls_pw": 1.0, "obj_pw": 1.0, "fl_gamma": 0.0, "label_smoothing": 0.0})
    targets = pad_targets([np.array([[1, 0.5, 0.5, 0.2, 0.3]], np.float32)], 8)
    total, comps = loss_fn([jnp.asarray(p) for p in out], jnp.asarray(targets))
    assert np.isfinite(float(total))


def test_clla_detect():
    # nl=3 detection levels from inputs [17(P3 fused w/ 20? no: x0=17,x1=20 fuse), 20, 23]
    cfg = tiny_cfg([[17, 20, 20, 23], 1, "CLLADetect", ["nc", "anchors"]])
    _, meta, _, out = build_forward(cfg)
    assert meta.nl == 3
    # level 0 at x1's (=20, P4/16) resolution, levels 1-2 at 20/23
    assert out[0].shape[1] == 64 // 16
    assert out[1].shape[1] == 64 // 16
    assert out[2].shape[1] == 64 // 32
    dec = decode(out, meta.anchors_px, meta.strides)
    assert dec.shape == (1, expected_rows(meta, 64), 9)


def test_tscode_detect():
    # inputs: finer(17=P3), levels (20=P4, 23=P5) ... TSCODE wants nl+2 maps;
    # with anchors for 1 level: [17, 20, 23] -> detect on 20 (P4)
    anchors1 = [[30, 61, 62, 45, 59, 119]]
    cfg = tiny_cfg([[17, 20, 23], 1, "TSCODE_Detect", ["nc", "anchors"]], anchors=anchors1)
    _, meta, _, out = build_forward(cfg)
    assert meta.nl == 1
    assert int(meta.strides[0]) == 16
    assert out[0].shape == (1, 4, 4, 3, 9)
    dec = decode(out, meta.anchors_px, meta.strides)
    assert np.isfinite(np.asarray(dec)).all()


def test_v11_head():
    cfg = tiny_cfg([[17, 20, 23], 1, "DetectYolov11", ["nc"]])
    _, meta, _, out = build_forward(cfg)
    assert len(out) == 3
    assert out[0].shape[-1] == 64 + 4  # 4*reg_max + nc
    dec = decode_v8(out, meta.strides, nc=4)
    assert dec.shape[-1] == 9
    assert np.isfinite(np.asarray(dec)).all()


def test_postprocess_end2end():
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.random((2, 100, 4 + 4)), jnp.float32)
    out = postprocess_end2end(rows, max_det=10, nc=4)
    assert out.shape == (2, 10, 6)
    scores = np.asarray(out[..., 4])
    assert (np.diff(scores, axis=1) <= 1e-6).all()  # sorted descending
    assert (np.asarray(out[..., 5]) < 4).all()
