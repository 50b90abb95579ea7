"""Every shipped model YAML builds and shape-checks (VERDICT r1 item 6;
reference catalog: /root/reference/models/hub/*.yaml).

Graph wiring (channel propagation, skip indices, head hookup, stride
calibration) is validated for ALL configs via jax.eval_shape — full
tracing without compute, so the sweep runs in seconds. A representative
subset additionally runs a real forward + decode.
"""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosomi_tpu.models.heads import decode
from yolosomi_tpu.models.yolo import build_model, init_model
from yolosomi_tpu.utils.config import CONFIG_ROOT, load_model_cfg

ALL_CONFIGS = sorted(
    p
    for p in list((CONFIG_ROOT / "models").glob("*.yaml")) + list((CONFIG_ROOT / "models" / "hub").glob("*.yaml"))
    if p.name != "anchors.yaml"  # anchor preset catalog, not a model graph
)

V8_HEADS = ("DetectYOLOv8", "DetectYOLO8Head", "DetectV8", "DetectYolov11", "DetectV11")


def _tiny(cfg):
    cfg = dict(cfg)
    cfg["nc"] = 4
    cfg["depth_multiple"] = min(cfg.get("depth_multiple", 1.0), 0.33)
    cfg["width_multiple"] = min(cfg.get("width_multiple", 1.0), 0.125)
    return cfg


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: p.stem)
def test_config_builds_and_shapechecks(path: Path):
    cfg = _tiny(load_model_cfg(path))
    model, meta = build_model(cfg)
    if meta.nl == 0:
        # headless config (classifier.yaml): (B, nc) logits, no levels
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.eval_shape(lambda r: model.init(r, x, train=False), jax.random.PRNGKey(0))
        out = jax.eval_shape(lambda v: model.apply(v, x, train=False), variables)
        assert out.shape[0] == 1 and out.ndim == 2
        return
    max_stride = int(max(meta.strides))
    imgsz = max(64, 2 * max_stride)
    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    variables = jax.eval_shape(lambda r: model.init(r, x, train=False), jax.random.PRNGKey(0))
    out = jax.eval_shape(lambda v: model.apply(v, x, train=False), variables)
    assert len(out) == meta.nl
    for i, p in enumerate(out):
        s = int(meta.strides[i])
        if meta.head_type in V8_HEADS:
            assert p.shape == (1, imgsz // s, imgsz // s, 64 + meta.nc)
        else:
            assert p.shape == (1, imgsz // s, imgsz // s, meta.na, meta.nc + 5)


@pytest.mark.parametrize("name", ["yolov3-tiny", "yolov10", "yolov5s6"])
def test_representative_configs_forward(name):
    path = CONFIG_ROOT / "models" / "hub" / f"{name}.yaml"
    cfg = _tiny(load_model_cfg(path))
    model, meta = build_model(cfg)
    imgsz = max(64, 2 * int(max(meta.strides)))
    variables = init_model(model, meta, imgsz=imgsz)
    out = model.apply(variables, jnp.zeros((1, imgsz, imgsz, 3), jnp.float32), train=False)
    assert len(out) == meta.nl
    if meta.head_type not in V8_HEADS:
        dec = decode(out, meta.anchors_px, meta.strides)
        rows = sum(int(meta.na * (imgsz / s) ** 2) for s in meta.strides)
        assert dec.shape == (1, rows, meta.nc + 5)
        assert np.isfinite(np.asarray(dec)).all()


def test_anchor_presets_resolve():
    """`anchors: <preset-name>` in a model YAML resolves from the
    hub/anchors.yaml catalog (reference ships the same catalog as
    documentation, models/hub/anchors.yaml; here it is addressable)."""
    from yolosomi_tpu.models.yolo import _anchor_preset, _resolve_anchors

    a = _resolve_anchors("anchors_p6_1280", 4)
    assert a.shape == (4, 3, 2)
    assert a[0, 0].tolist() == [19.0, 27.0]
    with pytest.raises(ValueError):
        _resolve_anchors("anchors_p6_1280", 3)  # level-count mismatch
    with pytest.raises(KeyError):
        _anchor_preset("anchors_p9_640")

    # a P6 hub graph built with a named preset gets those exact pixels
    cfg = _tiny(load_model_cfg(CONFIG_ROOT / "models" / "hub" / "yolov5s6.yaml"))
    cfg["anchors"] = "anchors_p6_1280"
    _, meta = build_model(cfg)
    assert meta.anchors_px.shape == (4, 3, 2)
    assert meta.anchors_px[3, 2].tolist() == [925.0, 792.0]
