"""Model graph compiler + forward tests (spec: reference models/yolo.py).

Uses a tiny width/depth config so CPU compile stays fast."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosomi_tpu.models.heads import decode
from yolosomi_tpu.models.yolo import build_model, init_model, count_params
from yolosomi_tpu.utils.config import find_config, load_model_cfg

TINY_V5 = {
    "nc": 4,
    "depth_multiple": 0.33,
    "width_multiple": 0.125,
    "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119], [116, 90, 156, 198, 373, 326]],
    "backbone": [
        [-1, 1, "Focus", [64, 3]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 3, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 9, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 9, "C3", [512]],
        [-1, 1, "Conv", [1024, 3, 2]],
        [-1, 3, "C3", [1024]],
        [-1, 1, "SPPF", [1024, 5]],
    ],
    "head": [
        [-1, 1, "Conv", [512, 1, 1]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 6], 1, "Concat", [1]],
        [-1, 3, "C3", [512, False]],
        [-1, 1, "Conv", [256, 1, 1]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 3, "C3", [256, False]],
        [-1, 1, "Conv", [256, 3, 2]],
        [[-1, 14], 1, "Concat", [1]],
        [-1, 3, "C3", [512, False]],
        [-1, 1, "Conv", [512, 3, 2]],
        [[-1, 10], 1, "Concat", [1]],
        [-1, 3, "C3", [1024, False]],
        [[17, 20, 23], 1, "Detect", ["nc", "anchors"]],
    ],
}

TINY_SOMI = {
    "nc": 4,
    "depth_multiple": 0.33,
    "width_multiple": 0.125,
    "anchors": 4,
    "backbone": [
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "ODConv_3rd", [128, 3, 2, 4]],
        [-1, 3, "C2fCBAM", [128, True]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 6, "C2fCBAM", [256, True]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 6, "C2fCBAM", [512, True]],
        [-1, 1, "Conv", [1024, 3, 2]],
        [-1, 3, "C2fCBAM", [1024, True]],
        [-1, 1, "SPPF", [1024, 5]],
    ],
    "head": [
        [2, 1, "Conv", [256]],
        [4, 1, "Conv", [256]],
        [6, 1, "Conv", [256]],
        [9, 1, "Conv", [256]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 12], 1, "BiFPN", []],
        [-1, 1, "SEAM", [256, 1, 16]],
        [-1, 3, "C2fEACBAM", [256]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 11], 1, "BiFPN", []],
        [-1, 1, "SEAM", [256, 1, 16]],
        [-1, 3, "C2fEACBAM", [256]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 10], 1, "BiFPN", []],
        [-1, 1, "SEAM", [256, 1, 16]],
        [-1, 3, "C2fEACBAM", [256]],
        [-1, 1, "ODConv_3rd", [256, 3, 2, 4]],
        [[-1, 11, 21], 1, "BiFPN", []],
        [-1, 3, "C2fEACBAM", [256]],
        [-1, 1, "ODConv_3rd", [256, 3, 2, 4]],
        [[-1, 12, 17], 1, "BiFPN", []],
        [-1, 3, "C2fEACBAM", [512]],
        [-1, 1, "ODConv_3rd", [256, 3, 2, 4]],
        [[-1, 13], 1, "BiFPN", []],
        [-1, 3, "C2fEACBAM", [1024]],
        [[25, 28, 31, 34], 1, "DecoupledDetect", ["nc", "anchors"]],
    ],
}


@pytest.fixture(scope="module")
def v5():
    model, meta = build_model(TINY_V5)
    variables = init_model(model, meta, imgsz=64)
    return model, meta, variables


@pytest.fixture(scope="module")
def somi():
    model, meta = build_model(TINY_SOMI)
    variables = init_model(model, meta, imgsz=64)
    return model, meta, variables


def test_parse_v5_strides():
    model, meta = build_model(TINY_V5)
    assert meta.strides == (8.0, 16.0, 32.0)
    assert meta.nl == 3 and meta.na == 3
    assert meta.anchors_px.shape == (3, 3, 2)
    # anchors in grid units scale down by stride
    np.testing.assert_allclose(meta.anchors_grid[0][0], [10 / 8, 13 / 8], atol=1e-6)


def test_parse_somi_strides():
    model, meta = build_model(TINY_SOMI)
    assert meta.strides == (4.0, 8.0, 16.0, 32.0)  # P2-P5
    assert meta.nl == 4 and meta.na == 4


def test_v5_forward_shapes(v5):
    model, meta, variables = v5
    x = jnp.zeros((2, 64, 64, 3))
    out = model.apply(variables, x, train=False)
    assert [tuple(o.shape) for o in out] == [
        (2, 8, 8, 3, 9),
        (2, 4, 4, 3, 9),
        (2, 2, 2, 3, 9),
    ]
    dec = decode(out, meta.anchors_px, meta.strides)
    assert dec.shape == (2, 3 * (64 + 16 + 4), 9)
    assert bool(jnp.isfinite(dec).all())


def test_somi_forward_shapes(somi):
    model, meta, variables = somi
    x = jnp.zeros((1, 64, 64, 3))
    out = model.apply(variables, x, train=False)
    assert [tuple(o.shape) for o in out] == [
        (1, 16, 16, 4, 9),
        (1, 8, 8, 4, 9),
        (1, 4, 4, 4, 9),
        (1, 2, 2, 4, 9),
    ]


def test_bias_init_obj_prior(v5):
    """Detection-prior bias init must push initial objectness low
    (reference: yolo.py:1334-1396)."""
    model, meta, variables = v5
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    dec = decode(out, meta.anchors_px, meta.strides)
    mean_obj = float(jnp.mean(dec[..., 4]))
    assert mean_obj < 0.05  # sigmoid(log(8/(640/8)^2)) ~ 1e-3


def test_decode_grid_alignment(v5):
    """A zero logit decodes to the cell-center formula (2*0.5-0.5+cell)*stride."""
    model, meta, variables = v5
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    zeroed = [jnp.zeros_like(o) for o in out]
    dec = decode(zeroed, meta.anchors_px, meta.strides)
    # level 0: 8x8 grid at stride 8; first cell -> xy = (0.5)*8 = 4
    np.testing.assert_allclose(np.asarray(dec[0, 0, :2]), [4.0, 4.0], atol=1e-5)
    # wh = (2*0.5)^2 * anchor = anchor
    np.testing.assert_allclose(np.asarray(dec[0, 0, 2:4]), meta.anchors_px[0, 0], atol=1e-4)


def test_train_mode_updates_batch_stats(v5):
    model, meta, variables = v5
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_bundled_config_parses():
    cfg = load_model_cfg(find_config("yolo-somi"))
    model, meta = build_model(cfg)
    assert meta.strides == (4.0, 8.0, 16.0, 32.0)
    assert meta.nc == 10 and meta.na == 4


def test_dcn_config_builds_and_forwards():
    """BASELINE config 3: DCN-capable flagship builds and runs (tiny width)."""
    from yolosomi_tpu.utils.config import find_config, load_model_cfg

    cfg = load_model_cfg(find_config("yolo-somi-dcn"))
    cfg["depth_multiple"] = 0.33
    cfg["width_multiple"] = 0.125
    cfg["nc"] = 4
    model, meta = build_model(cfg)
    assert meta.strides == (4.0, 8.0, 16.0, 32.0)
    variables = init_model(model, meta, imgsz=64)
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(out) == 4
    assert all(bool(jnp.isfinite(o).all()) for o in out)


def test_capture_and_inject(v5):
    """Graph hooks for Grad-CAM: capture returns layer output; inject
    replaces it and changes the prediction."""
    model, meta, variables = v5
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    out, feat = model.apply(variables, x, train=False, capture=9)
    assert feat is not None and feat.ndim == 4
    out2 = model.apply(variables, x, train=False, inject={9: feat * 0.0})
    base = model.apply(variables, x, train=False)
    # zeroing the SPPF output must change downstream predictions
    assert not np.allclose(np.asarray(out2[-1]), np.asarray(base[-1]))
    # injecting the captured value reproduces the baseline
    out3 = model.apply(variables, x, train=False, inject={9: feat})
    np.testing.assert_allclose(np.asarray(out3[-1]), np.asarray(base[-1]), atol=1e-6)


def test_v8_anchor_free_head():
    """Anchor-free DFL head: builds, forwards, decodes through NMS."""
    cfg = dict(TINY_V5)
    cfg = {**cfg, "head": [*cfg["head"][:-1], [[17, 20, 23], 1, "DetectV8", ["nc"]]]}
    model, meta = build_model(cfg)
    assert meta.head_type == "DetectV8"
    variables = init_model(model, meta, imgsz=64)
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(out) == 3
    assert out[0].shape[-1] == 4 * 16 + 4  # 4*reg_max + nc

    from yolosomi_tpu.models.heads import decode_v8
    from yolosomi_tpu.ops.nms import non_max_suppression

    dec = decode_v8(out, meta.strides, meta.nc)
    assert dec.shape == (1, 64 + 16 + 4, 5 + 4)
    assert bool(jnp.isfinite(dec).all())
    res = non_max_suppression(dec, 0.001, 0.45, max_det=10, max_nms=64)
    assert res.shape == (1, 10, 6)
