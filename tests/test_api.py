"""User API tests: Runner, AutoShape, Detections, class filtering."""

import numpy as np
import pytest
import jax.numpy as jnp

from yolosomi_tpu.api import AutoShape, Detections
from yolosomi_tpu.engine.runner import Runner

TINY_CFG = "/tmp/api-tiny.yaml"


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    import yaml

    cfg = {
        "nc": 3,
        "depth_multiple": 0.33,
        "width_multiple": 0.125,
        "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119], [116, 90, 156, 198, 373, 326]],
        "backbone": [
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "C3", [64]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "C3", [128]],
            [-1, 1, "Conv", [256, 3, 2]],
            [-1, 1, "C3", [256]],
            [-1, 1, "Conv", [512, 3, 2]],
            [-1, 1, "SPPF", [512, 5]],
        ],
        "head": [[[4, 6, 8], 1, "Detect", ["nc", "anchors"]]],
    }
    p = tmp_path_factory.mktemp("cfg") / "tiny.yaml"
    yaml.safe_dump(cfg, open(p, "w"))
    return Runner(str(p), None, imgsz=128)


def test_runner_uint8_call(runner):
    img = np.zeros((2, 128, 128, 3), np.uint8)
    out = runner(img, conf_thres=0.001)
    assert out.shape == (2, 300, 6)


def test_class_mask_filters(runner):
    rng = np.random.default_rng(0)
    x = rng.random((1, 128, 128, 3)).astype(np.float32)
    mask = np.zeros(3, bool)
    mask[1] = True
    fn = runner.infer_fn(conf_thres=0.0001, iou_thres=0.45, class_mask=mask)
    out = np.asarray(fn(runner.variables, jnp.asarray(x)))[0]
    valid = out[out[:, 4] > 0]
    if len(valid):
        assert set(valid[:, 5].astype(int)) <= {1}


def test_autoshape_numpy_input(runner):
    model = AutoShape(runner, imgsz=128, conf=0.0001)
    rng = np.random.default_rng(1)
    ims = [rng.integers(0, 255, (200, 300, 3), np.uint8), rng.integers(0, 255, (100, 100, 3), np.uint8)]
    results = model(ims)
    assert isinstance(results, Detections)
    assert len(results) == 2
    r = repr(results)
    assert "image 1/2" in r
    dfs = results.pandas()
    assert len(dfs) == 2
    assert list(dfs[0].columns) == ["xmin", "ymin", "xmax", "ymax", "confidence", "class", "name"]
    # detections stay inside native frames
    for df, im in zip(dfs, ims):
        if len(df):
            assert (df["xmax"] <= im.shape[1] + 1).all()
            assert (df["ymax"] <= im.shape[0] + 1).all()


def test_apply_classifier_filters_mismatches():
    """Second-stage classifier keeps only class-agreeing detections
    (reference: utils/general.py:769 apply_classifier)."""
    import numpy as np
    from yolosomi_tpu.utils.classifier import apply_classifier

    im0 = np.random.default_rng(0).integers(0, 255, (100, 120, 3), np.uint8)
    dets = np.array(
        [[10, 10, 40, 40, 0.9, 0], [50, 50, 90, 90, 0.8, 1], [20, 60, 60, 95, 0.7, 2]],
        np.float32,
    )

    def classify_fn(batch):
        # mock: always predicts class 1
        n = batch.shape[0]
        out = np.zeros((n, 3), np.float32)
        out[:, 1] = 1.0
        return out

    kept = apply_classifier(dets, classify_fn, im0)
    assert len(kept) == 1 and kept[0, 5] == 1
