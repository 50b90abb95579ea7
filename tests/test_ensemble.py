"""Ensemble inference tests (reference: experimental.py:74-122
attempt_load + Ensemble anchor-dim concat).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from yolosomi_tpu.engine.checkpoint import save_variables
from yolosomi_tpu.engine.runner import EnsembleRunner, Runner, attempt_load
from yolosomi_tpu.models.yolo import build_model, init_model

TINY = {
    "nc": 3,
    "depth_multiple": 0.33,
    "width_multiple": 0.125,
    "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119], [116, 90, 156, 198, 373, 326]],
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 1, "C3", [512]],
        [-1, 1, "SPPF", [512, 5]],
    ],
    "head": [
        [-1, 1, "Conv", [256, 1, 1]],
        [[4, 6, 8], 1, "Detect", ["nc", "anchors"]],
    ],
}


@pytest.fixture(scope="module")
def two_ckpts(tmp_path_factory):
    import yaml

    d = tmp_path_factory.mktemp("ens")
    cfg_path = d / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY))
    model, meta = build_model(TINY)
    paths = []
    for seed in (0, 1):
        import jax

        variables = init_model(model, meta, rng=jax.random.PRNGKey(seed), imgsz=64)
        p = d / f"w{seed}.msgpack"
        save_variables(str(p), variables)
        paths.append(str(p))
    return str(cfg_path), paths


def test_attempt_load_dispatch(two_ckpts):
    cfg, paths = two_ckpts
    assert isinstance(attempt_load(paths[0], cfg), Runner)
    assert isinstance(attempt_load(paths, cfg), EnsembleRunner)


def test_ensemble_inference_shape(two_ckpts):
    cfg, paths = two_ckpts
    ens = EnsembleRunner(cfg, paths, imgsz=64)
    x = np.zeros((1, 64, 64, 3), np.uint8)
    out = ens(x, conf_thres=0.001, max_det=20)
    assert out.shape == (1, 20, 6)


def test_ensemble_of_identical_models_matches_single(two_ckpts):
    cfg, paths = two_ckpts
    rng = np.random.default_rng(0)
    x = (rng.random((1, 64, 64, 3)) * 255).astype(np.uint8)
    single = Runner(cfg, paths[0], imgsz=64)
    ens = EnsembleRunner(cfg, [paths[0], paths[0]], imgsz=64)
    o1 = single(x, conf_thres=0.1, max_det=10)
    o2 = ens(x, conf_thres=0.1, max_det=10)
    # duplicated rows suppress to the same keep-set as the single model
    np.testing.assert_allclose(o1[..., :4], o2[..., :4], atol=1e-3)
