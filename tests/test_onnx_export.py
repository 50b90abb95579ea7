"""ONNX export chain: inverse weight converter, torch mirror graph
parity, and structural validation of the serialized artifact.

The trust chain mirrors the reference's (export.py:64-130 exports its
native torch modules): here the torch mirror is numerically pinned to
the flax model (decode included), and the .onnx file is torch's own
serialization of that mirror, structurally verified by a wire-format
walk (no onnx/onnxruntime on this image — see utils/onnx_export.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_torch_parity import _randomized_state_dict  # noqa: E402
from yolosomi_tpu.models.heads import decode  # noqa: E402
from yolosomi_tpu.models.yolo import build_model, init_model  # noqa: E402
from yolosomi_tpu.utils.config import find_config, load_model_cfg  # noqa: E402
from yolosomi_tpu.utils.onnx_export import (  # noqa: E402
    export_onnx,
    export_torchscript,
    onnx_summary,
    state_dict_from_variables,
)
from yolosomi_tpu.utils.torch_convert import convert_state_dict  # noqa: E402
from yolosomi_tpu.utils.torch_mirror import build_torch_mirror  # noqa: E402

ANCHORS2 = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]]
NC = 4

# mini-PAN exercising every yolov5-family block the mirror supports:
# Focus stem, strided Convs, C3 (+shortcut=False head variant), SPPF,
# Upsample, Concat, 2-level Detect
CFG = {
    "nc": NC,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": ANCHORS2,
    "backbone": [
        [-1, 1, "Focus", [8, 3]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "C3", [16]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C3", [32]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "SPPF", [64, 5]],
    ],
    "head": [
        [-1, 1, "Conv", [32, 1, 1]],
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 1, "C3", [32, False]],
        [[10, 7], 1, "Detect", ["nc", "anchors"]],
    ],
}
IMGSZ = 64


@pytest.fixture(scope="module")
def pair():
    model, meta = build_model(CFG)
    variables = init_model(model, meta, imgsz=IMGSZ)
    # pull randomized values (incl. nontrivial BN stats) through the
    # forward converter so both frameworks hold identical weights
    tmodel = build_torch_mirror(CFG, meta, imgsz=IMGSZ, decode=True)
    sd = _randomized_state_dict(tmodel)
    variables = convert_state_dict(sd, variables, strict=False)
    return model, meta, variables, tmodel, sd


def test_inverse_converter_roundtrip(pair):
    """ours -> torch must reproduce the exact state_dict that produced
    ours (the two converters are inverse walks of the same key map)."""
    model, meta, variables, tmodel, sd = pair
    out, missing = state_dict_from_variables(variables, tmodel)
    assert not missing, missing
    for k, v in sd.items():
        base = k.rsplit(".", 1)[-1]
        if base == "num_batches_tracked" or base == "anchors" or base.startswith(("grid", "anchor")):
            continue
        np.testing.assert_allclose(
            out[k].numpy(), np.asarray(v, np.float32), atol=1e-6, err_msg=k
        )


def test_mirror_decoded_parity(pair):
    """Torch mirror (decode baked in) vs flax forward+decode — the
    numerics the ONNX artifact will carry."""
    model, meta, variables, tmodel, sd = pair
    out_sd, _ = state_dict_from_variables(variables, tmodel)
    tmodel.load_state_dict(out_sd)
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, IMGSZ, IMGSZ, 3)).astype(np.float32)
    with torch.no_grad():
        t_dec = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = model.apply(variables, jnp.asarray(x), False)
    j_dec = np.asarray(decode(j_out, meta.anchors_px, meta.strides))
    assert t_dec.shape == j_dec.shape
    np.testing.assert_allclose(t_dec[..., :4], j_dec[..., :4], atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(t_dec[..., 4:], j_dec[..., 4:], atol=2e-4)


def test_export_onnx_artifact(pair, tmp_path):
    model, meta, variables, tmodel, sd = pair
    path = tmp_path / "mini.onnx"
    export_onnx(CFG, meta, variables, str(path), imgsz=IMGSZ, batch=1, opset=12)
    assert path.exists() and path.stat().st_size > 10_000
    s = onnx_summary(str(path))
    assert s["opset"] >= 12
    assert s["inputs"] == ["images"] and s["outputs"] == ["output"]
    for op in ("Conv", "Sigmoid", "Mul", "Concat", "MaxPool", "Resize"):
        assert op in s["ops"], (op, s["ops"])
    # every conv kernel travels as an initializer (BN folded into the
    # graph as separate ops by the torchscript exporter, not pre-fused)
    assert s["n_initializers"] >= 20
    assert s["n_nodes"] > 50


def test_export_yolov5s_full_graph(tmp_path):
    """The real yolov5s hub config exports end-to-end (structural)."""
    cfg = load_model_cfg(find_config("yolov5s"))
    model, meta = build_model(cfg, nc=80)
    variables = init_model(model, meta, imgsz=IMGSZ)
    path = tmp_path / "v5s.onnx"
    export_onnx(cfg, meta, variables, str(path), imgsz=128, batch=1, opset=12)
    s = onnx_summary(str(path))
    assert s["ops"].get("Conv", 0) >= 60  # 60 convs in yolov5s
    assert s["outputs"] == ["output"]


def test_torchscript_roundtrip_executes(pair, tmp_path):
    """TorchScript artifact loads back and reproduces the flax model's
    decoded boxes — the fully-executable leg of the export matrix
    (reference export.py:50-63)."""
    model, meta, variables, tmodel, sd = pair
    path = tmp_path / "mini.torchscript"
    export_torchscript(CFG, meta, variables, str(path), imgsz=IMGSZ, batch=2)
    loaded = torch.jit.load(str(path))
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, IMGSZ, IMGSZ, 3)).astype(np.float32)
    with torch.no_grad():
        t_dec = loaded(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = model.apply(variables, jnp.asarray(x), False)
    j_dec = np.asarray(decode(j_out, meta.anchors_px, meta.strides))
    np.testing.assert_allclose(t_dec[..., :4], j_dec[..., :4], atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(t_dec[..., 4:], j_dec[..., 4:], atol=2e-4)


def test_flagship_somi_decoded_parity_and_export(tmp_path):
    """The SOMI flagship graph (ODConv, C2fCBAM, BiFPN, SEAM, C2fEMACBAM,
    DecoupledDetect) exports with decoded parity against the flax model.
    Reduced width/depth to keep the CPU compile fast — same classes, same
    key mapping."""
    cfg = dict(load_model_cfg(find_config("yolo-somi")))
    cfg["width_multiple"], cfg["depth_multiple"] = 0.25, 0.33
    model, meta = build_model(cfg, nc=3)
    variables = init_model(model, meta, imgsz=64)
    tmodel = build_torch_mirror(cfg, meta, imgsz=64, decode=True)
    sd = _randomized_state_dict(tmodel)
    variables = convert_state_dict(sd, variables, strict=True)
    out_sd, missing = state_dict_from_variables(variables, tmodel)
    assert not missing, missing
    tmodel.load_state_dict(out_sd)
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_dec = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = model.apply(variables, jnp.asarray(x), False)
    j_dec = np.asarray(decode(j_out, meta.anchors_px, meta.strides))
    assert t_dec.shape == j_dec.shape
    np.testing.assert_allclose(t_dec[..., :4], j_dec[..., :4], atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(t_dec[..., 4:], j_dec[..., 4:], atol=5e-4)

    path = tmp_path / "somi.onnx"
    export_onnx(cfg, meta, variables, str(path), imgsz=64, batch=1, opset=12)
    s = onnx_summary(str(path))
    assert s["outputs"] == ["output"]
    assert "Softmax" in s["ops"]  # ODConv kernel attention
    assert "Exp" in s["ops"]  # SEAM exp-of-sigmoid gate


def test_unsupported_graph_raises():
    """Graphs outside the mirror registry fail with a clear error, not a
    silent wrong artifact."""
    cfg = {
        "nc": 2,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": ANCHORS2,
        "backbone": [
            [-1, 1, "Conv", [8, 3, 2]],
            [-1, 1, "GhostConv", [16, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
        ],
        "head": [[[1, 2], 1, "Detect", ["nc", "anchors"]]],
    }
    model, meta = build_model(cfg)
    with pytest.raises(NotImplementedError, match="GhostConv"):
        build_torch_mirror(cfg, meta, imgsz=64)
