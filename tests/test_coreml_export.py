"""CoreML export: artifact structure + EXECUTED semantics.

The reference's CoreML leg (export.py:130-161) converts a TorchScript
trace with coremltools and writes model.mlmodel without executing it.
Ours writes the NeuralNetwork protobuf wire format directly
(utils/coreml_export.py) and goes one step further than the reference's
claim: an independent executor parses the raw artifact bytes back and
runs them, asserting the encoded graph reproduces the torch mirror's raw
head maps (the mirror itself is pinned to the flax model by
tests/test_onnx_export.py). On-device CoreML runtime execution has no
counterpart on this image — the documented claim boundary, same as tfjs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_torch_parity import _randomized_state_dict  # noqa: E402
from yolosomi_tpu.models.yolo import build_model, init_model  # noqa: E402
from yolosomi_tpu.utils.coreml_export import (  # noqa: E402
    CoreMLExecutor,
    coreml_summary,
    export_coreml,
)
from yolosomi_tpu.utils.torch_convert import convert_state_dict  # noqa: E402
from yolosomi_tpu.utils.torch_mirror import build_torch_mirror  # noqa: E402

ANCHORS2 = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]]
NC = 4

# mini-PAN covering every block the CoreML lowering emits: Focus quad
# slices, strided Convs, C3 (+shortcut), SPPF SAME-pools, Upsample,
# Concat, BiFPN scale+add fusion, 2-level coupled Detect
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
        [4, 1, "Conv", [32, 1, 1]],
        [[8, 9], 1, "BiFPN", []],
        [-1, 1, "C3", [32, False]],
        [[11, 7], 1, "Detect", ["nc", "anchors"]],
    ],
}
IMGSZ = 64


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    model, meta = build_model(CFG)
    variables = init_model(model, meta, imgsz=IMGSZ)
    tmodel = build_torch_mirror(CFG, meta, imgsz=IMGSZ, decode=False)
    sd = _randomized_state_dict(tmodel)
    variables = convert_state_dict(sd, variables, strict=False)
    path = tmp_path_factory.mktemp("coreml") / "model.mlmodel"
    tmodel, missing = export_coreml(CFG, meta, variables, str(path), imgsz=IMGSZ)
    assert not missing, missing
    return tmodel, str(path)


def test_coreml_artifact_structure(exported):
    tmodel, path = exported
    s = coreml_summary(path)
    assert s["spec_version"] == 4
    assert s["inputs"] == ["images"]
    assert s["outputs"] == ["p3", "p4"]
    # every family present: convs + silu(sigmoid/multiply), Focus slices,
    # SPPF pools, upsample, concats, BiFPN scales/adds (+C3 shortcut adds)
    for op in ("convolution", "activation", "multiply", "pooling",
               "upsample", "concat", "slice", "scale", "add"):
        assert s["ops"].get(op, 0) > 0, (op, s["ops"])


def test_coreml_executor_matches_mirror(exported):
    """Parse the raw .mlmodel bytes and execute them: the encoded graph
    must reproduce the torch mirror's raw per-level head maps (BN folded
    at export vs live BN in the mirror -> small float tolerance)."""
    tmodel, path = exported
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, IMGSZ, IMGSZ)).astype(np.float32)

    outs = CoreMLExecutor(path)(x)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x))  # list of (b, na, ny, nx, no)

    assert len(ref) == 2
    for li, (name, r) in enumerate(zip(("p3", "p4"), ref)):
        got = outs[name]
        b, na, ny, nx, no = r.shape
        assert got.shape == (b, na * no, ny, nx)
        got = got.reshape(b, na, no, ny, nx).transpose(0, 1, 3, 4, 2)
        np.testing.assert_allclose(got, r.numpy(), atol=2e-4, rtol=1e-3,
                                   err_msg=f"level {li}")


def test_coreml_unsupported_graph_raises():
    cfg = {
        "nc": 2,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "SEAM", [64]],
        ],
        "head": [[[-1], 1, "Detect", ["nc", "anchors"]]],
    }
    model, meta = build_model(cfg)
    variables = init_model(model, meta, imgsz=32)
    with pytest.raises(NotImplementedError):
        export_coreml(cfg, meta, variables, "/tmp/never.mlmodel", imgsz=32)
