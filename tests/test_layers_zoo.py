"""Tier-3 zoo tests (spec: reference models/common.py families reachable
from parse_model, yolo.py:1472-1650)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolosomi_tpu.models import layers_zoo as Z


def _run(mod, x, train=False):
    variables = mod.init(jax.random.PRNGKey(0), x, train)
    out = mod.apply(variables, x, train, mutable=["batch_stats"] if train else False)
    return out[0] if isinstance(out, tuple) else out


SINGLE_INPUT = [
    ("SimConv", (16, 3, 2), (1, 8, 8, 16)),
    ("CoordConv", (16,), (1, 16, 16, 16)),
    ("CoordConvd", (16,), (1, 16, 16, 16)),
    ("ADown", (16,), (1, 8, 8, 16)),
    ("DownSimper", (16,), (1, 8, 8, 16)),
    ("ASPP", (16,), (1, 16, 16, 16)),
    ("SPPELAN", (16, 8), (1, 16, 16, 16)),
    ("SPPCSPCS", (16,), (1, 16, 16, 16)),
    ("SPPF_improve", (16,), (1, 16, 16, 16)),
    ("BasicRFB", (16,), (1, 16, 16, 16)),
    ("BasicRFB_a", (16,), (1, 16, 16, 16)),
    ("RepVGGBlock", (16,), (1, 16, 16, 16)),
    ("CNeB", (16,), (1, 16, 16, 16)),
    ("Conv2Former", (16,), (1, 16, 16, 16)),
    ("C3CR", (16,), (1, 16, 16, 16)),
    ("ConvMix", (), (1, 16, 16, 16)),
    ("CSPCM", (16,), (1, 16, 16, 16)),
    ("Conv_SWS", (16, 4), (1, 16, 16, 16)),
    ("SimAMWithSlicing", (), (1, 16, 16, 16)),
    ("C3CBAM", (), (1, 16, 16, 16)),
    ("CPCA", (), (1, 16, 16, 16)),
    ("ContextAggregation", (), (1, 16, 16, 16)),
    ("PSContextAggregation", (), (1, 16, 16, 16)),
    ("ChannelAttentionHSFPN", (), (1, 16, 16, 16)),
    ("CAM", (), (1, 16, 16, 16)),
    ("ACmix", (16,), (1, 16, 16, 16)),
    ("C3_CBAM", (16,), (1, 16, 16, 16)),
    ("C3_CBAMS", (16,), (1, 16, 16, 16)),
    ("C3_CBAM_DWC", (16,), (1, 16, 16, 16)),
    ("C3_CBAMS_DWC", (16,), (1, 16, 16, 16)),
    ("C3CPCA", (16,), (1, 16, 16, 16)),
    ("C3GAM", (16,), (1, 16, 16, 16)),
    ("C3_SCBAM", (16,), (1, 16, 16, 16)),
    ("C3_BAM", (16,), (1, 16, 16, 16)),
    ("C3_CA", (16,), (1, 16, 16, 16)),
    ("C2fBAM", (16,), (1, 16, 16, 16)),
    ("C2f_DWR", (16,), (1, 16, 16, 16)),
    ("VoVGSCSPCBAM", (16,), (1, 16, 16, 16)),
    ("ConvTransposeLayer", (16,), (1, 32, 32, 16)),
    ("DWConvTranspose2d", (16, 2, 2), (1, 32, 32, 16)),
    ("BatchNorm2d", (), (1, 16, 16, 16)),
]


@pytest.mark.parametrize("name,args,expect", SINGLE_INPUT, ids=[t[0] for t in SINGLE_INPUT])
def test_single_input_shapes(name, args, expect):
    mod = getattr(Z, name)(*args)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 16, 16)), jnp.float32)
    y = _run(mod, x)
    assert y.shape == expect, (name, y.shape)
    assert bool(jnp.isfinite(y).all()), name


def test_multi_input_modules():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    np.testing.assert_allclose(np.asarray(_run(Z.Add(), [a, b])), np.asarray(a + b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(_run(Z.Multiply(), [a, b])), np.asarray(a * b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(_run(Z.CShortcut(), [a, b])), np.asarray(a + b), rtol=1e-6)

    p3 = jnp.asarray(rng.standard_normal((1, 16, 16, 16)), jnp.float32)
    p4 = jnp.asarray(rng.standard_normal((1, 8, 8, 24)), jnp.float32)
    p5 = jnp.asarray(rng.standard_normal((1, 4, 4, 32)), jnp.float32)
    y = _run(Z.SDI(16), [p3, p4, p5])
    assert y.shape == (1, 16, 16, 16)
    y = _run(Z.BiFPNSDI(24, length=3), [p3, p4, p5])
    assert y.shape == (1, 4, 4, 24)  # fused at the smallest resolution
    y = _run(Z.BiFPNs(16, length=2), [a, b])
    assert y.shape == (1, 8, 8, 16)
    y = _run(Z.BiFusion(16), [p5, p4, p3])  # up(x0), x1, down(x2)
    assert y.shape == (1, 8, 8, 16)
    y = _run(Z.SF(), [p4, p3, jnp.asarray(rng.standard_normal((1, 32, 32, 8)), jnp.float32)])
    assert y.shape == (1, 16, 16, 24 + 16 + 8)
    p4c = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    y = _run(Z.ScalSeq(16), [p3, p4c, p5])
    assert y.shape == (1, 16, 16, 16)
    y = _run(Z.AttentionModel(), [a, b])
    assert y.shape == (1, 8, 8, 16)


def test_bilinear_align_corners_torch_parity():
    """resize helper == F.interpolate(mode='bilinear', align_corners=True)
    (the SDI/BiFPNSDI resize path, reference common.py:8672)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    for out_hw in ((10, 14), (9, 13), (5, 7)):
        ours = np.asarray(Z.bilinear_align_corners(jnp.asarray(x), out_hw))
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_adaptive_avg_pool_torch_parity():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 16, 8, 3)).astype(np.float32)
    for out_hw in ((8, 4), (4, 2), (16, 8)):
        ours = np.asarray(Z.adaptive_avg_pool(jnp.asarray(x), out_hw))
        ref = F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), out_hw)
        np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_simam_slicing_gates():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    y = _run(Z.SimAMWithSlicing(), x)
    assert float(jnp.abs(y).max()) <= float(jnp.abs(x).max()) + 1e-6


def test_simam_flexible_slicing_no_overlap_matches_tiles():
    """With overlap 0 and tile-divisible input, flexible slicing == SimAM
    applied independently per tile (coverage divisor 1 everywhere)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    y = _run(Z.SimAMWithFlexibleSlicing(target_size=4), x)
    enh = Z.SimAMWithSlicing()._enhance
    ref = jnp.zeros_like(x)
    for i in (0, 4):
        for j in (0, 4):
            ref = ref.at[:, i : i + 4, j : j + 4].set(enh(x[:, i : i + 4, j : j + 4]))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)


def test_zoo_yaml_graph_builds():
    """A config exercising the tier-3 registry kinds end-to-end."""
    from yolosomi_tpu.models.yolo import build_model, init_model

    cfg = {
        "nc": 3, "depth_multiple": 1.0, "width_multiple": 1.0, "anchors": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "ADown", [32]],
            [-1, 1, "C3_CBAM", [32]],
            [-1, 1, "DownSimper", [64]],
            [-1, 1, "CNeB", [64]],
            [-1, 1, "SimConv", [64, 3, 2]],
            [-1, 1, "SPPELAN", [64, 32]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "SPPF_improve", [128]],
        ],
        "head": [
            [-1, 1, "ConvTranspose", [64, 2, 2]],
            [[-1, 6], 1, "Add", []],
            [-1, 1, "C2f_DWR", [64]],
            [[4, 6, 8], 1, "SDI", []],
            [[12, 11, 8], 1, "ScalSeq", [64]],
            [[13, 11, 8], 1, "Detect", ["nc", "anchors"]],
        ],
    }
    model, meta = build_model(cfg, nc=3)
    assert meta.strides == (8.0, 16.0, 32.0)
    variables = init_model(model, meta, imgsz=64)
    y = model.apply(variables, jnp.zeros((1, 64, 64, 3)), False)
    assert [o.shape for o in y] == [(1, 8, 8, 3, 8), (1, 4, 4, 3, 8), (1, 2, 2, 3, 8)]


def test_zoo_yaml_graph_builds_2():
    """Second config: CAM concat fusion, BiFusion, Multiply, CPCA, raw
    ConvTranspose2d/BatchNorm2d rows, RepVGG/RFB blocks."""
    from yolosomi_tpu.models.yolo import build_model, init_model

    cfg = {
        "nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0, "anchors": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],            # 0 P1
            [-1, 1, "RepVGGBlock", [32, 3, 2]],     # 1 P2
            [-1, 1, "CPCA", []],                    # 2
            [-1, 1, "Conv", [64, 3, 2]],            # 3 P3
            [-1, 1, "BasicRFB", [64]],              # 4
            [-1, 1, "Conv", [64, 3, 2]],            # 5 P4
            [-1, 1, "CAM", ["concat"]],             # 6 -> 192ch
            [-1, 1, "nn.BatchNorm2d", []],          # 7
            [-1, 1, "Conv", [128, 3, 2]],           # 8 P5
        ],
        "head": [
            [-1, 1, "nn.ConvTranspose2d", [64, 2, 2]],  # 9 -> P4-res
            [[8, 7, 4], 1, "BiFusion", [0, 0, 0, 64]],  # 10 at P4
            [[-1, 9], 1, "Multiply", []],               # 11
            [[11, 8], 1, "attention_model", [64]],      # 12? strides differ -> use same-stride pair
        ],
    }
    # attention_model needs same-resolution inputs; detect on 11 + 8 + 4
    cfg["head"][-1] = [[4, 11, 8], 1, "Detect", ["nc", "anchors"]]
    model, meta = build_model(cfg, nc=2)
    assert meta.strides == (8.0, 16.0, 32.0)
    variables = init_model(model, meta, imgsz=64)
    y = model.apply(variables, jnp.zeros((1, 64, 64, 3)), False)
    assert [o.shape for o in y] == [(1, 8, 8, 3, 7), (1, 4, 4, 3, 7), (1, 2, 2, 3, 7)]


def test_segment_head_graph():
    """Segment head (v5-seg): raw level maps carry nc+5+nm channels, plus
    a 2x-upsampled proto map; assemble_masks crops to boxes."""
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.models.heads import assemble_masks

    cfg = {
        "nc": 4, "depth_multiple": 1.0, "width_multiple": 1.0, "anchors": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],   # 2 P3
            [-1, 1, "Conv", [64, 3, 2]],   # 3 P4
            [-1, 1, "Conv", [64, 3, 2]],   # 4 P5
        ],
        "head": [[[2, 3, 4], 1, "Segment", ["nc", "anchors", 8, 64]]],
    }
    model, meta = build_model(cfg, nc=4)
    variables = init_model(model, meta, imgsz=64)
    levels, proto = model.apply(variables, jnp.zeros((1, 64, 64, 3)), False)
    assert [o.shape for o in levels] == [
        (1, 8, 8, 3, 4 + 5 + 8), (1, 4, 4, 3, 17), (1, 2, 2, 3, 17)]
    assert proto.shape == (1, 16, 16, 8)  # 2x the P3 map

    coeffs = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)), jnp.float32)
    boxes = jnp.asarray([[2, 2, 10, 10], [0, 0, 16, 16]], jnp.float32)
    m = assemble_masks(proto[0], coeffs, boxes)
    assert m.shape == (2, 16, 16)
    assert float(m[0, 0, 0]) == 0.0  # outside box 0 zeroed
    assert float(m[0, 5, 5]) > 0.0


def test_rtdetr_decoder_graph():
    """RT-DETR NMS-free query decoder over a small FPN (reference:
    common.py:7514; inference surface — the reference itself ships no
    RT-DETR loss/trainer, importing the stack from ultralytics)."""
    from yolosomi_tpu.models.yolo import build_model, init_model

    cfg = {
        "nc": 5, "depth_multiple": 1.0, "width_multiple": 1.0, "anchors": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],   # 2 P3
            [-1, 1, "Conv", [64, 3, 2]],   # 3 P4
            [-1, 1, "Conv", [64, 3, 2]],   # 4 P5
        ],
        "head": [[[2, 3, 4], 1, "RTDETRDecoder", ["nc", 64, 20]]],
    }
    model, meta = build_model(cfg, nc=5)
    variables = init_model(model, meta, imgsz=64)
    y = model.apply(variables, jnp.zeros((1, 64, 64, 3)), False)
    assert y.shape == (1, 20, 4 + 5)
    out = np.asarray(y)
    assert (out[..., :4] >= 0).all() and (out[..., :4] <= 1).all()  # cxcywh in [0,1]
    assert (out[..., 4:] >= 0).all() and (out[..., 4:] <= 1).all()  # sigmoid scores


def test_activation_zoo():
    """Activation zoo (reference: utils/activations.py): parameter-free
    fns + learnable FReLU/AconC/MetaAconC."""
    from yolosomi_tpu.models import activations as A

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    # mish(x) ~ x for large x, ~0 for very negative x
    m = A.mish(x)
    assert m.shape == x.shape
    assert float(A.mish(jnp.asarray(10.0))) == pytest.approx(10.0, abs=1e-3)
    assert abs(float(A.mish(jnp.asarray(-10.0)))) < 1e-3
    assert float(A.hardswish(jnp.asarray(3.0))) == pytest.approx(3.0)
    assert float(A.hardswish(jnp.asarray(-3.0))) == pytest.approx(0.0)
    for mod in (A.FReLU(), A.AconC(), A.MetaAconC()):
        y = _run(mod, x)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())
    # FReLU lower-bounds by x where the conv branch is smaller
    y = _run(A.FReLU(), x)
    assert bool((y >= x - 1e-6).all())


def test_stride_tracking_nonstandard_signatures():
    """meta.strides must be correct for conv-kind modules whose stride arg
    is not at position 2 (BasicRFB: pos 1; ACmix: pos 4) or absent
    (SPPELAN c3 arg, TransformerBlock heads arg)."""
    from yolosomi_tpu.models.yolo import build_model

    cfg = {
        "nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0, "anchors": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],        # stride 2
            [-1, 1, "BasicRFB", [16, 2]],        # stride arg pos 1 -> 4
            [-1, 1, "ACmix", [16, 7, 4]],        # head=4 is NOT a stride
            [-1, 1, "SPPELAN", [16, 8]],         # c3=8 is NOT a stride
            [-1, 1, "Conv", [32, 3, 2]],         # 8
            [-1, 1, "Conv", [32, 3, 2]],         # 16
        ],
        "head": [[[3, 4, 5], 1, "Detect", ["nc", "anchors"]]],
    }
    model, meta = build_model(cfg, nc=2)
    assert meta.strides == (4.0, 8.0, 16.0), meta.strides


def test_headless_classifier_config():
    """A Classify-tail YAML builds headless (nl=0, nc unscaled) and
    returns (B, nc) logits — the detect --classify path."""
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.utils.config import find_config, load_model_cfg

    cfg = load_model_cfg(find_config("classifier"))
    model, meta = build_model(cfg)
    assert meta.nl == 0 and meta.nc == 2
    variables = init_model(model, meta, imgsz=64)
    y = model.apply(variables, jnp.zeros((3, 64, 64, 3)), False)
    assert y.shape == (3, 2)


def test_segment_runner_inference():
    """Runner.infer_fn must decode a Segment head: boxes flow through NMS
    with the mask-coefficient tail dropped."""
    import yaml as _yaml

    from yolosomi_tpu.engine.runner import Runner

    cfg = {
        "nc": 3, "depth_multiple": 1.0, "width_multiple": 1.0, "anchors": 3,
        "backbone": [
            [-1, 1, "Conv", [8, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "Segment", ["nc", "anchors", 8, 32]]],
    }
    import tempfile, pathlib
    d = pathlib.Path(tempfile.mkdtemp())
    (d / "seg.yaml").write_text(_yaml.safe_dump(cfg))
    r = Runner(str(d / "seg.yaml"), imgsz=64)
    out = np.asarray(r.infer_fn(conf_thres=0.0001, max_nms=64)(
        r.variables, jnp.zeros((1, 64, 64, 3), jnp.float32)))
    assert out.shape == (1, 300, 6)
    assert np.isfinite(out).all()


def test_rtdetr_runner_inference():
    """Runner.infer_fn must produce NMS-free top-k detections for the
    RT-DETR head (normalized boxes scaled to pixels)."""
    import tempfile, pathlib

    import yaml as _yaml

    from yolosomi_tpu.engine.runner import Runner

    cfg = {
        "nc": 4, "depth_multiple": 1.0, "width_multiple": 1.0, "anchors": 3,
        "backbone": [
            [-1, 1, "Conv", [8, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "RTDETRDecoder", ["nc", 32, 12]]],
    }
    d = pathlib.Path(tempfile.mkdtemp())
    (d / "rt.yaml").write_text(_yaml.safe_dump(cfg))
    r = Runner(str(d / "rt.yaml"), imgsz=64)
    out = np.asarray(r.infer_fn(conf_thres=0.0001)(
        r.variables, jnp.zeros((1, 64, 64, 3), jnp.float32)))
    assert out.shape == (1, 300, 6)
    valid = out[0][out[0][:, 4] > 0]
    if len(valid):
        assert (valid[:, :4] >= 0).all() and (valid[:, :4] <= 64).all()
