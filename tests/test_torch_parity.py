"""Numerical parity: our flax blocks vs independently-written torch
equivalents, through the weight converter.

This is the framework's version of the reference's parity harness
pattern (ops_dcnv3/test.py: slow reference implementation as oracle).
The torch modules here are written from the published YOLOv5 block
formulas (Conv+BN(eps1e-3)+SiLU, C3, SPPF, Focus, Detect) with
reference-style state_dict keys (model.<i>.cv1.conv.weight ...), so the
test validates both the math (NHWC vs NCHW, padding, BN, pooling,
decode) and the converter's key mapping + kernel transposition.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from yolosomi_tpu.models.heads import decode  # noqa: E402
from yolosomi_tpu.models.yolo import build_model, init_model  # noqa: E402
from yolosomi_tpu.utils.torch_convert import anchors_from_state_dict, convert_state_dict  # noqa: E402

# torch golden modules (independent implementations) now live in the
# package so ONNX export shares them — see utils/torch_mirror.py
from yolosomi_tpu.utils.torch_mirror import (  # noqa: E402
    TC3,
    TC2fCBAM,
    TConv,
    TFocus,
    TSPPF,
)


class TDetectConvs(nn.Module):
    """Just the per-level 1x1 prediction convs of Detect."""

    def __init__(self, nc, na, ch):
        super().__init__()
        self.m = nn.ModuleList(nn.Conv2d(c, na * (nc + 5), 1) for c in ch)

    def forward(self, xs):
        return [m(x) for m, x in zip(self.m, xs)]


ANCHORS = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119], [116, 90, 156, 198, 373, 326]]
NC = 4

CFG = {
    "nc": NC,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": ANCHORS,
    "backbone": [
        [-1, 1, "Focus", [8, 3]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "C3", [16]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C3", [32]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "C3", [64]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "SPPF", [128, 5]],
    ],
    "head": [[[4, 6, 8], 1, "Detect", ["nc", "anchors"]]],
}


class TorchGolden(nn.Module):
    def __init__(self):
        super().__init__()
        self.model = nn.Sequential(
            TFocus(3, 8, 3),
            TConv(8, 16, 3, 2),
            TC3(16, 16),
            TConv(16, 32, 3, 2),
            TC3(32, 32),
            TConv(32, 64, 3, 2),
            TC3(64, 64),
            TConv(64, 128, 3, 2),
            TSPPF(128, 128, 5),
            TDetectConvs(NC, 3, [32, 64, 128]),
        )

    def forward(self, x):
        feats = []
        for i, m in enumerate(self.model[:-1]):
            x = m(x)
            if i in (4, 6, 8):
                feats.append(x)
        return self.model[-1](feats)


def _randomized_state_dict(model):
    """Random weights + non-trivial BN stats so parity exercises everything."""
    g = torch.Generator().manual_seed(0)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) * 2 + 0.5
            elif "running_mean" in k:
                sd[k] = torch.randn(v.shape, generator=g) * 0.2
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
    model.load_state_dict(sd)
    return {k: v.numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def parity_pair():
    tmodel = TorchGolden().eval()
    sd = _randomized_state_dict(tmodel)
    jmodel, meta = build_model(CFG)
    variables = init_model(jmodel, meta, imgsz=64)
    variables = convert_state_dict(sd, variables, strict=False)
    return tmodel, sd, jmodel, meta, variables


def test_converter_matches_all_leaves(parity_pair):
    tmodel, sd, jmodel, meta, variables = parity_pair
    # every torch leaf must land: re-run strict to prove full coverage
    jmodel2, meta2 = build_model(CFG)
    v2 = init_model(jmodel2, meta2, imgsz=64)
    convert_state_dict(sd, v2, strict=True)


def test_backbone_forward_parity(parity_pair):
    tmodel, sd, jmodel, meta, variables = parity_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x))
    j_out = jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    assert len(t_out) == len(j_out) == 3
    for lvl, (t, j) in enumerate(zip(t_out, j_out)):
        # torch (B, na*no, ny, nx) -> (B, ny, nx, na, no)
        b, c, ny, nx = t.shape
        t_np = t.numpy().reshape(b, 3, NC + 5, ny, nx).transpose(0, 3, 4, 1, 2)
        np.testing.assert_allclose(
            t_np, np.asarray(j), atol=2e-4, rtol=1e-3,
            err_msg=f"level {lvl} mismatch",
        )


def test_decode_parity(parity_pair):
    """Full decode vs a hand-rolled torch decode of the same maps."""
    tmodel, sd, jmodel, meta, variables = parity_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x))
    j_out = jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    dec = np.asarray(decode(j_out, meta.anchors_px, meta.strides))

    # torch-side decode (the reference inference formula, yolo.py:84-94)
    rows = []
    for i, t in enumerate(t_out):
        b, c, ny, nx = t.shape
        stride = meta.strides[i]
        t = t.reshape(b, 3, NC + 5, ny, nx).permute(0, 1, 3, 4, 2)
        y = t.sigmoid()
        yv, xv = torch.meshgrid(torch.arange(ny), torch.arange(nx), indexing="ij")
        grid = torch.stack((xv, yv), 2).view(1, 1, ny, nx, 2).float()
        anchor = torch.tensor(meta.anchors_px[i]).view(1, 3, 1, 1, 2).float()
        xy = (y[..., 0:2] * 2 - 0.5 + grid) * stride
        wh = (y[..., 2:4] * 2) ** 2 * anchor
        out = torch.cat((xy, wh, y[..., 4:]), -1)  # (b, na, ny, nx, no)
        # our decode flattens (ny, nx, na) row-major (a free reshape; see
        # heads.decode_level) — match that order here
        rows.append(out.permute(0, 2, 3, 1, 4).reshape(b, -1, NC + 5))
    t_dec = torch.cat(rows, 1).numpy()
    np.testing.assert_allclose(t_dec, dec, atol=2e-4, rtol=1e-3)


def test_bn_eval_semantics(parity_pair):
    """Eval-mode BN must use the converted running stats, not batch stats."""
    tmodel, sd, jmodel, meta, variables = parity_pair
    x1 = np.random.default_rng(2).standard_normal((1, 3, 64, 64)).astype(np.float32)
    x2 = np.concatenate([x1, x1 * 3.0], 0)  # different batch statistics
    j1 = jmodel.apply(variables, jnp.asarray(x1.transpose(0, 2, 3, 1)), train=False)
    j2 = jmodel.apply(variables, jnp.asarray(x2.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(j1[0][0]), np.asarray(j2[0][0]), atol=1e-5)


def test_c2fcbam_parity():
    """Flagship attention block vs torch golden through the converter.
    Note: reference CBAMBottleneck is residual only when c1 == c2 AND
    shortcut; C2fCBAM passes shortcut=True in the flagship backbone —
    mirrored by shortcut=True here."""
    from yolosomi_tpu.models.layers import C2fCBAM

    tblock = TC2fCBAM(16, 16, n=2, shortcut=True).eval()
    sd = _randomized_state_dict(tblock)

    jblock = C2fCBAM(16, n=2, shortcut=True)
    x = np.random.default_rng(0).standard_normal((1, 16, 12, 12)).astype(np.float32)
    variables = jblock.init(__import__("jax").random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    from yolosomi_tpu.utils.torch_convert import convert_state_dict

    # wrap keys as model.0.* to satisfy the layers_N prefix contract
    sd_pref = {f"model.0.{k}": v for k, v in sd.items()}
    variables = convert_state_dict(sd_pref, {"params": {"layers_0": variables["params"]},
                                             "batch_stats": {"layers_0": variables["batch_stats"]}},
                                   strict=True)
    variables = {"params": variables["params"]["layers_0"], "batch_stats": variables["batch_stats"]["layers_0"]}

    with torch.no_grad():
        t_out = tblock(torch.from_numpy(x)).numpy()

    j_out = jblock.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    np.testing.assert_allclose(t_out.transpose(0, 2, 3, 1), np.asarray(j_out), atol=3e-4, rtol=1e-3)
