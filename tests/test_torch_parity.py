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

# ---- torch golden modules (independent implementation) -------------------


class TConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c1, c2, 1, 1)
        self.cv2 = TConv(c2, c2, 3, 1)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(2 * c_, c2, 1, 1)
        self.m = nn.Sequential(*(TBottleneck(c_, c_, shortcut) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_ * 4, c2, 1, 1)
        self.mp = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.mp(x)
        y2 = self.mp(y1)
        return self.cv2(torch.cat([x, y1, y2, self.mp(y2)], 1))


class TFocus(nn.Module):
    def __init__(self, c1, c2, k=1):
        super().__init__()
        self.conv = TConv(c1 * 4, c2, k, 1)

    def forward(self, x):
        return self.conv(
            torch.cat(
                [x[..., ::2, ::2], x[..., 1::2, ::2], x[..., ::2, 1::2], x[..., 1::2, 1::2]], 1
            )
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


class TChannelAttention(nn.Module):
    """Reference-shaped CBAM channel gate (common.py:339)."""

    def __init__(self, c1, reduction=16):
        super().__init__()
        mid = max(c1 // reduction, 1)
        self.shared_MLP = nn.Sequential(nn.Linear(c1, mid), nn.ReLU(), nn.Linear(mid, c1))

    def forward(self, x):
        b, c, _, _ = x.shape
        avg = self.shared_MLP(x.mean((2, 3)))
        mx = self.shared_MLP(x.amax((2, 3)))
        return torch.sigmoid(avg + mx).view(b, c, 1, 1)


class TSpatialAttention(nn.Module):
    def __init__(self, k=7):
        super().__init__()
        self.cv1 = nn.Conv2d(2, 1, k, padding=k // 2)

    def forward(self, x):
        s = torch.cat([x.mean(1, keepdim=True), x.amax(1, keepdim=True)], 1)
        return torch.sigmoid(self.cv1(s))


class TCBAMBottleneck(nn.Module):
    """CBAM bottleneck as the reference wires it from C2fCBAM
    (common.py:671-695 with e=1.0, ratio=16, k=7)."""

    def __init__(self, c):
        super().__init__()
        self.cv1 = TConv(c, c, 3, 1)
        self.cv2 = TConv(c, c, 3, 1)
        self.channel_attention = TChannelAttention(c, 16)
        self.spatial_attention = TSpatialAttention(7)

    def forward(self, x):
        y = self.cv1(x)
        y = self.channel_attention(y) * y
        y = self.spatial_attention(y) * y
        return self.cv2(y)


class TC2fCBAM(nn.Module):
    def __init__(self, c1, c2, n=1):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1, 1)
        self.m = nn.ModuleList(TCBAMBottleneck(self.c) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


def test_c2fcbam_parity():
    """Flagship attention block vs torch golden through the converter.
    Note: reference CBAMBottleneck is residual only when c1 == c2 AND
    shortcut; C2fCBAM passes shortcut=True in the flagship backbone —
    mirrored by shortcut=True here."""
    from yolosomi_tpu.models.layers import C2fCBAM

    tblock = TC2fCBAM(16, 16, n=2).eval()
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

    # torch residual add inside bottleneck: flagship passes shortcut=True
    class TC2fCBAMRes(TC2fCBAM):
        pass

    with torch.no_grad():
        # manual forward with residual adds to match shortcut=True
        y = list(tblock.cv1(torch.from_numpy(x)).chunk(2, 1))
        for m in tblock.m:
            inner = m.cv1(y[-1])
            inner = m.channel_attention(inner) * inner
            inner = m.spatial_attention(inner) * inner
            y.append(y[-1] + m.cv2(inner))
        t_out = tblock.cv2(torch.cat(y, 1)).numpy()

    j_out = jblock.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    np.testing.assert_allclose(t_out.transpose(0, 2, 3, 1), np.asarray(j_out), atol=3e-4, rtol=1e-3)
