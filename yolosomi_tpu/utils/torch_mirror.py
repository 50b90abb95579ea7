"""Torch mirror of the YAML graph compiler, for ONNX-family export.

The reference exports by running torch.onnx on its native torch modules
(export.py:64-130). Our compute path is flax/XLA, which torch.onnx cannot
see — so export rides a *mirror*: independently-written torch modules with
reference-style state_dict keys (model.<i>.cv1.conv.weight ...), built
from the same parsed YAML spec as the flax model and loaded with the
inverse of utils/torch_convert. The mirror's numerics are pinned to the
flax model by tests (tests/test_torch_parity.py runs block-level parity;
tests/test_onnx_export.py full-graph), so the ONNX artifact inherits the
same trust chain the reference's does: torch graph == ONNX graph by
torch's exporter.

These classes started as the parity-test goldens (written from the
published YOLOv5 block formulas, NOT from the reference source) and moved
here so export and tests share one implementation.

Torch is an export/convert-time dependency only — never imported on the
TPU compute path (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import torch
import torch.nn as nn


def _autopad(k: int, p: Optional[int] = None) -> int:
    return k // 2 if p is None else p


class TConv(nn.Module):
    """Conv + BN(eps 1e-3, momentum 0.03) + SiLU (reference common.py Conv)."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, _autopad(k, p), groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TDWConv(TConv):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__(c1, c2, k, s, g=int(np.gcd(c1, c2)))


class TBottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_, c2, 3, 1)
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
        self.m = nn.Sequential(*(TBottleneck(c_, c_, shortcut, e=1.0) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TSPP(nn.Module):
    def __init__(self, c1, c2, ks=(5, 9, 13)):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_ * (len(ks) + 1), c2, 1, 1)
        self.mp = nn.ModuleList(nn.MaxPool2d(k, 1, k // 2) for k in ks)

    def forward(self, x):
        x = self.cv1(x)
        return self.cv2(torch.cat([x] + [m(x) for m in self.mp], 1))


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
    """CBAM bottleneck as C2fCBAM wires it (common.py:671-695 with e=1.0,
    ratio=16, k=7)."""

    def __init__(self, c, shortcut=False):
        super().__init__()
        self.cv1 = TConv(c, c, 3, 1)
        self.cv2 = TConv(c, c, 3, 1)
        self.channel_attention = TChannelAttention(c, 16)
        self.spatial_attention = TSpatialAttention(7)
        self.add = shortcut

    def forward(self, x):
        y = self.cv1(x)
        y = self.channel_attention(y) * y
        y = self.spatial_attention(y) * y
        y = self.cv2(y)
        return x + y if self.add else y


class TC2fCBAM(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1, 1)
        self.m = nn.ModuleList(TCBAMBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TConcat(nn.Module):
    def __init__(self, dim=1):
        super().__init__()
        self.dim = dim

    def forward(self, xs):
        return torch.cat(xs, self.dim)


class TODConv2d(nn.Module):
    """Omni-dimensional dynamic conv core, mirroring models/layers.py
    ODConv2d (reference: common.py:4495-4610): K candidate kernels mixed
    per-sample by four attention factors, then the grouped-conv trick
    (view(1, B*C, H, W), groups=B — the reference's own lowering).
    Key layout matches the reference's ODConv2d_3rd: the candidate kernel
    AND bias banks live here (X.conv.weight / X.conv.bias)."""

    def __init__(self, c1, c2, k=3, s=1, K=4, r=1.0 / 16.0):
        super().__init__()
        self.k, self.s, self.K, self.c1, self.c2 = k, s, K, c1, c2
        hidden = max(int(c1 * r), 16)
        self.weight = nn.Parameter(torch.zeros(K, c2, c1, k, k))
        self.bias = nn.Parameter(torch.zeros(K, c2))
        self.fc = nn.Linear(c1, hidden, bias=False)
        # flax momentum 0.9 == torch momentum 0.1 (decay conventions)
        self.bn = nn.BatchNorm1d(hidden, eps=1e-5, momentum=0.1)
        self.fc_f = nn.Linear(hidden, c2)
        self.fc_s = nn.Linear(hidden, k * k)
        self.fc_c = nn.Linear(hidden, c1)
        self.fc_w = nn.Linear(hidden, K)

    def forward(self, x):
        bias_bank = self.bias
        b, c1, h, w = x.shape
        k = self.k
        v = x.mean((2, 3))
        v = torch.relu(self.bn(self.fc(v)))
        attn_f = torch.sigmoid(self.fc_f(v))  # (b, c2)
        attn_s = torch.sigmoid(self.fc_s(v)).view(b, 1, 1, k, k)
        attn_c = torch.sigmoid(self.fc_c(v)).view(b, 1, c1, 1, 1)
        attn_w = torch.softmax(self.fc_w(v), -1)  # (b, K)
        wmix = torch.einsum("bk,koihw->boihw", attn_w, self.weight)
        wmix = wmix * attn_s * attn_c * attn_f.view(b, self.c2, 1, 1, 1)
        out = torch.nn.functional.conv2d(
            x.reshape(1, b * c1, h, w),
            wmix.reshape(b * self.c2, c1, k, k),
            stride=self.s,
            padding=k // 2,
            groups=b,
        )
        out = out.view(b, self.c2, out.shape[-2], out.shape[-1])
        bmix = attn_w @ bias_bank  # (b, c2)
        return out + bmix.view(b, self.c2, 1, 1)


class TODConv(nn.Module):
    """ODConv + BN + SiLU wrapper (YAML `ODConv_3rd`)."""

    def __init__(self, c1, c2, k=3, s=1, K=4):
        super().__init__()
        self.conv = TODConv2d(c1, c2, k, s, K)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class _TResidual(nn.Module):
    """Reference `Residual` wrapper (common.py): x + fn(x), key `fn`."""

    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return x + self.fn(x)


class TSEAM(nn.Module):
    """Spatially-enhanced attention (mirrors models/layers.py SEAM;
    reference: common.py:8448-8505): depthwise-residual stack, SE-style
    MLP, exp-of-sigmoid channel gate. State-dict layout is byte-compatible
    with the reference SEAM (DCovN / fc Sequentials)."""

    def __init__(self, c, n=1, reduction=16):
        super().__init__()
        bn = lambda: nn.BatchNorm2d(c, eps=1e-3, momentum=0.03)  # noqa: E731
        self.DCovN = nn.Sequential(
            nn.Conv2d(c, c, 3, 1, 1, groups=c),
            nn.GELU(),
            bn(),
            *[
                nn.Sequential(
                    _TResidual(nn.Sequential(nn.Conv2d(c, c, 3, 1, 1, groups=c), nn.GELU(), bn())),
                    nn.Conv2d(c, c, 1),
                    nn.GELU(),
                    bn(),
                )
                for _ in range(n)
            ],
        )
        mid = max(c // reduction, 1)
        self.fc = nn.Sequential(nn.Linear(c, mid, bias=False), nn.ReLU(), nn.Linear(mid, c, bias=False))

    def forward(self, x):
        y = self.DCovN(x)
        v = self.fc(y.mean((2, 3)))
        gate = torch.exp(torch.sigmoid(v))
        return x * gate[:, :, None, None]


class TEMACBAMBottleneck(nn.Module):
    """EMA-grouped attention bottleneck (mirrors models/layers.py
    EMACBAMBottleneck; reference: common.py:895-957 as repaired there —
    no residual, per-channel instance norm)."""

    def __init__(self, c2, e=0.5, factor=8):
        super().__init__()
        c_ = int(c2 * e)
        self.factor = factor
        self.cv1 = nn.Conv2d(c2, c_, 3, 1, 1)
        self.cv2 = nn.Conv2d(c_, c2, 3, 1, 1)
        gch = max(c2 // factor, 1)
        # reference key layout (common.py:910-914): fc = Sequential of 1x1
        # convs at slots 0 and 2
        self.fc = nn.Sequential(
            nn.Conv2d(c2, gch, 1, bias=False), nn.ReLU(), nn.Conv2d(gch, c2, 1, bias=False)
        )
        self.conv_spatial = nn.Conv2d(gch, 1, (7, 1), padding=(3, 0), bias=False)
        self.gn = nn.GroupNorm(c2, c2, eps=1e-5)

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        b, c, h, w = y.shape
        g = self.factor
        gch = c // g
        avg = y.mean((2, 3), keepdim=True)
        mx = y.amax(2, keepdim=True).amax(3, keepdim=True)
        gate_c = torch.sigmoid(self.fc(avg) + self.fc(mx))[:, :, 0, 0]
        y = y * gate_c[:, :, None, None]
        gy = y.view(b, g, gch, h, w)
        ph = gy.mean(4)  # (b, g, gch, h)
        pw = gy.mean(3)  # (b, g, gch, w)
        profile = torch.cat([ph, pw], 3)  # (b, g, gch, h+w)
        gate_s = self.conv_spatial(profile.reshape(b * g, gch, h + w, 1))
        gate_s = torch.sigmoid(gate_s.view(b, g, h + w))
        gate_h = gate_s[:, :, :h].view(b, g, 1, h, 1)
        gate_w = gate_s[:, :, h:].view(b, g, 1, 1, w)
        gy = (gy * gate_h * gate_w).view(b, c, h, w)
        return self.gn(gy)


class TC2fEMACBAM(nn.Module):
    def __init__(self, c1, c2, n=1):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1, 1)
        self.m = nn.ModuleList(TEMACBAMBottleneck(self.c) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TBiFPN(nn.Module):
    """Learned-weight fusion (mirrors models/layers.py BiFPN; reference:
    common.py:3688-3705): w_i / (sum(swish(w)) + eps) weighted sum."""

    def __init__(self, length, epsilon=1e-4):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(length))
        self.epsilon = epsilon

    def forward(self, xs):
        w = self.weight
        wn = w / (torch.sum(w * torch.sigmoid(w)) + self.epsilon)
        out = wn[0] * xs[0]
        for i in range(1, len(xs)):
            out = out + wn[i] * xs[i]
        return out


class TDecouple(nn.Module):
    """Decoupled branch head for one level (mirrors heads.py Decouple;
    reference: yolo.py:1042-1074)."""

    def __init__(self, c1, nc, na):
        super().__init__()
        self.nc, self.na = nc, na
        c_ = min(c1, 256)
        na5 = na * 5
        from yolosomi_tpu.models.heads import decouple_taper

        taper = decouple_taper(c_, na5)
        self.a = TConv(c1, c_, 1, 1)
        self.b1 = TConv(c_, taper[1], 3, 1)
        self.b2 = TConv(taper[1], taper[2], 3, 1)
        self.b3 = nn.Conv2d(taper[2], na5, 1)
        self.c1 = TConv(c_, c_, 1, 1)
        self.c2 = TConv(c_, c_, 1, 1)
        self.c3 = nn.Conv2d(c_, na * nc, 1)

    def forward(self, x):
        stem = self.a(x)
        r = self.b3(self.b2(self.b1(stem)))
        c = self.c3(self.c2(self.c1(stem)))
        b, _, ny, nx = r.shape
        r = r.view(b, self.na, 5, ny, nx)
        c = c.view(b, self.na, self.nc, ny, nx)
        return torch.cat([r, c], 2)  # (b, na, no, ny, nx)


class TBaseDetect(nn.Module):
    """Shared head plumbing: anchor/grid buffers + the reference's
    export-time decode (yolo.py:84-97): sigmoid, xy=(2t-0.5+grid)*stride,
    wh=(2t)^2*anchor, flattened (ny, nx, na) per level to match
    heads.decode's row order.

    Grids are registered (non-persistent) buffers precomputed at the
    export image size — static shapes, so the ONNX graph carries them as
    constants (the reference's dynamic `_make_grid` re-trace has no ONNX
    counterpart for fixed-size export either)."""

    def __init__(self, nc, anchors_px, strides, imgsz=640, decode=True):
        super().__init__()
        # copy: from_numpy shares memory, and these arrays are views into
        # the live ModelMeta — load_state_dict must never write through
        anchors_px = np.array(anchors_px, np.float32)  # (nl, na, 2)
        self.nc, self.nl, self.na = nc, len(anchors_px), anchors_px.shape[1]
        self.no = nc + 5
        self.decode = decode
        self.strides = [int(s) for s in strides]
        # grid-unit anchors, the reference checkpoint convention (yolo.py:1203)
        self.register_buffer(
            "anchors",
            torch.from_numpy(anchors_px / np.asarray(self.strides, np.float32)[:, None, None]),
        )
        for i, s in enumerate(self.strides):
            ny = nx = int(imgsz) // s
            yv, xv = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
            grid = np.stack([xv, yv], -1).astype(np.float32)[None, None]  # (1,1,ny,nx,2)
            self.register_buffer(f"grid{i}", torch.from_numpy(grid), persistent=False)
            self.register_buffer(
                f"anchor{i}",
                torch.from_numpy(anchors_px[i].reshape(1, self.na, 1, 1, 2).copy()),
                persistent=False,
            )

    def _finish(self, i, y):
        """y: (b, na, ny, nx, no) raw. Returns decoded rows or raw map."""
        if not self.decode:
            return y
        b = y.shape[0]
        y = y.sigmoid()
        xy = (y[..., 0:2] * 2.0 - 0.5 + getattr(self, f"grid{i}")) * float(self.strides[i])
        wh = (y[..., 2:4] * 2.0) ** 2 * getattr(self, f"anchor{i}")
        out = torch.cat((xy, wh, y[..., 4:]), -1)
        return out.permute(0, 2, 3, 1, 4).reshape(b, -1, self.no)

    def _collect(self, outs):
        return torch.cat(outs, 1) if self.decode else outs


class TDetect(TBaseDetect):
    """Coupled YOLOv5 head: one 1x1 conv per level."""

    def __init__(self, nc, anchors_px, strides, ch, imgsz=640, decode=True):
        super().__init__(nc, anchors_px, strides, imgsz=imgsz, decode=decode)
        self.m = nn.ModuleList(nn.Conv2d(c, self.na * self.no, 1) for c in ch)

    def forward(self, xs):
        outs = []
        for i, (m, x) in enumerate(zip(self.m, xs)):
            y = m(x)
            b, _, ny, nx = y.shape
            y = y.view(b, self.na, self.no, ny, nx).permute(0, 1, 3, 4, 2)
            outs.append(self._finish(i, y))
        return self._collect(outs)
class TDecoupledDetect(TBaseDetect):
    """The SOMI head (mirrors heads.py DecoupledDetect; reference:
    yolo.py:925-1040)."""

    def __init__(self, nc, anchors_px, strides, ch, imgsz=640, decode=True):
        super().__init__(nc, anchors_px, strides, imgsz=imgsz, decode=decode)
        self.m = nn.ModuleList(TDecouple(c, nc, self.na) for c in ch)

    def forward(self, xs):
        outs = []
        for i, (m, x) in enumerate(zip(self.m, xs)):
            y = m(x).permute(0, 1, 3, 4, 2)  # (b, na, ny, nx, no)
            outs.append(self._finish(i, y))
        return self._collect(outs)




# registry-name -> mirror factory; extend as more families gain mirrors.
# Each factory sees (c1, c2, n, rest_args, from_spec) with c2 already
# width-resolved; most ignore from_spec (BiFPN derives its arity from it).
_MIRROR = {
    "Conv": lambda c1, c2, n, a, f: TConv(c1, c2, *a[:3]),
    "DWConv": lambda c1, c2, n, a, f: TDWConv(c1, c2, *a[:2]),
    "Focus": lambda c1, c2, n, a, f: TFocus(c1, c2, *a[:1]),
    "Bottleneck": lambda c1, c2, n, a, f: TBottleneck(c1, c2, *a[:1]),
    "C3": lambda c1, c2, n, a, f: TC3(c1, c2, n, *a[:1]),
    "C2fCBAM": lambda c1, c2, n, a, f: TC2fCBAM(c1, c2, n, *a[:1]),
    "C2fEMACBAM": lambda c1, c2, n, a, f: TC2fEMACBAM(c1, c2, n),
    "C2fEACBAM": lambda c1, c2, n, a, f: TC2fEMACBAM(c1, c2, n),
    "SPP": lambda c1, c2, n, a, f: TSPP(c1, c2, *a[:1]),
    "SPPF": lambda c1, c2, n, a, f: TSPPF(c1, c2, *a[:1]),
    "ODConv": lambda c1, c2, n, a, f: TODConv(c1, c2, *a[:3]),
    "ODConv_3rd": lambda c1, c2, n, a, f: TODConv(c1, c2, *a[:3]),
    "SEAM": lambda c1, c2, n, a, f: TSEAM(c1, *a[:2]),
    "BiFPN": lambda c1, c2, n, a, f: TBiFPN(len(f)),
    "nn.Upsample": lambda c1, c2, n, a, f: nn.Upsample(size=a[0], scale_factor=a[1], mode=a[2]),
    "Upsample": lambda c1, c2, n, a, f: nn.Upsample(size=a[0], scale_factor=a[1], mode=a[2]),
    "Concat": lambda c1, c2, n, a, f: TConcat(*a[:1]),
}

_HEADS = {
    "Detect": TDetect,
    "DecoupledDetect": TDecoupledDetect,
    "DecoupledDetect1": TDecoupledDetect,
    "Decoupled_Detect": TDecoupledDetect,
}


class TorchMirrorModel(nn.Module):
    """The parsed YAML graph as torch modules under reference indexing
    (model.<i>), with the reference's from/save forward walk
    (yolo.py:1269-1290)."""

    def __init__(self, meta, cfg, imgsz=640, decode=True):
        super().__init__()
        gd = cfg.get("depth_multiple", 1.0)
        rows = list(cfg["backbone"]) + list(cfg["head"])
        layers: List[nn.Module] = []
        unsupported = []
        for spec, (f, n, mname, _args) in zip(meta.specs, rows):
            mname = str(mname)
            if spec.i == len(meta.specs) - 1 and mname in _HEADS:
                ch = [meta.specs[j].c2 for j in meta.head_from]
                layers.append(
                    _HEADS[mname](
                        meta.nc, meta.anchors_px, meta.strides, ch, imgsz=imgsz, decode=decode
                    )
                )
                continue
            if mname not in _MIRROR:
                unsupported.append(f"row {spec.i}: {mname}")
                continue
            n_rep = max(round(n * gd), 1) if n > 1 else n
            fi = f if isinstance(f, int) else f[0]
            src = spec.i + fi if fi < 0 else fi
            c1 = meta.specs[src].c2 if src >= 0 else 3
            # rest args: everything after the raw c2 slot (Concat/Upsample/
            # BiFPN rows have no c2 slot — their spec args pass through whole)
            rest = (
                spec.args[1:]
                if mname not in ("Concat", "nn.Upsample", "Upsample", "BiFPN")
                else spec.args
            )
            flist = f if isinstance(f, (list, tuple)) else [f]
            layers.append(_MIRROR[mname](c1, spec.c2, n_rep, rest, flist))
        if unsupported:
            raise NotImplementedError(
                "no torch mirror for: " + ", ".join(unsupported)
                + " — ONNX export currently covers the yolov5 family graphs"
            )
        self.model = nn.ModuleList(layers)
        self._froms = [s.f for s in meta.specs]
        self._save = set(meta.save) | set(meta.head_from)

    def forward(self, x):
        saved = {}
        for i, (m, f) in enumerate(zip(self.model, self._froms)):
            if isinstance(f, int):
                x = x if f == -1 else saved[f]
                x = m(x)
            else:
                x = m([x if j == -1 else saved[j] for j in f])
            if i in self._save:
                saved[i] = x
        return x


def build_torch_mirror(cfg: dict, meta, imgsz: int = 640, decode: bool = True) -> TorchMirrorModel:
    """Build the torch mirror for a parsed model. `meta` is the ModelMeta
    from models.yolo.build_model (same YAML dict must be passed as `cfg`)."""
    return TorchMirrorModel(meta, cfg, imgsz=imgsz, decode=decode).eval()
