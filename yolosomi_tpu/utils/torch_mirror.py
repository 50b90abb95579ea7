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


class TDetect(nn.Module):
    """Coupled head with the reference's export-time decode baked in
    (yolo.py:84-97): sigmoid, xy=(2t-0.5+grid)*stride, wh=(2t)^2*anchor,
    flattened (ny, nx, na) per level to match heads.decode's row order.

    Grids are registered buffers precomputed at the export image size —
    static shapes, so the ONNX graph carries them as constants (the
    reference's dynamic `_make_grid` re-trace has no ONNX counterpart
    for fixed-size export either)."""

    def __init__(self, nc, anchors_px, strides, ch, imgsz=640, decode=True):
        super().__init__()
        # copy: from_numpy shares memory, and these arrays are views into
        # the live ModelMeta — load_state_dict must never write through
        anchors_px = np.array(anchors_px, np.float32)  # (nl, na, 2)
        self.nc, self.nl, self.na = nc, len(anchors_px), anchors_px.shape[1]
        self.no = nc + 5
        self.decode = decode
        self.strides = [int(s) for s in strides]
        self.m = nn.ModuleList(nn.Conv2d(c, self.na * self.no, 1) for c in ch)
        # grid-unit anchors, the reference checkpoint convention (yolo.py:1203)
        self.register_buffer(
            "anchors",
            torch.from_numpy(anchors_px / np.asarray(self.strides, np.float32)[:, None, None]),
        )
        # derived decode constants: non-persistent so state_dict round
        # trips can't perturb them (they are functions of meta + imgsz)
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

    def forward(self, xs):
        outs = []
        for i, (m, x) in enumerate(zip(self.m, xs)):
            y = m(x)
            b, _, ny, nx = y.shape
            y = y.view(b, self.na, self.no, ny, nx).permute(0, 1, 3, 4, 2)
            if not self.decode:
                outs.append(y)
                continue
            y = y.sigmoid()
            xy = (y[..., 0:2] * 2.0 - 0.5 + getattr(self, f"grid{i}")) * float(self.strides[i])
            wh = (y[..., 2:4] * 2.0) ** 2 * getattr(self, f"anchor{i}")
            out = torch.cat((xy, wh, y[..., 4:]), -1)
            outs.append(out.permute(0, 2, 3, 1, 4).reshape(b, -1, self.no))
        return torch.cat(outs, 1) if self.decode else outs


# registry-name -> mirror factory; extend as more families gain mirrors.
# Each factory sees (c1, c2, n, rest_args) with c2 already width-resolved.
_MIRROR = {
    "Conv": lambda c1, c2, n, a: TConv(c1, c2, *a[:3]),
    "DWConv": lambda c1, c2, n, a: TDWConv(c1, c2, *a[:2]),
    "Focus": lambda c1, c2, n, a: TFocus(c1, c2, *a[:1]),
    "Bottleneck": lambda c1, c2, n, a: TBottleneck(c1, c2, *a[:1]),
    "C3": lambda c1, c2, n, a: TC3(c1, c2, n, *a[:1]),
    "C2fCBAM": lambda c1, c2, n, a: TC2fCBAM(c1, c2, n, *a[:1]),
    "SPP": lambda c1, c2, n, a: TSPP(c1, c2, *a[:1]),
    "SPPF": lambda c1, c2, n, a: TSPPF(c1, c2, *a[:1]),
    "nn.Upsample": lambda c1, c2, n, a: nn.Upsample(size=a[0], scale_factor=a[1], mode=a[2]),
    "Upsample": lambda c1, c2, n, a: nn.Upsample(size=a[0], scale_factor=a[1], mode=a[2]),
    "Concat": lambda c1, c2, n, a: TConcat(*a[:1]),
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
            if spec.i == len(meta.specs) - 1 and mname in ("Detect",):
                ch = [meta.specs[j].c2 for j in meta.head_from]
                layers.append(
                    TDetect(meta.nc, meta.anchors_px, meta.strides, ch, imgsz=imgsz, decode=decode)
                )
                continue
            if mname not in _MIRROR:
                unsupported.append(f"row {spec.i}: {mname}")
                continue
            n_rep = max(round(n * gd), 1) if n > 1 else n
            fi = f if isinstance(f, int) else f[0]
            src = spec.i + fi if fi < 0 else fi
            c1 = meta.specs[src].c2 if src >= 0 else 3
            # rest args: everything after the raw c2 slot (Concat/Upsample
            # rows have no c2 slot — their spec args pass through whole)
            rest = spec.args[1:] if mname not in ("Concat", "nn.Upsample", "Upsample") else spec.args
            layers.append(_MIRROR[mname](c1, spec.c2, n_rep, rest))
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
