"""Reference-oracle parity: run the REFERENCE'S OWN CODE as the golden
implementation against this framework, on identical randomized inputs.

Unlike test_torch_parity.py (builder-authored torch re-implementations,
which could share a misreading with our port), every oracle here is
imported straight from /root/reference with only dependency *stubs*
installed (absent pip packages: torchvision, ultralytics, timm, monai,
mmcv, mmengine — stub surface documented inline; each stub is either an
inert placeholder or a tiny public-formula function such as
make_anchors/dist2bbox).

Oracles exercised (reference file:line):
  - ComputeLoss + build_targets incl. Slide/NWD/focal/smoothing branches
    (utils/loss.py:112-262)
  - wasserstein / wasserstein_loss / bbox_iou flavors (utils/metrics.py:341-583)
  - ap_per_class / compute_ap (utils/metrics.py:21-95) and val.py's
    process_batch (val.py:50-71, AST-extracted since val.py's module
    imports need a GPU-era dependency chain)
  - letterbox / random_perspective geometry (utils/augmentations.py:92-319)
  - kmean_anchors GA under a shared seed (utils/autoanchor.py:73-131)
  - DecoupledDetect head forward+decode (models/yolo.py:925-1074) through
    our weight converter
  - the FULL reference Model graph-compiler + yolov5s forward
    (models/yolo.py:1164-1664) vs our build_model on the same YAML

NOTE on the Conv stub: models/common.py:9163 rebinds `Conv` to
ultralytics' Conv for the rest of the module (and thus for the star-import
into models/yolo.py), so the backbone convs of the oracle model run our
minimal faithful Conv stub. Everything else (parse_model, Focus, C3,
SPPF, heads, bias init, stride calibration, loss, metrics, geometry) is
the reference's own code.
"""

import ast
import contextlib
import io
import math
import os
import random as pyrandom
import re
import shutil
import sys
import tempfile
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"
if not os.path.isdir(REF_ROOT):
    pytest.skip("reference checkout not mounted", allow_module_level=True)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolosomi_tpu import losses as our_losses  # noqa: E402
from yolosomi_tpu.data import augment as our_aug  # noqa: E402
from yolosomi_tpu.models.heads import DecoupledDetect as OurDecoupledDetect  # noqa: E402
from yolosomi_tpu.models.heads import decode as our_decode  # noqa: E402
from yolosomi_tpu.models.yolo import build_model, init_model  # noqa: E402
from yolosomi_tpu.utils import autoanchor as our_autoanchor  # noqa: E402
from yolosomi_tpu.utils import iou as our_iou  # noqa: E402
from yolosomi_tpu.utils import metrics as our_metrics  # noqa: E402
from yolosomi_tpu.utils.config import find_config, load_model_cfg  # noqa: E402
from yolosomi_tpu.utils.torch_convert import convert_state_dict  # noqa: E402

# --------------------------------------------------------------------------
# dependency stubs + reference import (module level, once)
# --------------------------------------------------------------------------


def _mod(name):
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    return m


class _StubModule(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()

    def forward(self, x, *a, **k):
        return x


def _autopad(k, p=None, d=1):
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else [d * (x - 1) + 1 for x in k]
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


class _UConv(nn.Module):
    """Minimal faithful ultralytics Conv (conv + BN + SiLU, public formula).
    Needed because common.py:9163 rebinds `Conv` to this class for the
    star-import consumed by models/yolo.py."""

    default_act = nn.SiLU()

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, d=1, act=True):
        super().__init__()
        if isinstance(d, bool):
            # latent reference defect: Focus (common.py:1994) calls the OLD
            # v5 Conv signature positionally (7th arg = act) but the name
            # `Conv` is rebound to ultralytics' signature (7th arg = d) at
            # common.py:9163 — with real ultralytics this crashes. Interpret
            # a bool here as `act`, the only reading under which Focus works.
            d, act = 1, d
        self.conv = nn.Conv2d(c1, c2, k, s, _autopad(k, p, d), groups=g, dilation=d, bias=False)
        self.bn = nn.BatchNorm2d(c2)
        self.act = self.default_act if act is True else act if isinstance(act, nn.Module) else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


def _make_anchors(feats, strides, grid_cell_offset=0.5):
    # public anchor-free grid-center formula (v8 heads)
    anchor_points, stride_tensor = [], []
    dtype, device = feats[0].dtype, feats[0].device
    for i, stride in enumerate(strides):
        h, w = feats[i].shape[2], feats[i].shape[3]
        sx = torch.arange(w, device=device, dtype=dtype) + grid_cell_offset
        sy = torch.arange(h, device=device, dtype=dtype) + grid_cell_offset
        sy, sx = torch.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(torch.stack((sx, sy), -1).view(-1, 2))
        stride_tensor.append(torch.full((h * w, 1), stride, dtype=dtype, device=device))
    return torch.cat(anchor_points), torch.cat(stride_tensor)


def _dist2bbox(distance, anchor_points, xywh=True, dim=-1):
    lt, rb = distance.chunk(2, dim)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return torch.cat(((x1y1 + x2y2) / 2, x2y2 - x1y1), dim)
    return torch.cat((x1y1, x2y2), dim)


def _install_stubs():
    # torchvision (only .ops.nms is touched by reference code paths we run)
    tv = _mod("torchvision")
    if not hasattr(tv, "__version__"):
        tv.__version__ = "0.15.0"
    tvt = _mod("torchvision.transforms")
    tv.transforms = tvt
    tvo = _mod("torchvision.ops")
    tv.ops = tvo
    if not hasattr(tvo, "nms"):
        tvo.nms = lambda boxes, scores, thr: torch.arange(len(boxes))

    try:
        import pkg_resources  # noqa: F401
    except ImportError:
        pr = _mod("pkg_resources")
        pr.parse_version = lambda v: tuple(int(x) for x in re.findall(r"\d+", str(v))[:3])

    ul = _mod("ultralytics")
    uln = _mod("ultralytics.nn")
    ul.nn = uln
    ulm = _mod("ultralytics.nn.modules")
    uln.modules = ulm
    ulm.__path__ = []  # mark as package for the .conv submodule import
    ulmu = _mod("ultralytics.nn.modules.utils")
    ulm.utils = ulmu
    ulu = _mod("ultralytics.utils")
    ul.utils = ulu
    ult = _mod("ultralytics.utils.tal")
    ulu.tal = ult
    ult.make_anchors = _make_anchors
    ult.dist2bbox = _dist2bbox
    ult.TORCH_1_10 = True
    for n in ["RepConv", "DeformableTransformerDecoderLayer", "DeformableTransformerDecoder", "MLP"]:
        if not hasattr(ulm, n):
            setattr(ulm, n, type(n, (_StubModule,), {}))
    ulm.__all__ = []
    ulmu.bias_init_with_prob = lambda p=0.01: float(-math.log((1 - p) / p))
    ulmu.linear_init_ = lambda m: None
    ulmc = _mod("ultralytics.nn.modules.conv")
    ulm.conv = ulmc
    ulmc.Conv = _UConv
    ulm.Conv = _UConv

    timm = _mod("timm")
    tm = _mod("timm.models")
    timm.models = tm
    tmeb = _mod("timm.models.efficientnet_blocks")
    tm.efficientnet_blocks = tmeb
    tmeb.SqueezeExcite = type("SqueezeExcite", (_StubModule,), {})
    tml = _mod("timm.models.layers")
    tm.layers = tml
    tmln = _mod("timm.models.layers.norm")
    tml.norm = tmln

    class LayerNorm2d(nn.LayerNorm):
        def forward(self, x):
            return nn.functional.layer_norm(
                x.permute(0, 2, 3, 1), self.normalized_shape, self.weight, self.bias, self.eps
            ).permute(0, 3, 1, 2)

    tmln.LayerNorm2d = LayerNorm2d
    tml.LayerNorm2d = LayerNorm2d
    tml.trunc_normal_ = lambda t, std=0.02, **k: t.data.normal_(0, std)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, **k):
            super().__init__()

        def forward(self, x):
            return x

    tml.DropPath = DropPath
    tml.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)

    monai = _mod("monai")
    mn = _mod("monai.networks")
    monai.networks = mn
    mnb = _mod("monai.networks.blocks")
    mn.blocks = mnb

    class MemoryEfficientSwish(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x)

    mnb.MemoryEfficientSwish = MemoryEfficientSwish

    mmcv = _mod("mmcv")
    mmcv_cnn = _mod("mmcv.cnn")
    mmcv.cnn = mmcv_cnn
    mmcv_cnn.ConvModule = type("ConvModule", (_StubModule,), {})
    mmcv_cnn.build_activation_layer = lambda cfg: nn.ReLU()
    mmcv_cnn.build_norm_layer = lambda cfg, ch: ("bn", nn.BatchNorm2d(ch))
    mmcv_ops = _mod("mmcv.ops")
    mmcv.ops = mmcv_ops
    mmcv_mdc = _mod("mmcv.ops.modulated_deform_conv")
    mmcv_ops.modulated_deform_conv = mmcv_mdc
    mmcv_mdc.ModulatedDeformConv2d = type("ModulatedDeformConv2d", (_StubModule,), {})

    mme = _mod("mmengine")
    mmem = _mod("mmengine.model")
    mme.model = mmem
    mmem.caffe2_xavier_init = lambda *a, **k: None
    mmem.constant_init = lambda *a, **k: None


# the reference's utils/plots.py downloads Arial.ttf at import when the
# config dir lacks it (zero egress here) — point YOLOV5_CONFIG_DIR at a
# temp dir pre-seeded with any ttf
_FONT_DIR = tempfile.mkdtemp(prefix="yolocfg_")
try:
    import matplotlib

    shutil.copy(
        os.path.join(matplotlib.get_data_path(), "fonts", "ttf", "DejaVuSans.ttf"),
        os.path.join(_FONT_DIR, "Arial.ttf"),
    )
except Exception:
    pass
os.environ["YOLOV5_CONFIG_DIR"] = _FONT_DIR

_install_stubs()
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

try:
    import utils.loss as ref_loss  # noqa: E402
    import utils.metrics as ref_metrics  # noqa: E402
    import utils.augmentations as ref_aug  # noqa: E402
    import utils.autoanchor as ref_autoanchor  # noqa: E402
    import models.yolo as ref_yolo  # noqa: E402
except Exception as e:  # pragma: no cover - environment drift guard
    pytest.skip(f"reference import failed: {e!r}", allow_module_level=True)
finally:
    # CRITICAL (round-3 verdict, weak #1): drop REF_ROOT from sys.path again
    # so top-level names the two repos share (val, train, detect, export,
    # utils, models) resolve to /root/repo for every LATER import anywhere in
    # the suite — leaving it on sys.path made `import val` inside other test
    # files load the REFERENCE's GPU-era val.py. The reference packages
    # imported above stay fully usable: they live in sys.modules, and any
    # lazy submodule import they perform at call time resolves through the
    # parent package's __path__ (which points into /root/reference), not
    # through sys.path.
    while REF_ROOT in sys.path:
        sys.path.remove(REF_ROOT)


# --------------------------------------------------------------------------
# ComputeLoss oracle
# --------------------------------------------------------------------------

NC, NA = 4, 3
SIZES = ((8, 8), (4, 4), (2, 2))
STRIDES = (8, 16, 32)
ANCHORS_GRID = np.array(
    [
        [[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
        [[1.875, 3.8125], [3.875, 2.8125], [3.6875, 7.4375]],
        [[3.625, 2.8125], [4.875, 6.1875], [11.65625, 10.1875]],
    ],
    np.float32,
)

BASE_HYP = {
    "box": 0.05,
    "obj": 1.0,
    "cls": 0.5,
    "cls_pw": 1.0,
    "obj_pw": 1.0,
    "fl_gamma": 0.0,
    "slide_ratio": 0,
    "nwdloss": 0,
    "shapeloss": 0,
    "anchor_t": 4.0,
    "label_smoothing": 0.0,
}


class _RefDet(nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer("anchors", torch.tensor(ANCHORS_GRID))
        self.nl, self.na, self.nc = 3, NA, NC
        self.stride = torch.tensor([float(s) for s in STRIDES])


class _RefLossModel(nn.Module):
    def __init__(self, hyp):
        super().__init__()
        self.hyp = hyp
        self.model = nn.ModuleList([_RefDet()])
        self._p = nn.Parameter(torch.zeros(1))


class _OurMeta:
    nc, na, nl = NC, NA, 3
    anchors_grid = ANCHORS_GRID


def _loss_inputs(seed=0, bs=2, n_labels=(6, 5)):
    rng = np.random.default_rng(seed)
    preds = []
    for ny, nx in SIZES:
        preds.append(rng.standard_normal((bs, NA, ny, nx, NC + 5)).astype(np.float32))
    per_image = []
    for b in range(bs):
        n = n_labels[b % len(n_labels)]
        rows = np.zeros((n, 5), np.float32)
        rows[:, 0] = rng.integers(0, NC, n)
        rows[:, 1:3] = rng.uniform(0.15, 0.85, (n, 2))
        rows[:, 3:5] = rng.uniform(0.08, 0.5, (n, 2))
        per_image.append(rows)
    return preds, per_image


def _torch_targets(per_image):
    rows = []
    for b, labs in enumerate(per_image):
        if len(labs):
            t = np.concatenate([np.full((len(labs), 1), b, np.float32), labs], 1)
            rows.append(t)
    return torch.from_numpy(np.concatenate(rows, 0) if rows else np.zeros((0, 6), np.float32))


def _run_both_losses(hyp_extra, seed=0, n_labels=(6, 5)):
    preds, per_image = _loss_inputs(seed=seed, n_labels=n_labels)
    hyp_ref = dict(BASE_HYP, **{k: v for k, v in hyp_extra.items() if k != "nwd_ref_defect"})
    hyp_ours = dict(BASE_HYP, **hyp_extra)

    ref = ref_loss.ComputeLoss(_RefLossModel(hyp_ref))
    t_preds = [torch.from_numpy(p) for p in preds]
    t_total, t_comps = ref(t_preds, _torch_targets(per_image))

    ours = our_losses.ComputeLoss(_OurMeta(), hyp_ours)
    j_preds = [jnp.asarray(p.transpose(0, 2, 3, 1, 4)) for p in preds]
    j_targets = jnp.asarray(our_losses.pad_targets([np.asarray(x) for x in per_image], 8))
    j_total, j_comps = ours(j_preds, j_targets)
    return (
        float(t_total),
        np.asarray(t_comps.squeeze()),
        float(j_total),
        np.asarray(j_comps),
    )


@pytest.mark.parametrize(
    "name,extra",
    [
        ("base", {}),
        ("pos_weight", {"cls_pw": 1.3, "obj_pw": 0.7}),
        ("smoothing", {"label_smoothing": 0.1}),
        ("focal", {"fl_gamma": 1.5}),
        ("slide", {"slide_ratio": 0.5}),
        ("focal_slide", {"fl_gamma": 1.5, "slide_ratio": 0.5}),
        ("nwd", {"nwdloss": 1, "nwd_ref_defect": True}),
        ("nwd_shape", {"nwdloss": 1, "shapeloss": 1, "nwd_ref_defect": True}),
    ],
)
def test_compute_loss_oracle(name, extra):
    """Total + per-component loss equals the reference's ComputeLoss
    (utils/loss.py:112-262) on identical preds/targets, per hyp branch."""
    t_total, t_comps, j_total, j_comps = _run_both_losses(extra)
    np.testing.assert_allclose(j_comps, t_comps, rtol=1e-3, atol=2e-5, err_msg=name)
    np.testing.assert_allclose(j_total, t_total, rtol=1e-3, atol=5e-5, err_msg=name)


def test_compute_loss_oracle_empty_image():
    """One empty image in the batch (reference nt==0 level branch)."""
    t_total, t_comps, j_total, j_comps = _run_both_losses({}, seed=3, n_labels=(6, 0))
    np.testing.assert_allclose(j_comps, t_comps, rtol=1e-3, atol=2e-5)


def test_nwd_defect_flag_changes_result():
    """Sanity: the corrected (default) NWD interpretation is numerically
    different from the reference's xywh-as-xyxy defect path."""
    _, _, j_def, _ = _run_both_losses({"nwdloss": 1, "nwd_ref_defect": True})
    _, _, j_fix, _ = _run_both_losses({"nwdloss": 1})
    assert abs(j_def - j_fix) > 1e-4


# --------------------------------------------------------------------------
# IoU / NWD function oracles
# --------------------------------------------------------------------------


def _rand_boxes(rng, n, xyxy=True):
    xy = rng.uniform(5, 100, (n, 2)).astype(np.float32)
    wh = rng.uniform(2, 40, (n, 2)).astype(np.float32)
    if xyxy:
        return np.concatenate([xy, xy + wh], 1)
    return np.concatenate([xy + wh / 2, wh], 1)


@pytest.mark.parametrize("flavor", ["IoU", "GIoU", "DIoU", "CIoU", "SIoU", "EIoU"])
def test_bbox_iou_oracle(flavor):
    """Pairwise IoU flavors vs the reference mega-function
    (utils/metrics.py:476-583), xyxy mode."""
    rng = np.random.default_rng(11)
    a = _rand_boxes(rng, 64)
    b = a + rng.uniform(-8, 8, a.shape).astype(np.float32)
    kw = {} if flavor == "IoU" else {flavor: True}
    ref = ref_metrics.bbox_iou(torch.from_numpy(a.T), torch.from_numpy(b), x1y1x2y2=True, **kw)
    ours = our_iou.bbox_iou(jnp.asarray(a), jnp.asarray(b), xywh=False, **kw)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref).squeeze(), rtol=2e-5, atol=2e-6, err_msg=flavor
    )


def test_bbox_iou_oracle_xywh_ciou():
    """CIoU in center format — the exact call ComputeLoss makes
    (utils/loss.py:161)."""
    rng = np.random.default_rng(12)
    a = _rand_boxes(rng, 64, xyxy=False)
    b = a + rng.uniform(-3, 3, a.shape).astype(np.float32)
    ref = ref_metrics.bbox_iou(torch.from_numpy(a.T), torch.from_numpy(b), x1y1x2y2=False, CIoU=True)
    ours = our_iou.bbox_iou(jnp.asarray(a), jnp.asarray(b), xywh=True, CIoU=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref).squeeze(), rtol=2e-5, atol=2e-6)


def test_bbox_iou_oracle_xywh_ciou_zero_size_grads():
    """Degenerate (w or h == 0) predictions, value AND gradient vs the
    reference: its +eps on heights (metrics.py:184-185) is what keeps
    CIoU's arctan backward finite — the round-3 silent-skip root cause."""
    import jax

    preds = np.array(
        [[5.0, 5.0, 2.0, 0.0], [5.0, 5.0, 0.0, 2.0], [5.0, 5.0, 0.0, 0.0]], np.float32
    )
    tgts = np.array(
        [[5.0, 5.0, 3.0, 3.0], [5.5, 5.5, 2.0, 2.0], [4.0, 4.0, 1.0, 1.0]], np.float32
    )
    def both(p_np):
        tp = torch.from_numpy(p_np.copy()).requires_grad_(True)
        ref = ref_metrics.bbox_iou(tp.T, torch.from_numpy(tgts), x1y1x2y2=False, CIoU=True)
        (1.0 - ref).sum().backward()
        ours, g = jax.value_and_grad(
            lambda p: (1.0 - our_iou.bbox_iou(p, jnp.asarray(tgts), xywh=True, CIoU=True)).sum()
        )(jnp.asarray(p_np))
        return float((1.0 - ref).sum()), np.asarray(tp.grad), float(ours), np.asarray(g)

    # exactly-zero extents: value parity + finite grads on both sides
    # (grad VALUES legitimately differ here — max/clamp subgradient
    # tie-break conventions diverge at the measure-zero boundary:
    # jnp.maximum splits ties 0.5/0.5, torch.clamp routes 1.0)
    ref_v, ref_g, our_v, our_g = both(preds)
    assert np.isfinite(ref_g).all() and np.isfinite(our_g).all()
    np.testing.assert_allclose(our_v, ref_v, rtol=1e-5)

    # near-zero extents (off the tie): full gradient parity
    ref_v, ref_g, our_v, our_g = both(preds + np.float32(1e-4))
    np.testing.assert_allclose(our_v, ref_v, rtol=1e-5)
    np.testing.assert_allclose(our_g, ref_g, rtol=1e-3, atol=1e-4)


def test_wasserstein_oracle():
    """NWD similarity fns vs reference (utils/metrics.py:341-395)."""
    rng = np.random.default_rng(13)
    a = _rand_boxes(rng, 128)
    b = a + rng.uniform(-10, 10, a.shape).astype(np.float32)
    ref_plain = ref_metrics.wasserstein_loss(torch.from_numpy(a), torch.from_numpy(b))
    ours_plain = our_iou.wasserstein_loss(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(ours_plain), np.asarray(ref_plain).squeeze(-1), rtol=1e-5, atol=1e-6
    )
    ref_shape = ref_metrics.wasserstein(torch.from_numpy(a), torch.from_numpy(b))
    ours_shape = our_iou.wasserstein(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(ours_shape), np.asarray(ref_shape).squeeze(-1), rtol=1e-5, atol=1e-6
    )


# --------------------------------------------------------------------------
# metrics protocol oracle
# --------------------------------------------------------------------------


def _extract_ref_process_batch():
    """val.py imports a CUDA-era dependency chain; its process_batch
    (val.py:50-71) is self-contained, so execute just that function."""
    src = open(os.path.join(REF_ROOT, "val.py")).read()
    tree = ast.parse(src)
    fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == "process_batch")
    mod = ast.Module(body=[fn], type_ignores=[])
    ns = {"torch": torch, "np": np, "box_iou": ref_metrics.box_iou}
    exec(compile(ast.fix_missing_locations(mod), "<reference val.py>", "exec"), ns)
    return ns["process_batch"]


def _synthetic_eval_set(seed=21, n_labels=40, n_preds=120, nc=5):
    rng = np.random.default_rng(seed)
    labels = np.zeros((n_labels, 5), np.float32)
    labels[:, 0] = rng.integers(0, nc, n_labels)
    labels[:, 1:] = _rand_boxes(rng, n_labels)
    dets = np.zeros((n_preds, 6), np.float32)
    # half the preds jitter real labels, half are noise
    for i in range(n_preds):
        if i < n_labels and rng.random() < 0.7:
            dets[i, :4] = labels[i, 1:] + rng.uniform(-6, 6, 4)
            dets[i, 5] = labels[i, 0] if rng.random() < 0.8 else rng.integers(0, nc)
        else:
            dets[i, :4] = _rand_boxes(rng, 1)[0]
            dets[i, 5] = rng.integers(0, nc)
        dets[i, 4] = rng.random()
    return dets, labels


def test_process_batch_oracle():
    dets, labels = _synthetic_eval_set()
    iouv = np.linspace(0.5, 0.95, 10).astype(np.float32)
    ref_pb = _extract_ref_process_batch()
    ref_correct = ref_pb(
        torch.from_numpy(dets), torch.from_numpy(labels), torch.from_numpy(iouv)
    ).numpy()
    our_correct = our_metrics.process_batch(dets, labels, iouv)
    np.testing.assert_array_equal(our_correct, ref_correct)


def test_ap_per_class_oracle(tmp_path):
    """Full mAP protocol on a multi-image synthetic eval: tp matrices from
    each side's process_batch, curves/AP/F1-argmax from each side's
    ap_per_class (reference utils/metrics.py:21-95)."""
    iouv = np.linspace(0.5, 0.95, 10).astype(np.float32)
    ref_pb = _extract_ref_process_batch()
    tps, confs, pcls, tcls = [], [], [], []
    for s in range(4):
        dets, labels = _synthetic_eval_set(seed=100 + s)
        tp = ref_pb(torch.from_numpy(dets), torch.from_numpy(labels), torch.from_numpy(iouv)).numpy()
        tps.append(tp)
        confs.append(dets[:, 4])
        pcls.append(dets[:, 5])
        tcls.append(labels[:, 0])
    tp = np.concatenate(tps)
    conf = np.concatenate(confs)
    pred_cls = np.concatenate(pcls)
    target_cls = np.concatenate(tcls)
    names = {i: str(i) for i in range(5)}

    rp, rr, rap, rf1, rcls = ref_metrics.ap_per_class(
        tp, conf, pred_cls, target_cls, plot=False, save_dir=str(tmp_path), names=names
    )
    op, orr, oap, of1, ocls = our_metrics.ap_per_class(
        tp, conf, pred_cls, target_cls, plot=False, save_dir=str(tmp_path), names=names
    )
    np.testing.assert_array_equal(ocls, rcls)
    np.testing.assert_allclose(oap, rap, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(op, rp, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(orr, rr, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(of1, rf1, rtol=1e-7, atol=1e-10)


def test_compute_ap_oracle():
    rng = np.random.default_rng(31)
    recall = np.sort(rng.uniform(0, 1, 50))
    precision = np.clip(1 - recall + rng.normal(0, 0.1, 50), 0, 1)
    r_ap, r_mpre, r_mrec = ref_metrics.compute_ap(recall, precision)
    o_ap, o_mpre, o_mrec = our_metrics.compute_ap(recall, precision)
    np.testing.assert_allclose(o_ap, r_ap, rtol=1e-10)
    np.testing.assert_allclose(o_mpre, r_mpre)
    np.testing.assert_allclose(o_mrec, r_mrec)


# --------------------------------------------------------------------------
# geometry oracles
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,new_shape,kw",
    [
        ((480, 640), (640, 640), {}),
        ((771, 333), (640, 640), {}),
        ((100, 1000), (640, 640), {"auto": False}),
        ((480, 640), (320, 416), {"auto": False}),
        ((480, 640), (640, 640), {"scaleFill": True}),
        ((200, 300), (640, 640), {"scaleup": False}),
        ((480, 640), (640, 640), {"stride": 64}),
    ],
)
def test_letterbox_oracle(shape, new_shape, kw):
    """Byte-exact letterbox parity (reference: augmentations.py:92-124)."""
    rng = np.random.default_rng(41)
    im = rng.integers(0, 255, (*shape, 3), dtype=np.uint8)
    r_im, r_ratio, r_pad = ref_aug.letterbox(im.copy(), new_shape, **kw)
    our_kw = {("scale_fill" if k == "scaleFill" else k): v for k, v in kw.items()}
    o_im, o_ratio, o_pad = our_aug.letterbox(im.copy(), new_shape, **our_kw)
    assert o_im.shape == r_im.shape
    np.testing.assert_array_equal(o_im, r_im)
    np.testing.assert_allclose(o_ratio, r_ratio)
    np.testing.assert_allclose(o_pad, r_pad)


@pytest.mark.parametrize(
    "seed,kw",
    [
        (1, {}),
        (2, {"degrees": 8, "translate": 0.2, "scale": 0.4, "shear": 6}),
        (3, {"perspective": 0.0005}),
        (4, {"border": (-32, -32)}),
    ],
)
def test_random_perspective_oracle(seed, kw):
    """Seeded draw-for-draw parity of the affine/perspective warp + label
    filter (reference: augmentations.py:125-212; both implementations draw
    from `random.uniform` in the same order)."""
    rng = np.random.default_rng(50 + seed)
    im = rng.integers(0, 255, (128, 160, 3), dtype=np.uint8)
    n = 12
    targets = np.zeros((n, 5), np.float32)
    targets[:, 0] = rng.integers(0, 4, n)
    xy = rng.uniform(5, 100, (n, 2))
    wh = rng.uniform(4, 40, (n, 2))
    targets[:, 1:3] = xy
    targets[:, 3:5] = xy + wh

    pyrandom.seed(seed)
    r_im, r_t = ref_aug.random_perspective(im.copy(), targets.copy(), **kw)
    pyrandom.seed(seed)
    o_im, o_t = our_aug.random_perspective(im.copy(), targets.copy(), **kw)
    np.testing.assert_array_equal(o_im, r_im)
    assert o_t.shape == r_t.shape
    np.testing.assert_allclose(o_t, r_t, rtol=1e-5, atol=1e-4)


# --------------------------------------------------------------------------
# autoanchor oracle
# --------------------------------------------------------------------------


class _FakeDataset:
    def __init__(self, rng, n_imgs=40, n_labels=8):
        self.shapes = rng.integers(480, 1280, (n_imgs, 2)).astype(np.float64)
        self.labels = []
        for _ in range(n_imgs):
            l = np.zeros((n_labels, 5), np.float32)
            l[:, 0] = rng.integers(0, 5, n_labels)
            l[:, 1:3] = rng.uniform(0.2, 0.8, (n_labels, 2))
            l[:, 3:5] = rng.uniform(0.01, 0.5, (n_labels, 2))
            self.labels.append(l)


def test_kmean_anchors_oracle():
    """Same seed -> same scipy kmeans + GA trajectory -> same anchors; BPR
    cross-checked against the value the reference itself prints
    (utils/autoanchor.py:73-131)."""
    rng = np.random.default_rng(61)
    ds = _FakeDataset(rng)
    img_size, n, thr, gen = 320, 5, 4.0, 40

    shapes = img_size * ds.shapes / ds.shapes.max(1, keepdims=True)
    wh0 = np.concatenate([l[:, 3:5] * s for s, l in zip(shapes, ds.labels)])

    buf = io.StringIO()
    np.random.seed(7)
    pyrandom.seed(7)
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(io.StringIO()):
        k_ref = ref_autoanchor.kmean_anchors(
            dataset=ds, n=n, img_size=img_size, thr=thr, gen=gen, verbose=False
        )
    np.random.seed(7)
    pyrandom.seed(7)
    k_ours = our_autoanchor.kmean_anchors(wh0.copy(), n=n, thr=thr, gen=gen)
    np.testing.assert_allclose(np.asarray(k_ours), np.asarray(k_ref), rtol=1e-4)

    # BPR the reference printed (over wh0, print_results) vs our metric
    bprs = re.findall(r"([0-9.]+) best possible recall", buf.getvalue())
    assert bprs, buf.getvalue()
    ref_bpr = float(bprs[-1])
    x, best = our_autoanchor._metric(np.asarray(k_ours), wh0)
    our_bpr = float((best > 1 / thr).mean())
    assert abs(our_bpr - ref_bpr) < 5e-4, (our_bpr, ref_bpr)


# --------------------------------------------------------------------------
# head + full-model oracles
# --------------------------------------------------------------------------


def _randomize_sd(model, skip=("anchor", "stride")):
    g = torch.Generator().manual_seed(0)
    sd = model.state_dict()
    for k, v in sd.items():
        if not v.dtype.is_floating_point or any(s in k for s in skip):
            continue
        if "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=g) * 2 + 0.5
        elif "running_mean" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.2
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    model.load_state_dict(sd)
    # .copy(): .numpy() aliases the live parameter memory, so a later
    # in-place mutation of the module (IDetect.fuse) would silently
    # rewrite this snapshot too
    return {k: v.numpy().copy() for k, v in model.state_dict().items()}


def _reorder_ref_rows(z, maps, na, no):
    """Reference decode flattens (na, ny, nx); ours (ny, nx, na).
    `maps` are the reference's eval-mode raw maps, already permuted to
    (bs, na, ny, nx, no) (yolo.py:74/955)."""
    out, off = [], 0
    for m in maps:
        ny, nx = m.shape[2], m.shape[3]
        n = na * ny * nx
        blk = z[:, off : off + n].reshape(-1, na, ny, nx, no)
        out.append(blk.transpose(0, 2, 3, 1, 4).reshape(z.shape[0], -1, no))
        off += n
    assert off == z.shape[1]
    return np.concatenate(out, 1)


def test_decoupled_detect_oracle():
    """The SOMI head: reference DecoupledDetect+Decouple forward and grid
    decode (models/yolo.py:925-1074) vs ours through the weight converter."""
    nc = 7
    anchors_px = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]]
    strides = [8, 16]
    anchors_grid = [
        [a / s for a in level] for level, s in zip(anchors_px, strides)
    ]
    det = ref_yolo.DecoupledDetect(nc=nc, anchors=anchors_grid, ch=(64, 128))
    det.stride = torch.tensor([float(s) for s in strides])
    for m in det.modules():  # the reference sets these in initialize_weights
        if isinstance(m, nn.BatchNorm2d):
            m.eps, m.momentum = 1e-3, 0.03
    sd = _randomize_sd(det)
    det.eval()

    rng = np.random.default_rng(71)
    feats = [
        rng.standard_normal((1, 16, 16, 64)).astype(np.float32),
        rng.standard_normal((1, 8, 8, 128)).astype(np.float32),
    ]
    with torch.no_grad():
        r_z, r_maps = det([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])

    ours = OurDecoupledDetect(nc=nc, anchors=tuple(tuple(a) for a in anchors_px), strides=tuple(strides))
    variables = ours.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats], False)
    variables = convert_state_dict(sd, variables, strict=True)
    j_maps = ours.apply(variables, [jnp.asarray(f) for f in feats], False)

    # raw map parity (reference maps come back (bs, na, ny, nx, no))
    for lvl, (rm, jm) in enumerate(zip(r_maps, j_maps)):
        rm = rm.permute(0, 2, 3, 1, 4).numpy()
        np.testing.assert_allclose(np.asarray(jm), rm, atol=2e-3, rtol=1e-3, err_msg=f"level {lvl}")

    # decoded parity
    apx = np.asarray(anchors_px, np.float32).reshape(2, 3, 2)
    dec = np.asarray(our_decode(j_maps, apx, strides))
    ref_rows = _reorder_ref_rows(r_z.numpy(), r_maps, 3, nc + 5)
    np.testing.assert_allclose(dec[..., :4], ref_rows[..., :4], atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(dec[..., 4:], ref_rows[..., 4:], atol=2e-3)


@pytest.fixture(scope="module")
def v5s_oracle_pair():
    cfg_path = find_config("yolov5s")
    ref_model = ref_yolo.Model(str(cfg_path), ch=3, nc=80)
    sd = _randomize_sd(ref_model)
    ref_model.eval()

    cfg = load_model_cfg(cfg_path)
    model, meta = build_model(cfg, nc=80)
    variables = init_model(model, meta, imgsz=64)
    variables = convert_state_dict(sd, variables)
    return ref_model, sd, model, meta, variables


def test_full_yolov5s_oracle_coverage(v5s_oracle_pair):
    """Every reference parameter/buffer (minus anchors + BN bookkeeping)
    lands on one of our leaves — converter coverage vs the REAL graph
    compiler's state_dict, not a re-implementation's."""
    ref_model, sd, model, meta, variables = v5s_oracle_pair
    n_torch = sum(
        1 for k in sd if "num_batches_tracked" not in k and "anchor" not in k
    )
    n_ours = len(jax.tree_util.tree_leaves(variables))
    assert n_ours == n_torch, (n_ours, n_torch)


def test_full_yolov5s_oracle_forward(v5s_oracle_pair):
    """End-to-end: reference Model (its own parse_model/Focus/C3/SPPF/
    Detect, yolo.py:1164-1664) vs our build_model, same weights, same
    input, decoded boxes compared."""
    ref_model, sd, model, meta, variables = v5s_oracle_pair
    rng = np.random.default_rng(81)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        r_z, r_maps = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    j_maps = model.apply(variables, jnp.asarray(x), False)
    for lvl, (rm, jm) in enumerate(zip(r_maps, j_maps)):
        rm = rm.permute(0, 2, 3, 1, 4).numpy()
        np.testing.assert_allclose(np.asarray(jm), rm, atol=2e-3, rtol=1e-3, err_msg=f"level {lvl}")

    dec = np.asarray(our_decode(j_maps, meta.anchors_px, meta.strides))
    ref_rows = _reorder_ref_rows(r_z.numpy(), r_maps, 3, 85)
    np.testing.assert_allclose(dec[..., :4], ref_rows[..., :4], atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(dec[..., 4:], ref_rows[..., 4:], atol=2e-3)


# --------------------------------------------------------------------------
# FULL FLAGSHIP oracle: the YOLO-SOMI graph through the reference's own
# Model/parse_model/blocks vs ours, shared weights via the converter.
#
# The reference cannot build its own flagship as shipped — three latent
# defects, each verified here on this checkout:
#   (1) YOLO-SOMI.yaml spells the head blocks C2fEACBAM, a class that does
#       not exist (actual: C2fEMACBAM, common.py:3594) -> NameError;
#   (2) even aliased, parse_model has NO rewrite rule for C2fEMACBAM, so
#       rows like [256] reach the ctor without c1/n -> TypeError, and the
#       DecoupledDetect branch references an undefined name `Segment`
#       (yolo.py:1620) -> NameError;
#   (3) EMACBAMBottleneck.forward pipes the (b*g, c/g, h+w, 1) pooled
#       profile into conv_spatial = Conv2d(2, 1, 7) (common.py:918,937),
#       which crashes whenever c2 != 2*factor — i.e. at EVERY width the
#       flagship YAML produces.
# The fixture patches exactly those three: C2f -> C2fEMACBAM rebind (same
# ctor contract; C2f sits in both rewrite lists), a Segment sentinel, and
# our repaired EMACBAM block in torch form (the documented interpretation
# shared by models/layers.py and the ONNX mirror). Everything else —
# parse_model, Conv, C2fCBAM/CBAM, ODConv_3rd, SEAM, SPPF, BiFPN,
# DecoupledDetect/Decouple, stride calibration — is the reference's own
# code.
# --------------------------------------------------------------------------

FLAGSHIP_ANCHORS = [
    [4, 5, 8, 10, 13, 16, 23, 29],
    [30, 33, 38, 48, 62, 45, 59, 80],
    [90, 70, 116, 90, 156, 128, 100, 140],
    [200, 180, 250, 250, 300, 150, 150, 300],
]


@pytest.fixture(scope="module")
def flagship_oracle_pair():
    import copy
    import yaml as _yaml

    import models.common as ref_common
    from yolosomi_tpu.utils.torch_mirror import TEMACBAMBottleneck

    nc = 3
    cfg = copy.deepcopy(load_model_cfg(find_config("yolo-somi")))
    cfg["nc"] = nc
    cfg["depth_multiple"] = 0.33
    cfg["width_multiple"] = 0.25
    cfg["anchors"] = FLAGSHIP_ANCHORS

    refcfg = copy.deepcopy(cfg)
    for section in ("backbone", "head"):
        for row in refcfg[section]:
            if row[2] == "C2fEMACBAM":
                row[2] = "C2f"

    class _RepairedEMACBAM(TEMACBAMBottleneck):
        def __init__(self, c1, c2, shortcut=True, g=1, e=0.5, k=(3, 3), ratio=16, kernel_size=7, factor=8):
            super().__init__(c2, e=e, factor=factor)

    saved = {
        "C2f": getattr(ref_yolo, "C2f", None),
        "Segment": getattr(ref_yolo, "Segment", None),
        "EMACBAM": ref_common.EMACBAMBottleneck,
    }
    # The monkeypatches are needed ONLY while the reference's parse_model
    # evals the YAML class names; restore them the moment the Model object
    # exists (its modules hold direct class references). This fixture is
    # module-scoped: deferring the restore to fixture TEARDOWN (end of
    # module) left ref_yolo.C2f pointing at C2fEMACBAM for every later
    # test in the file and corrupted the reference's own yolov10 build
    # (the round-3/4 order-dependent KeyError).
    ref_yolo.C2f = ref_common.C2fEMACBAM
    ref_yolo.Segment = type("Segment", (), {})
    ref_common.EMACBAMBottleneck = _RepairedEMACBAM
    ref_yolo.EMACBAMBottleneck = _RepairedEMACBAM
    try:
        with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
            _yaml.safe_dump(refcfg, f)
            ref_yaml = f.name
        ref_model = ref_yolo.Model(ref_yaml, ch=3, nc=nc)
    finally:
        for name, val in (("C2f", saved["C2f"]), ("Segment", saved["Segment"])):
            if val is None:
                delattr(ref_yolo, name)
            else:
                setattr(ref_yolo, name, val)
        ref_common.EMACBAMBottleneck = saved["EMACBAM"]
        ref_yolo.EMACBAMBottleneck = saved["EMACBAM"]
    sd = _randomize_sd(ref_model)
    ref_model.eval()

    model, meta = build_model(cfg, nc=nc)
    variables = init_model(model, meta, imgsz=128)
    variables = convert_state_dict(sd, variables, strict=True)
    yield ref_model, sd, model, meta, variables


def test_full_flagship_oracle_coverage(flagship_oracle_pair):
    """strict=True in the fixture already asserts every one of OUR leaves
    is filled from the reference state_dict. The reverse direction: the
    only reference params NOT consumed are ODConv's `reduction` Linear —
    dead code in the reference (defined at common.py:4523, never used in
    Attention.forward, which uses `fc`)."""
    ref_model, sd, model, meta, variables = flagship_oracle_pair
    from yolosomi_tpu.utils.torch_convert import _torch_key_candidates

    used = set()
    for collection in ("params", "batch_stats"):
        flat, _ = jax.tree_util.tree_flatten_with_path(variables.get(collection, {}))
        for path, leaf in flat:
            keys = [p.key if hasattr(p, "key") else str(p) for p in path]
            for tk in _torch_key_candidates(keys, collection):
                if tk in sd:
                    used.add(tk)
                    break
    unused = sorted(
        k for k in sd
        if k not in used and "num_batches_tracked" not in k and "anchor" not in k
    )
    assert all(".conv.reduction." in k for k in unused), unused
    assert len(unused) == 8, unused  # 4 ODConv sites x (weight, bias)


def test_full_flagship_oracle_forward(flagship_oracle_pair):
    """The SOMI flagship forward: reference Model (its own parse_model,
    ODConv_3rd, C2fCBAM, SEAM, SPPF, BiFPN, DecoupledDetect) vs our
    build_model, same weights, same input — raw maps and decoded boxes."""
    ref_model, sd, model, meta, variables = flagship_oracle_pair
    rng = np.random.default_rng(91)
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)

    with torch.no_grad():
        r_z, r_maps = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    j_maps = model.apply(variables, jnp.asarray(x), False)
    for lvl, (rm, jm) in enumerate(zip(r_maps, j_maps)):
        rm = rm.permute(0, 2, 3, 1, 4).numpy()
        np.testing.assert_allclose(np.asarray(jm), rm, atol=2e-3, rtol=1e-3, err_msg=f"level {lvl}")

    na = meta.anchors_px.shape[1]
    dec = np.asarray(our_decode(j_maps, meta.anchors_px, meta.strides))
    ref_rows = _reorder_ref_rows(r_z.numpy(), r_maps, na, nc_no := 3 + 5)
    np.testing.assert_allclose(dec[..., :4], ref_rows[..., :4], atol=2e-1, rtol=1e-3)
    np.testing.assert_allclose(dec[..., 4:], ref_rows[..., 4:], atol=2e-3)


def test_decouple_taper_matches_torch_linspace():
    """decouple_taper replicates torch.linspace(1,0,4)-in-f32 exactly —
    the c_=128 case (yolo-somi-s-width heads) truncates to 91, not the 92
    float64 fractions give (reference: yolo.py:1049-1051)."""
    from yolosomi_tpu.models.heads import decouple_taper

    for c1 in (64, 128, 192, 256, 512):
        c_ = min(c1, 256)
        for na in (3, 4):
            ref = [int(x + na * 5) for x in (c_ - na * 5) * torch.linspace(1, 0, 4)]
            assert decouple_taper(c_, na * 5) == ref, (c1, na)


# --------------------------------------------------------------------------
# remaining head-family oracles: IDetect / IAuxDetect / ASFF / CLLA
# --------------------------------------------------------------------------

HEAD_ANCHORS_PX = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]]
HEAD_STRIDES = [8, 16]


def _head_grid_anchors(anchors_px=HEAD_ANCHORS_PX, strides=HEAD_STRIDES):
    return [[a / s for a in level] for level, s in zip(anchors_px, strides)]


def _prep_ref_head(det, strides=HEAD_STRIDES):
    """What the reference Model does to a fresh head: stride buffer +
    initialize_weights' BN eps/momentum (torch_utils.py)."""
    det.stride = torch.tensor([float(s) for s in strides])
    for m in det.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.eps, m.momentum = 1e-3, 0.03
    return det


def _assert_head_parity(r_z, r_maps, j_maps, na, no, anchors_px=HEAD_ANCHORS_PX, strides=HEAD_STRIDES):
    for lvl, (rm, jm) in enumerate(zip(r_maps, j_maps)):
        rm = rm.permute(0, 2, 3, 1, 4).numpy()
        np.testing.assert_allclose(np.asarray(jm), rm, atol=2e-3, rtol=1e-3, err_msg=f"level {lvl}")
    apx = np.asarray(anchors_px, np.float32).reshape(len(strides), na, 2)
    dec = np.asarray(our_decode(j_maps, apx, strides))
    ref_rows = _reorder_ref_rows(r_z.numpy(), r_maps, na, no)
    np.testing.assert_allclose(dec[..., :4], ref_rows[..., :4], atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(dec[..., 4:], ref_rows[..., 4:], atol=2e-3)


def test_idetect_oracle():
    """YOLOv7 implicit head vs the reference's own FUSED deploy path
    (fuse() + fuseforward, yolo.py:477-491): fuse folds ImplicitA into the
    conv bias and ImplicitM into weight+bias, so the fused conv IS
    ia->conv->im — which is what our forward computes explicitly (and
    what upstream YOLOv7's forward computes). The golden is the fused
    path because this reference's UNFUSED IDetect.forward (yolo.py:410)
    drops the ImplicitM multiply entirely — a latent defect that makes
    its own fused and unfused inference disagree; documented in
    PARITY.md. (Its non-inplace decode branch also omits the -0.5 xy
    shift, yolo.py:427 — fuseforward uses the standard branch.)

    Anchor units: unlike Detect/DecoupledDetect (which recompute
    anchor_grid = anchors * stride per level, yolo.py:107), IDetect
    registers anchor_grid VERBATIM from its constructor arg
    (yolo.py:400) and Model rescales only m.anchors (yolo.py:1203) —
    so the real pipeline hands the constructor PIXEL anchors and the
    decode reads pixels. The oracle must do the same."""
    from yolosomi_tpu.models.heads import IDetect as OurIDetect

    nc = 7
    det = _prep_ref_head(ref_yolo.IDetect(nc=nc, anchors=HEAD_ANCHORS_PX, ch=(64, 128)))
    sd = _randomize_sd(det)
    det.eval()
    det.fuse()

    rng = np.random.default_rng(73)
    feats = [
        rng.standard_normal((1, 16, 16, 64)).astype(np.float32),
        rng.standard_normal((1, 8, 8, 128)).astype(np.float32),
    ]
    with torch.no_grad():
        r_z, r_maps = det.fuseforward([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])

    ours = OurIDetect(nc=nc, anchors=tuple(tuple(a) for a in HEAD_ANCHORS_PX), strides=tuple(HEAD_STRIDES))
    variables = ours.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats], False)
    variables = convert_state_dict(sd, variables, strict=True)
    j_maps = ours.apply(variables, [jnp.asarray(f) for f in feats], False)
    _assert_head_parity(r_z, r_maps, j_maps, 3, nc + 5)


def test_iauxdetect_oracle_train_maps():
    """IAuxDetect (yolo.py:506-560): training-mode lead+aux raw maps —
    the aux plane only exists in training (the loss weights it 0.25)."""
    from yolosomi_tpu.models.heads import IAuxDetect as OurIAuxDetect

    nc = 5
    det = _prep_ref_head(
        ref_yolo.IAuxDetect(nc=nc, anchors=_head_grid_anchors(), ch=(64, 128, 64, 128))
    )
    sd = _randomize_sd(det)
    det.train()

    rng = np.random.default_rng(74)
    feats = [
        rng.standard_normal((1, 16, 16, 64)).astype(np.float32),
        rng.standard_normal((1, 8, 8, 128)).astype(np.float32),
        rng.standard_normal((1, 16, 16, 64)).astype(np.float32),
        rng.standard_normal((1, 8, 8, 128)).astype(np.float32),
    ]
    with torch.no_grad():
        r_maps = det([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])
    assert len(r_maps) == 4

    ours = OurIAuxDetect(nc=nc, anchors=tuple(tuple(a) for a in HEAD_ANCHORS_PX), strides=tuple(HEAD_STRIDES))
    variables = ours.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats], True)
    variables = convert_state_dict(sd, variables, strict=True)
    j_maps = ours.apply(variables, [jnp.asarray(f) for f in feats], True)
    assert len(j_maps) == 4
    for lvl, (rm, jm) in enumerate(zip(r_maps, j_maps)):
        rm = rm.permute(0, 2, 3, 1, 4).numpy()
        np.testing.assert_allclose(np.asarray(jm), rm, atol=2e-3, rtol=1e-3, err_msg=f"map {lvl}")


ASFF_ANCHORS_PX = [
    [10, 13, 16, 30, 33, 23],
    [30, 61, 62, 45, 59, 119],
    [116, 90, 156, 198, 373, 326],
]
ASFF_STRIDES = [8, 16, 32]


def test_asff_detect_oracle():
    """ASFF_Detect (yolo.py:172-185 + common.py:5322-5568): the sequential
    reversed fusion, add_conv's conv+BN+LeakyReLU(0.1) blocks (the SiLU
    deviation this oracle originally caught is fixed), and the Detect
    decode — at the reference's hardcoded dims [512,256,128]."""
    from yolosomi_tpu.models.heads import ASFFDetect as OurASFFDetect

    nc = 3
    grid_anchors = [[a / s for a in lvl] for lvl, s in zip(ASFF_ANCHORS_PX, ASFF_STRIDES)]
    det = _prep_ref_head(
        ref_yolo.ASFF_Detect(nc=nc, anchors=grid_anchors, ch=(128, 256, 512)), ASFF_STRIDES
    )
    sd = _randomize_sd(det)
    det.eval()

    rng = np.random.default_rng(75)
    feats = [
        rng.standard_normal((1, 16, 16, 128)).astype(np.float32),
        rng.standard_normal((1, 8, 8, 256)).astype(np.float32),
        rng.standard_normal((1, 4, 4, 512)).astype(np.float32),
    ]
    with torch.no_grad():
        r_z, r_maps = det([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])

    ours = OurASFFDetect(
        nc=nc, anchors=tuple(tuple(a) for a in ASFF_ANCHORS_PX), strides=tuple(ASFF_STRIDES)
    )
    variables = ours.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats], False)
    variables = convert_state_dict(sd, variables, strict=True)
    j_maps = ours.apply(variables, [jnp.asarray(f) for f in feats], False)
    _assert_head_parity(r_z, r_maps, j_maps, 3, nc + 5, ASFF_ANCHORS_PX, ASFF_STRIDES)


def test_clla_detect_oracle():
    """CLLADetect (yolo.py:258-380): level 0 is the CLLA cross-layer
    attention fusion of the two finest maps (inverted-relevance softmax,
    (out+x2)/2 blend), levels 1+ plain 1x1 convs."""
    from yolosomi_tpu.models.heads import CLLADetect as OurCLLADetect

    nc = 6
    det = _prep_ref_head(
        ref_yolo.CLLADetect(nc=nc, anchors=_head_grid_anchors(), ch=(64, 96, 128))
    )
    sd = _randomize_sd(det)
    det.eval()

    rng = np.random.default_rng(76)
    feats = [
        rng.standard_normal((1, 32, 32, 64)).astype(np.float32),
        rng.standard_normal((1, 16, 16, 96)).astype(np.float32),
        rng.standard_normal((1, 8, 8, 128)).astype(np.float32),
    ]
    with torch.no_grad():
        r_z, r_maps = det([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])

    ours = OurCLLADetect(nc=nc, anchors=tuple(tuple(a) for a in HEAD_ANCHORS_PX), strides=tuple(HEAD_STRIDES))
    variables = ours.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats], False)
    variables = convert_state_dict(sd, variables, strict=True)
    j_maps = ours.apply(variables, [jnp.asarray(f) for f in feats], False)
    _assert_head_parity(r_z, r_maps, j_maps, 3, nc + 5)


def test_tscode_detect_oracle():
    """TSCODE_Detect (yolo.py:631-722; SCE/DPE common.py:7770-7806): cls
    from SCE at half resolution pixel-shuffled back up (the einops
    rearrange), reg/conf from the DPE plane — raw maps and decoded rows.
    The reference's dead `DPE.middle` conv is the only unconsumed param."""
    from yolosomi_tpu.models.heads import TSCODEDetect as OurTSCODEDetect

    nc = 4
    anchors_px = [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
        [116, 90, 156, 198, 373, 326],
    ]
    strides = [8, 16, 32]
    grid_anchors = [[a / s for a in lvl] for lvl, s in zip(anchors_px, strides)]
    ch = (32, 48, 64, 96, 128)
    det = _prep_ref_head(ref_yolo.TSCODE_Detect(nc=nc, anchors=grid_anchors, ch=ch), strides)
    sd = _randomize_sd(det)
    det.eval()

    rng = np.random.default_rng(77)
    sizes = [32, 16, 8, 4, 2]
    feats = [
        rng.standard_normal((1, s, s, c)).astype(np.float32) for s, c in zip(sizes, ch)
    ]
    # yolo.py:680 references the undefined name `Segment` (the same latent
    # defect the flagship fixture patches) — sentinel it for the forward
    saved_seg = getattr(ref_yolo, "Segment", None)
    ref_yolo.Segment = type("Segment", (), {})
    try:
        with torch.no_grad():
            r_z, r_maps = det([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])
    finally:
        if saved_seg is None:
            delattr(ref_yolo, "Segment")
        else:
            ref_yolo.Segment = saved_seg

    ours = OurTSCODEDetect(
        nc=nc, anchors=tuple(tuple(a) for a in anchors_px), strides=tuple(strides)
    )
    variables = ours.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats], False)
    variables = convert_state_dict(sd, variables, strict=True)
    j_maps = ours.apply(variables, [jnp.asarray(f) for f in feats], False)
    _assert_head_parity(r_z, r_maps, j_maps, 3, nc + 5, anchors_px, strides)


def test_convert_torch_cli_end_to_end(v5s_oracle_pair, tmp_path):
    """The user migration path, end to end: a REAL whole-module .pt pickle
    of the reference Model (the format its train.py ships) -> the
    tools/convert_torch.py CLI -> .msgpack -> Runner -> decoded boxes
    matching the reference forward. Unpickling resolves models.yolo via
    the same stub surface the oracles use."""
    ref_model, sd, model, meta, variables = v5s_oracle_pair
    pt = tmp_path / "v5s.pt"
    torch.save({"model": ref_model, "epoch": 42, "ema": None}, str(pt))
    out = tmp_path / "v5s.msgpack"

    from tools.convert_torch import main as convert_main

    convert_main(["--pt", str(pt), "--cfg", "yolov5s", "--nc", "80", "--out", str(out)])
    assert out.exists() and out.stat().st_size > 1000

    from yolosomi_tpu.engine.runner import Runner

    runner = Runner("yolov5s", str(out), nc=80, imgsz=64)
    rng = np.random.default_rng(82)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        r_z, r_maps = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_maps = runner.model.apply(runner.variables, jnp.asarray(x), train=False)
    dec = np.asarray(our_decode(j_maps, runner.meta.anchors_px, runner.meta.strides))
    ref_rows = _reorder_ref_rows(r_z.numpy(), r_maps, 3, 85)
    # box rtol 5e-3: the (2*sigmoid)^2 wh decode doubles relative float
    # noise; observed worst case 0.16% on ~36px boxes through the full
    # save->CLI->load chain
    np.testing.assert_allclose(dec[..., :4], ref_rows[..., :4], atol=5e-2, rtol=5e-3)
    np.testing.assert_allclose(dec[..., 4:], ref_rows[..., 4:], atol=2e-3)


# --------------------------------------------------------------------------
# block-level oracles: distinctive zoo blocks vs the reference's own classes
# --------------------------------------------------------------------------


def _block_oracle(ref_block, our_module, cin, hw=16, seed=80, atol=2e-3, train_bn_eps=True):
    """Shared harness: randomize the reference block, convert, compare."""
    if train_bn_eps:
        for m in ref_block.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.eps, m.momentum = 1e-3, 0.03
    sd = _randomize_sd(ref_block)
    ref_block.eval()
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, hw, hw, cin)).astype(np.float32)
    with torch.no_grad():
        want = ref_block(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.permute(0, 2, 3, 1).numpy()

    variables = our_module.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    variables = convert_state_dict(sd, variables, strict=True)
    got = np.asarray(our_module.apply(variables, jnp.asarray(x), False))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


def test_sppcspc_oracle():
    """SPPCSPC (common.py:1908-1927): the YOLOv7 CSP-SPP neck block."""
    import models.common as ref_common

    from yolosomi_tpu.models.layers import SPPCSPC as OurSPPCSPC

    _block_oracle(ref_common.SPPCSPC(64, 32), OurSPPCSPC(32), cin=64)


def test_coor_attention_oracle():
    """CoorAttention (common.py:1399-1460): pooled h/w profiles through a
    shared conv, h-swish, split sigmoid gates."""
    import models.common as ref_common

    from yolosomi_tpu.models.layers import CoorAttention as OurCoorAttention

    _block_oracle(ref_common.CoorAttention(64, 64), OurCoorAttention(64), cin=64)


def test_ghost_conv_oracle():
    """GhostConv (common.py:1999-2009) — also exercises the rebound-Conv
    7th-positional-arg defect path (act passed where ultralytics expects
    dilation; the stub interprets bool as act, the only working reading)."""
    import models.common as ref_common

    from yolosomi_tpu.models.layers import GhostConv as OurGhostConv

    _block_oracle(ref_common.GhostConv(32, 64), OurGhostConv(64), cin=32)


@pytest.mark.parametrize("s", [1, 2])
def test_ghost_bottleneck_oracle(s):
    """GhostBottleneck (common.py:2012-2023): ghost stages in anonymous
    `conv`/`shortcut` Sequentials (candidate key mapping), with the
    stride-2 depthwise shortcut branch."""
    import models.common as ref_common

    from yolosomi_tpu.models.layers import GhostBottleneck as OurGhostBottleneck

    _block_oracle(ref_common.GhostBottleneck(48, 48, 3, s), OurGhostBottleneck(48, 3, s), cin=48)


# --------------------------------------------------------------------------
# DetectODConv + anchor-free v8/v11 head oracles
# --------------------------------------------------------------------------


def test_detect_odconv_oracle():
    """DetectODConv (yolo.py:112-170): Detect with ODConv2d_3rd 1x1
    prediction convs. B=2 so the reference's attention-trunk BN runs (it
    skips BN entirely when B==1 — see test_odconv_b1_bn_skip_defect)."""
    from yolosomi_tpu.models.heads import DetectODConvHead as OurDetectODConv

    nc = 6
    anchors_px = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]]
    strides = [8, 16]
    anchors_grid = [[a / s for a in lv] for lv, s in zip(anchors_px, strides)]
    det = ref_yolo.DetectODConv(nc=nc, anchors=anchors_grid, ch=(32, 64))
    det.stride = torch.tensor([float(s) for s in strides])
    sd = _randomize_sd(det)
    det.eval()

    rng = np.random.default_rng(33)
    feats = [
        rng.standard_normal((2, 16, 16, 32)).astype(np.float32),
        rng.standard_normal((2, 8, 8, 64)).astype(np.float32),
    ]
    with torch.no_grad():
        # .contiguous(): ODConv2d_3rd's grouped-conv trick uses .view
        # (common.py:4603), which rejects the transposed NHWC layout
        r_z, r_maps = det([torch.from_numpy(f.transpose(0, 3, 1, 2)).contiguous() for f in feats])

    ours = OurDetectODConv(nc=nc, anchors=tuple(tuple(a) for a in anchors_px), strides=tuple(strides))
    variables = ours.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats], False)
    variables = convert_state_dict(sd, variables, strict=True)
    j_maps = ours.apply(variables, [jnp.asarray(f) for f in feats], False)

    for lvl, (rm, jm) in enumerate(zip(r_maps, j_maps)):
        rm = rm.permute(0, 2, 3, 1, 4).numpy()  # (bs, na, ny, nx, no) -> (bs, ny, nx, na, no)
        np.testing.assert_allclose(np.asarray(jm), rm, atol=2e-3, rtol=1e-3, err_msg=f"level {lvl}")

    apx = np.asarray(anchors_px, np.float32).reshape(2, 3, 2)
    dec = np.asarray(our_decode(j_maps, apx, strides))
    ref_rows = _reorder_ref_rows(r_z.numpy(), r_maps, 3, nc + 5)
    np.testing.assert_allclose(dec[..., :4], ref_rows[..., :4], atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(dec[..., 4:], ref_rows[..., 4:], atol=2e-3)


def test_odconv_b1_bn_skip_defect():
    """Documented reference defect: ODConv2d_3rd's attention trunk runs
    `if x.size(0) > 1: x = self.bn(x)` (common.py:4563-4564) — at batch
    size 1 the BN is skipped EVEN IN EVAL, so the reference's own B=1 and
    B=2 inference disagree for identical images whenever the running
    stats are not identity. Ours always applies eval BN (the upstream
    ODConv semantics). This test pins the defect so the deviation stays
    deliberate: per-sample reference outputs differ between B=1 and B=2."""
    import models.common as ref_common

    od = ref_common.ODConv2d_3rd(16, 8, kernel_size=1, stride=1)
    sd = od.state_dict()
    g = torch.Generator().manual_seed(3)
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    od.load_state_dict(sd)
    od.eval()
    # positive inputs: with all-positive weights a zero-mean input drives
    # the attention trunk all-negative and ReLU hides the BN entirely
    x = torch.rand(2, 16, 5, 5, generator=g) + 0.5
    with torch.no_grad():
        y2 = od(x)          # B=2: BN applied
        y1 = od(x[:1])      # B=1: BN silently skipped
    assert not torch.allclose(y1, y2[:1], atol=1e-4), "reference B=1 BN-skip defect vanished?"


def _v8_feats(rng, nc, chs=(64, 128, 256), bs=2, base=16):
    return [
        rng.standard_normal((bs, base >> i, base >> i, c)).astype(np.float32)
        for i, c in enumerate(chs)
    ]


def _our_v8_rows_xyxy(j_maps, strides, nc, reg_max=16):
    """Decode our v8-head raw maps exactly like the reference's end2end
    `_inference` (decode_bboxes xywh=False): xyxy pixel boxes + cls
    sigmoid, rows (B, N, 4+nc)."""
    from yolosomi_tpu.models.heads import DFL

    dfl = DFL(reg_max)
    rows = []
    for i, p in enumerate(j_maps):
        b, ny, nx, _ = p.shape
        s = float(strides[i])
        box, cls = p[..., : 4 * reg_max], p[..., 4 * reg_max :]
        dist = dfl.apply({}, box.reshape(b, ny, nx, 4, reg_max))
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1) + 0.5
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0) + 0.5
        x1 = (gx[None] - dist[..., 0]) * s
        y1 = (gy[None] - dist[..., 1]) * s
        x2 = (gx[None] + dist[..., 2]) * s
        y2 = (gy[None] + dist[..., 3]) * s
        conf = jax.nn.sigmoid(cls.astype(jnp.float32))
        lvl = jnp.concatenate(
            [jnp.stack([x1, y1, x2, y2], -1).reshape(b, ny * nx, 4), conf.reshape(b, ny * nx, nc)], -1
        )
        rows.append(lvl)
    return jnp.concatenate(rows, axis=1)


def test_detect_yolov8_oracle():
    """DetectYOLOv8 (yolo.py:725-776): box/cls Sequential branches + the
    reference's own DFL (common.py:2449) decode, vs our DetectV8 +
    decode_v8 through the converter. Train-mode raw maps AND eval decoded
    rows. Also pins the width rule: c3 = max(ch[0], nc) UNCAPPED (the
    100-cap exists only in DetectYolov11, yolo.py:798)."""
    from yolosomi_tpu.models.heads import DetectV8 as OurDetectV8
    from yolosomi_tpu.models.heads import decode_v8 as our_decode_v8

    nc, strides = 5, (8, 16, 32)
    det = ref_yolo.DetectYOLOv8(nc=nc, ch=(64, 128, 256))
    det.stride = torch.tensor([float(s) for s in strides])
    for m in det.modules():  # the reference sets these in initialize_weights
        if isinstance(m, nn.BatchNorm2d):
            m.eps, m.momentum = 1e-3, 0.03
    sd = _randomize_sd(det, skip=("anchor", "stride", "dfl"))  # dfl: frozen arange conv
    det.eval()

    rng = np.random.default_rng(44)
    feats = _v8_feats(rng, nc)
    with torch.no_grad():
        # eval-mode second output IS the per-level raw map list (yolo.py:766)
        # — comparing it (not a train() pass) keeps BN on running stats on
        # both sides
        r_y, r_maps = det([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])

    ours = OurDetectV8(nc=nc, strides=strides)
    variables = ours.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats], False)
    variables = convert_state_dict(sd, variables, strict=True)
    # the only reference key with no counterpart leaf: DFL's frozen arange
    # conv (a constant, not a learned weight)
    j_maps = ours.apply(variables, [jnp.asarray(f) for f in feats], False)

    for lvl, (rm, jm) in enumerate(zip(r_maps, j_maps)):
        np.testing.assert_allclose(
            np.asarray(jm), rm.permute(0, 2, 3, 1).numpy(), atol=2e-3, rtol=1e-3, err_msg=f"level {lvl}"
        )

    dec = np.asarray(our_decode_v8(j_maps, strides, nc))  # (B, N, 5+nc), obj col = 1
    ref_rows = r_y.numpy().transpose(0, 2, 1)  # (B, 4+nc, N) -> (B, N, 4+nc)
    np.testing.assert_allclose(dec[..., :4], ref_rows[..., :4], atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(dec[..., 5:], ref_rows[..., 4:], atol=2e-3)


def test_detect_yolo8head_width_variant():
    """DetectYOLO8Head (yolo.py:187) is the same head with an extra unused
    `width` arg and the same uncapped c3 — state_dict layouts must agree
    so one converter path serves both registry names."""
    a = ref_yolo.DetectYOLO8Head(nc=120, ch=(64, 128, 256))
    b = ref_yolo.DetectYOLOv8(nc=120, ch=(64, 128, 256))
    assert [(k, tuple(v.shape)) for k, v in a.state_dict().items()] == [
        (k, tuple(v.shape)) for k, v in b.state_dict().items()
    ]


def test_detect_yolov11_oracle():
    """DetectYolov11 (yolo.py:778-898): v8 box branch + SEAM class branch
    (and the min(nc,100) c3 cap), vs our DetectV11 through the converter."""
    from yolosomi_tpu.models.heads import DetectV11 as OurDetectV11
    from yolosomi_tpu.models.heads import decode_v8 as our_decode_v8

    nc, strides = 5, (8, 16, 32)
    det = ref_yolo.DetectYolov11(nc=nc, ch=(64, 128, 256))
    det.stride = torch.tensor([float(s) for s in strides])
    for m in det.modules():  # the reference sets these in initialize_weights
        if isinstance(m, nn.BatchNorm2d):
            m.eps, m.momentum = 1e-3, 0.03
    sd = _randomize_sd(det, skip=("anchor", "stride", "dfl"))  # dfl: frozen arange conv
    det.eval()

    rng = np.random.default_rng(55)
    feats = _v8_feats(rng, nc)
    with torch.no_grad():
        r_y, _ = det([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])

    ours = OurDetectV11(nc=nc, strides=strides)
    variables = ours.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats], False)
    variables = convert_state_dict(sd, variables, strict=True)
    j_maps = ours.apply(variables, [jnp.asarray(f) for f in feats], False)

    dec = np.asarray(our_decode_v8(j_maps, strides, nc))
    ref_rows = r_y.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(dec[..., :4], ref_rows[..., :4], atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(dec[..., 5:], ref_rows[..., 4:], atol=2e-3)


def test_detect_yolov11_end2end_oracle():
    """The v11 end2end path (yolo.py:828-922): detached one2one branches,
    xyxy decode (decode_bboxes xywh=not end2end), and the NMS-free top-k
    `postprocess` vs our postprocess_end2end — output rows (B, max_det, 6)
    compared value-for-value, order included."""
    from yolosomi_tpu.models.heads import DetectV11 as OurDetectV11
    from yolosomi_tpu.models.heads import postprocess_end2end as our_post

    import copy as _copy_mod

    nc, strides, max_det = 5, (8, 16, 32), 20
    ref_yolo.DetectYolov11.end2end = True
    # latent reference defect: common.py:13 `from copy import copy` is
    # star-imported into yolo.py, shadowing the module — `copy.deepcopy`
    # (yolo.py:811) raises AttributeError, so the end2end head is
    # unconstructible as shipped. Patch exactly that name for the oracle.
    _copy_prev = ref_yolo.copy
    ref_yolo.copy = _copy_mod
    try:
        det = ref_yolo.DetectYolov11(nc=nc, ch=(64, 128, 256))
        det.max_det = max_det
        det.stride = torch.tensor([float(s) for s in strides])
        for m in det.modules():  # the reference sets these in initialize_weights
            if isinstance(m, nn.BatchNorm2d):
                m.eps, m.momentum = 1e-3, 0.03
        sd = _randomize_sd(det, skip=("anchor", "stride", "dfl"))  # dfl: frozen arange conv

        det.eval()
        rng = np.random.default_rng(66)
        feats = _v8_feats(rng, nc)
        with torch.no_grad():
            # eval second output: {"one2many": maps, "one2one": maps}
            r_post, r_dict = det([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])
    finally:
        ref_yolo.DetectYolov11.end2end = False
        ref_yolo.copy = _copy_prev

    ours = OurDetectV11(nc=nc, strides=strides, end2end=True)
    j_feats = [jnp.asarray(f) for f in feats]
    variables = ours.init(jax.random.PRNGKey(0), j_feats, True)
    variables = convert_state_dict(sd, variables, strict=True)

    # one2many branch parity via a non-e2e head sharing the same params
    # (the e2e eval path returns only one2one maps, mirroring the decode)
    j_one2many = OurDetectV11(nc=nc, strides=strides, end2end=False).apply(variables, j_feats, False)
    for lvl, (rm, jm) in enumerate(zip(r_dict["one2many"], j_one2many)):
        np.testing.assert_allclose(
            np.asarray(jm), rm.permute(0, 2, 3, 1).numpy(), atol=2e-3, rtol=1e-3,
            err_msg=f"one2many level {lvl}",
        )

    j_one2one = ours.apply(variables, j_feats, False)
    for lvl, (rm, jm) in enumerate(zip(r_dict["one2one"], j_one2one)):
        np.testing.assert_allclose(
            np.asarray(jm), rm.permute(0, 2, 3, 1).numpy(), atol=2e-3, rtol=1e-3,
            err_msg=f"one2one level {lvl}",
        )
    rows = _our_v8_rows_xyxy(j_one2one, strides, nc)
    got = np.asarray(our_post(rows, max_det=max_det, nc=nc))
    want = r_post.numpy()
    np.testing.assert_allclose(got[..., :4], want[..., :4], atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(got[..., 4], want[..., 4], atol=2e-3)  # scores
    np.testing.assert_array_equal(got[..., 5], want[..., 5])  # class ids


# --------------------------------------------------------------------------
# CSP/SPP/experimental/transformer block oracles
# --------------------------------------------------------------------------


def test_spp_oracle():
    """SPP (common.py:1806-1827): parallel 5/9/13 max-pools, symmetric
    torch padding."""
    import models.common as ref_common

    from yolosomi_tpu.models.layers import SPP as OurSPP

    _block_oracle(ref_common.SPP(64, 48), OurSPP(48), cin=64)


def test_bottleneck_csp_oracle():
    """BottleneckCSP (common.py:1512-1539): CSP with bare cv2/cv3 convs and
    a post-concat BN+SiLU."""
    import models.common as ref_common

    from yolosomi_tpu.models.layers import BottleneckCSP as OurBottleneckCSP

    _block_oracle(ref_common.BottleneckCSP(64, 64, n=2), OurBottleneckCSP(64, n=2), cin=64)


def test_simam_oracle():
    """SimAM (common.py:2915-2940): parameter-free energy attention."""
    import models.common as ref_common

    from yolosomi_tpu.models.layers import SimAM as OurSimAM

    _block_oracle(ref_common.SimAM(32), OurSimAM(), cin=32, atol=1e-5)


def test_cross_conv_oracle():
    """CrossConv (experimental.py:15-27): 1xk then kx1 factorized conv."""
    import models.experimental as ref_exp

    from yolosomi_tpu.models.layers import CrossConv as OurCrossConv

    _block_oracle(ref_exp.CrossConv(32, 32, 3, 1, 1, 1.0, True), OurCrossConv(32, 3, 1, 1, 1.0, True), cin=32)


def test_mixconv2d_oracle():
    """MixConv2d (experimental.py:50-71): linspace-floor channel split +
    per-branch groups=gcd(c1, c_) — this oracle caught and fixed two real
    deviations (our split gave the remainder to the FIRST branches; our
    branches were ungrouped)."""
    import models.experimental as ref_exp

    from yolosomi_tpu.models.layers import MixConv2d as OurMixConv2d

    # c2=51 with 3 kernels: linspace-floor gives (17,17,17); c2=50 gives
    # (17,17,16) — the uneven case exercises the split rule
    _block_oracle(ref_exp.MixConv2d(32, 50, (1, 3, 5), 1), OurMixConv2d(50, (1, 3, 5), 1), cin=32)


def test_sum_oracle():
    """Sum (experimental.py:29-47): weighted N-input sum with sigmoid*2
    gains from the -arange(1,n)/2 parameter."""
    import models.experimental as ref_exp

    from yolosomi_tpu.models.layers import Sum as OurSum

    rng = np.random.default_rng(81)
    xs = [rng.standard_normal((2, 8, 8, 16)).astype(np.float32) for _ in range(3)]
    for weight in (False, True):
        ref = ref_exp.Sum(3, weight)
        sd = {k: v.numpy().copy() for k, v in ref.state_dict().items()}
        with torch.no_grad():
            want = ref([torch.from_numpy(x.transpose(0, 3, 1, 2)) for x in xs])
        ours = OurSum(3, weight)
        variables = ours.init(jax.random.PRNGKey(0), [jnp.asarray(x) for x in xs], False)
        if weight:
            variables = convert_state_dict(sd, variables, strict=True)
        got = np.asarray(ours.apply(variables, [jnp.asarray(x) for x in xs], False))
        np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=1e-5, rtol=1e-5)


def test_c3tr_oracle():
    """C3TR (common.py:1623-1630) whose TransformerBlock/TransformerLayer
    (common.py:1023-1078) is the REFERENCE's variant: pre-LN, q/k/v linears
    feeding a full nn.MultiheadAttention (double projection through the
    packed in_proj), 4x ReLU MLP, dropout sites (identity in eval). This
    oracle caught and replaced our old upstream-yolov5 TransformerLayer
    (no LN, single projection, 1x MLP) — a genuinely different
    architecture with different parameter shapes."""
    import models.common as ref_common

    from yolosomi_tpu.models.layers import C3TR as OurC3TR

    _block_oracle(ref_common.C3TR(64, 64, n=2), OurC3TR(64, n=2), cin=64, hw=8, atol=5e-3)


def test_c3str_oracle():
    """C3STR (common.py:1632-1637) — the Swin branch: WindowAttention with
    relative-position bias, shifted windows + mask, exact-GELU Mlp. The
    reference runs Swin on TRANSPOSED spatial ((B,C,H,W)->(B,W,H,C),
    common.py:1321); this oracle pins our NHWC formulation to it,
    including the bias-table index orientation (W-delta major) — it
    caught and fixed three real deviations: our qkv used bias (reference
    layer passes qkv_bias=False), tanh-GELU vs torch's exact erf, and the
    transposed relative-position index."""
    import models.common as ref_common

    from yolosomi_tpu.models.layers import C3STR as OurC3STR

    # c_=32 -> 1 head; n=2 exercises both the plain and the shifted layer
    # (shift_size=4, window 8) at hw=16 (two windows per axis)
    _block_oracle(ref_common.C3STR(64, 64, n=2), OurC3STR(64, n=2), cin=64, atol=5e-3)


# --------------------------------------------------------------------------
# FULL HUB-GRAPH oracles beyond yolov5s: the v10 backbone family
# (SCDown/PSA/C2fCIB/CIB, common.py:7192-7260, 8981-9036) and the P6
# 4-level yolov5s6 graph, each through the reference's own
# Model/parse_model with shared weights via the converter.
# --------------------------------------------------------------------------

V10_ANCHORS = [
    [10, 13, 16, 30, 33, 23],
    [30, 61, 62, 45, 59, 119],
    [116, 90, 156, 198, 373, 326],
]


def _hub_oracle_pair(name, nc, anchors=None, width=None, depth=None, imgsz=128):
    import copy

    import yaml as _yaml

    cfg = copy.deepcopy(load_model_cfg(find_config(name)))
    cfg["nc"] = nc
    if anchors is not None:
        # explicit anchors: the reference expands int `anchors: n` to the
        # range(2n) placeholder ladder (yolo.py:1610-1620) that only
        # autoanchor later repairs; ours picks a geometric ladder
        # (models/yolo.py ModelMeta). Pin real values to compare decode.
        cfg["anchors"] = anchors
    if width is not None:
        cfg["width_multiple"] = width
    if depth is not None:
        cfg["depth_multiple"] = depth

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        _yaml.safe_dump(cfg, f)
        ref_yaml = f.name
    ref_model = ref_yolo.Model(ref_yaml, ch=3, nc=nc)
    sd = _randomize_sd(ref_model)
    ref_model.eval()

    model, meta = build_model(cfg, nc=nc)
    variables = init_model(model, meta, imgsz=imgsz)
    variables = convert_state_dict(sd, variables, strict=True)
    return ref_model, sd, model, meta, variables


def _full_graph_forward_check(pair, nc, imgsz, seed, atol_maps=2e-3, atol_box=2e-1):
    ref_model, sd, model, meta, variables = pair
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, imgsz, imgsz, 3)).astype(np.float32)

    with torch.no_grad():
        r_z, r_maps = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    j_maps = model.apply(variables, jnp.asarray(x), False)
    for lvl, (rm, jm) in enumerate(zip(r_maps, j_maps)):
        rm = rm.permute(0, 2, 3, 1, 4).numpy()
        np.testing.assert_allclose(np.asarray(jm), rm, atol=atol_maps, rtol=1e-3, err_msg=f"level {lvl}")

    na = meta.anchors_px.shape[1]
    dec = np.asarray(our_decode(j_maps, meta.anchors_px, meta.strides))
    ref_rows = _reorder_ref_rows(r_z.numpy(), r_maps, na, nc + 5)
    np.testing.assert_allclose(dec[..., :4], ref_rows[..., :4], atol=atol_box, rtol=1e-3)
    np.testing.assert_allclose(dec[..., 4:], ref_rows[..., 4:], atol=2e-3)


def test_full_yolov10_oracle_forward():
    """The v10 hub graph (models/hub/yolov10.yaml): reference Model with
    its own SCDown, PSA/AttentionPSA, C2fCIB/CIB, C2f, SPPF and Detect vs
    our build_model, same weights, raw maps + decoded boxes. width 0.5
    keeps PSA's integer head count (c=256 -> 4 heads) while exercising
    every block family."""
    pair = _hub_oracle_pair(
        "yolov10", nc=10, anchors=V10_ANCHORS, width=0.5, depth=0.33, imgsz=128
    )
    _full_graph_forward_check(pair, nc=10, imgsz=128, seed=101)


def test_full_yolov5s6_oracle_forward():
    """The P6 4-level hub graph (models/hub/yolov5s6.yaml, stride 64,
    6x6 s2 p2 stem conv): reference Model vs ours, raw maps + decode on
    all four levels."""
    pair = _hub_oracle_pair("yolov5s6", nc=80, imgsz=128)
    _full_graph_forward_check(pair, nc=80, imgsz=128, seed=103)


_P2_ANCHORS = [
    [4, 5, 8, 10, 13, 16],
    [10, 13, 16, 30, 33, 23],
    [30, 61, 62, 45, 59, 119],
    [116, 90, 156, 198, 373, 326],
]
_P7_ANCHORS = _P2_ANCHORS + [[436, 615, 739, 380, 925, 792]]


@pytest.mark.parametrize(
    "name,kw",
    [
        ("yolov3", {}),
        ("yolov3-tiny", {}),  # MaxPool2d/ZeroPad2d rows
        ("yolov3-spp", {}),  # SPP
        ("yolov5-fpn", {"depth": 0.33, "width": 0.25}),  # BottleneckCSP
        ("yolov5-panet", {"depth": 0.33, "width": 0.25}),
        ("yolov5-bifpn", {"depth": 0.33, "width": 0.25}),  # Concat-style BiFPN row
        ("yolov5-p2", {"depth": 0.33, "width": 0.25, "anchors": _P2_ANCHORS}),
        ("yolov5-p7", {"depth": 0.33, "width": 0.25, "anchors": _P7_ANCHORS, "imgsz": 256}),
    ],
)
def test_full_hub_catalog_oracle_forward(name, kw):
    """Every remaining anchor-based hub graph through the reference's own
    Model vs ours: v3 family (plain Bottleneck ladder, tiny's pool rows,
    SPP), the fpn/panet/bifpn neck variants, and the P2/P7 pyramid
    extremes (stride 4 and 128). Int-anchor configs get explicit pinned
    anchors (the reference's range-placeholder expansion differs from our
    geometric ladder by design — see _hub_oracle_pair)."""
    imgsz = kw.pop("imgsz", 128)
    if name.startswith("yolov3"):
        kw.setdefault("width", 0.25)
        kw.setdefault("depth", 0.33)
    pair = _hub_oracle_pair(name, nc=7, imgsz=imgsz, **kw)
    _full_graph_forward_check(pair, nc=7, imgsz=imgsz, seed=107)
