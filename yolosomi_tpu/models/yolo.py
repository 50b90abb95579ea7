"""YAML model-graph compiler + DetectionModel (TPU-native).

Re-design of the reference's graph interpreter (models/yolo.py:1164-1664):
the same `[from, repeats, module, args]` YAML rows compile into a flax
module list, but through an explicit registry instead of eval(), with
analytic stride propagation instead of a dummy forward
(reference probes strides by forwarding zeros, yolo.py:1196-1235 — here the
graph itself tells us every layer's stride, so calibration is instant and
shape-free).

Known reference defect handled: the flagship YAML names `C2fEACBAM`
(models/modules/YOLO-SOMI.yaml:40) which does not exist in the reference
(actual class C2fEMACBAM, common.py:3594); the registry aliases it.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import unfreeze

from yolosomi_tpu.models import heads as heads_lib
from yolosomi_tpu.models import layers as L
from yolosomi_tpu.models import activations as A
from yolosomi_tpu.models import layers_zoo as Z
from yolosomi_tpu.utils.general import LOGGER, make_divisible

# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Kind controls how parse_model rewrites args (reference: yolo.py:1471-1640):
#   conv  : args [c2, ...] -> [c2*gw, ...]
#   csp   : conv + insert repeat count n as arg 2
#   plain : no channel args; c2 = ch[f]
#   concat: c2 = sum of input channels
#   fuse  : equal-shape fusion; c2 = ch of first input
#   addN  : weighted add + conv; c2 arg given
#   head  : detection head
class _LazyRTDETR:
    """Deferred import so models/rtdetr.py only loads when a YAML asks."""

    def __call__(self, **kw):
        from yolosomi_tpu.models.rtdetr import RTDETRDecoder

        return RTDETRDecoder(**kw)


_lazy_rtdetr = _LazyRTDETR()


_REGISTRY: Dict[str, Tuple[Any, str]] = {
    "Conv": (L.Conv, "conv"),
    "DWConv": (L.DWConv, "conv"),
    "Focus": (L.Focus, "conv"),
    "GhostConv": (L.GhostConv, "conv"),
    "GhostBottleneck": (L.GhostBottleneck, "conv"),
    "Bottleneck": (L.Bottleneck, "conv"),
    "SPP": (L.SPP, "conv"),
    "SPPF": (L.SPPF, "conv"),
    "SEAM": (L.SEAM, "seam"),
    "MultiSEAM": (L.MultiSEAM, "seam"),
    "ODConv_3rd": (L.ODConv, "conv"),
    "ODConv": (L.ODConv, "conv"),
    "CBAM": (L.CBAM, "plain"),
    "SE": (L.SE, "plain"),
    "se_block": (L.SE, "plain"),
    "BottleneckCSP": (L.BottleneckCSP, "csp"),
    "C3TR": (L.C3TR, "csp"),
    "C3SE": (L.C3SE, "csp"),
    "C3ECA": (L.C3ECA, "csp"),
    "C3SPP": (L.C3SPP, "csp"),
    "C3x": (L.C3x, "csp"),
    "RepC3": (L.RepC3, "csp"),
    "CrossConv": (L.CrossConv, "conv"),
    "MixConv2d": (L.MixConv2d, "conv"),
    "GSConv": (L.GSConv, "conv"),
    "SPD": (L.SPD, "spd"),
    "space_to_depth": (L.SPD, "spd"),
    "C3Ghost": (L.C3Ghost, "csp"),
    "SPPCSPC": (L.SPPCSPC, "csp"),
    "TransformerBlock": (L.TransformerBlock, "conv"),
    "SimAM": (L.SimAM, "plain"),
    "eca_block": (L.ECA, "plain"),
    "ECA": (L.ECA, "plain"),
    "BAM": (L.BAM, "plain"),
    "GAMAttention": (L.GAMAttention, "plain"),
    "SKAttention": (L.SKAttention, "plain"),
    "ShuffleAttention": (L.ShuffleAttention, "plain"),
    "NAMAttention": (L.NAMAttention, "plain"),
    "CoorAttention": (L.CoorAttention, "conv"),
    "Classify": (L.Classify, "classify"),
    "C3": (L.C3, "csp"),
    "C2f": (L.C2f, "csp"),
    "C2fCBAM": (L.C2fCBAM, "csp"),
    "C2fEMACBAM": (L.C2fEMACBAM, "csp"),
    "C2fEACBAM": (L.C2fEMACBAM, "csp"),  # alias for the reference YAML typo
    "C3STR": (L.C3STR, "csp"),
    "EMA": (L.EMAAttention, "plain"),
    "LSKblock": (L.LSKblock, "plain"),
    "MLCA": (L.MLCA, "plain"),
    "TripletAttention": (L.TripletAttention, "plain"),
    "GlobalContextBlock": (L.GlobalContextBlock, "plain"),
    "NonLocalBlock": (L.NonLocalBlock, "plain"),
    "CoT": (L.CoTAttention, "plain"),
    "CoTAttention": (L.CoTAttention, "plain"),
    "DoubleAttention": (L.DoubleAttention, "plain"),
    "ParallelPolarizedSelfAttention": (L.ParallelPolarizedSelfAttention, "plain"),
    "SpatialGroupEnhance": (L.SpatialGroupEnhance, "plain"),
    "MHSA": (L.MHSA, "plain"),
    "S2Attention": (L.S2Attention, "plain"),
    "EfficientAttention": (L.EfficientAttention, "plain"),
    "ELA": (L.ELA, "plain"),
    "MSCAAttention": (L.MSCAAttention, "plain"),
    "C3RFEM": (L.C3RFEM, "csp"),
    "RFEM": (L.RFEM, "conv"),
    "LVCBlock": (L.LVCBlock, "plain"),
    "ConvMixer": (L.ConvMixer, "conv"),
    "SwinTransformerBlock": (L.SwinTransformerBlock, "conv"),
    "SPPF_LSKA": (L.SPPF_LSKA, "conv"),
    "LSKA": (L.LSKA, "plain"),
    "CARAFE": (L.CARAFE, "carafe"),
    "DySample": (L.DySample, "dysample"),
    "Involution": (L.Involution, "involution"),
    "HorBlock": (L.HorBlock, "plain"),
    "HorNet": (L.HorBlock, "plain"),
    "gnconv": (L.GnConv, "plain"),
    "Zoom_cat": (L.ZoomCat, "zoomcat"),
    "C2fCIB": (L.C2fCIB, "csp"),
    "CIB": (L.CIB, "conv"),
    "PSA": (L.PSA, "conv"),
    "SCDown": (L.SCDown, "conv"),
    "RepVGGDW": (L.RepVGGDW, "plain"),
    "nn.MaxPool2d": (L.MaxPool2d, "pool"),
    "nn.ZeroPad2d": (L.ZeroPad2d, "zeropad"),
    "Contract": (L.Contract, "contract"),
    "Expand": (L.Expand, "expand"),
    "nn.Upsample": (L.Upsample, "upsample"),
    "Upsample": (L.Upsample, "upsample"),
    "Concat": (L.Concat, "concat"),
    "BiFPN": (L.BiFPN, "fuse"),
    "BiFPN_Add2": (L.BiFPN_Add2, "addN"),
    "BiFPN_Add3": (L.BiFPN_Add3, "addN"),
    "Detect": (heads_lib.Detect, "head"),
    "DecoupledDetect": (heads_lib.DecoupledDetect, "head"),
    "DecoupledDetect1": (heads_lib.DecoupledDetect, "head"),
    "Decoupled_Detect": (heads_lib.DecoupledDetect, "head"),
    "DetectODConv": (heads_lib.DetectODConvHead, "head"),
    "IDetect": (heads_lib.IDetect, "head"),
    "IAuxDetect": (heads_lib.IAuxDetect, "head"),
    "ASFF_Detect": (heads_lib.ASFFDetect, "head"),
    "CLLADetect": (heads_lib.CLLADetect, "head"),
    "TSCODE_Detect": (heads_lib.TSCODEDetect, "head"),
    "DetectYOLOv8": (heads_lib.DetectV8, "head_v8"),
    "DetectYOLO8Head": (heads_lib.DetectV8, "head_v8"),
    "DetectV8": (heads_lib.DetectV8, "head_v8"),
    "DetectYolov11": (heads_lib.DetectV11, "head_v8"),
    "DetectV11": (heads_lib.DetectV11, "head_v8"),
    "Segment": (heads_lib.Segment, "head"),
    "RTDETRDecoder": (_lazy_rtdetr, "head_rtdetr"),
    "FReLU": (A.FReLU, "noarg"),
    "AconC": (A.AconC, "noarg"),
    "MetaAconC": (A.MetaAconC, "noarg"),
    # --- Tier-3 zoo (layers_zoo.py) ---
    "SimConv": (Z.SimConv, "conv"),
    "CoordConv": (Z.CoordConv, "conv"),
    "CoordConvd": (Z.CoordConvd, "conv"),
    "ADown": (Z.ADown, "conv"),
    "DownSimper": (Z.DownSimper, "conv"),
    "ASPP": (Z.ASPP, "conv"),
    "SPPELAN": (Z.SPPELAN, "conv"),
    "SPPF_improve": (Z.SPPF_improve, "conv"),
    "BasicRFB": (Z.BasicRFB, "conv"),
    "BasicRFB_a": (Z.BasicRFB_a, "conv"),
    "RepVGGBlock": (Z.RepVGGBlock, "conv"),
    "ACmix": (Z.ACmix, "conv"),
    "Conv_SWS": (Z.Conv_SWS, "conv"),
    "SPPCSPCS": (Z.SPPCSPCS, "csp"),
    "CNeB": (Z.CNeB, "csp"),
    "CSPCM": (Z.CSPCM, "csp"),
    "C3CR": (Z.C3CR, "csp"),
    "C3_CBAM": (Z.C3_CBAM, "csp"),
    "C3_CBAMS": (Z.C3_CBAMS, "csp"),
    "C3_CBAM_DWC": (Z.C3_CBAM_DWC, "csp"),
    "C3_CBAMS_DWC": (Z.C3_CBAMS_DWC, "csp"),
    "C3CPCA": (Z.C3CPCA, "csp"),
    "C3GAM": (Z.C3GAM, "csp"),
    "C3_SCBAM": (Z.C3_SCBAM, "csp"),
    "C3_BAM": (Z.C3_BAM, "csp"),
    "C3_CA": (Z.C3_CA, "csp"),
    "C2fBAM": (Z.C2fBAM, "csp"),
    "C2f_DWR": (Z.C2f_DWR, "csp"),
    "VoVGSCSPCBAM": (Z.VoVGSCSPCBAM, "csp"),
    "Conv2Former": (Z.Conv2Former, "c2former"),
    "ConvMix": (Z.ConvMix, "preserve_args1"),
    "SimAMWithSlicing": (Z.SimAMWithSlicing, "preserve_args1"),
    "SimAMWithFlexibleSlicing": (Z.SimAMWithFlexibleSlicing, "preserve_args1"),
    "C3CBAM": (Z.C3CBAM, "preserve_args1"),
    "CPCA": (Z.CPCA, "noarg"),
    "ContextAggregation": (Z.ContextAggregation, "noarg"),
    "PSContextAggregation": (Z.PSContextAggregation, "noarg"),
    "ChannelAttention_HSFPN": (Z.ChannelAttentionHSFPN, "hsfpn"),
    "CAM": (Z.CAM, "cam"),
    "Add": (Z.Add, "nary"),
    "Multiply": (Z.Multiply, "nary"),
    "CShortcut": (Z.CShortcut, "nary"),
    "SDI": (Z.SDI, "sdi"),
    "BiFPNSDI": (Z.BiFPNSDI, "bifpnsdi"),
    "BiFPNs": (Z.BiFPNs, "bifpns"),
    "BiFusion": (Z.BiFusion, "bifusion"),
    "SF": (Z.SF, "sf"),
    "ScalSeq": (Z.ScalSeq, "scalseq"),
    "attention_model": (Z.AttentionModel, "attmodel"),
    "ConvTranspose": (Z.ConvTransposeLayer, "convtranspose"),
    "nn.ConvTranspose2d": (Z.ConvTranspose2dRaw, "convtranspose"),
    "DWConvTranspose2d": (Z.DWConvTranspose2d, "convtranspose"),
    "nn.BatchNorm2d": (Z.BatchNorm2d, "noarg"),
}

# conv-kind modules whose graph stride is fixed by construction rather than
# by an explicit stride arg (ADown/DownSimper always halve, common.py:99/4427)
_FIXED_STRIDE2 = {"ADown", "DownSimper", "Focus"}

# conv-kind stride tracking: positional index of the stride arg in the
# module's signature (after c2). Only names listed here propagate a stride;
# conv-kind modules NOT listed are stride-1 by signature (ASPP, SPPELAN,
# TransformerBlock, attention wrappers, ...) — the old heuristic "arg 2 is
# the stride" silently corrupted meta.strides for modules like ACmix
# (head count at pos 2) and missed BasicRFB (stride at pos 1).
_STRIDE_ARG_POS = {
    "Conv": 2, "DWConv": 2, "GhostConv": 2, "GhostBottleneck": 2,
    "CrossConv": 2, "MixConv2d": 2, "GSConv": 2, "SimConv": 2,
    "CoordConv": 2, "CoordConvd": 2, "RepVGGBlock": 2, "SCDown": 2,
    "ODConv": 2, "ODConv_3rd": 2, "Involution": 2,
    "BasicRFB": 1, "BasicRFB_a": 1,
    "ACmix": 4,
    "Conv_SWS": 5,
}

# Some heads consume more input maps than they have detection levels; this
# maps head name -> fn(n_inputs) -> slice of the input list that holds the
# actual detection levels (reference: CLLADetect yolo.py:325 fuses inputs
# 0+1 into level 0; TSCODE_Detect yolo.py:631 detects on the middle maps;
# IAuxDetect yolo.py:506 evals only the first half).
_HEAD_LEVEL_SLICE = {
    "CLLADetect": lambda n: slice(1, n),
    "TSCODE_Detect": lambda n: slice(1, n - 1),
    "IAuxDetect": lambda n: slice(0, n // 2),
}


def register_module(name: str, cls, kind: str = "conv") -> None:
    """Extension hook: add a module class to the YAML registry."""
    _REGISTRY[name] = (cls, kind)


def _register_dcn():
    """Deformable family (imported lazily so the model layer stays usable
    if ops/ grows heavier deps)."""
    from yolosomi_tpu.ops import dcn

    _REGISTRY.update(
        {
            "DCNv2": (dcn.DCNv2, "conv"),
            "DCNV3": (dcn.DCNv3, "dcnv3"),
            "DCNv3": (dcn.DCNv3, "dcnv3"),
            "C3_DCN": (dcn.C3_DCN, "csp"),
            "C2f_DCN": (dcn.C2f_DCN, "csp"),
        }
    )


_register_dcn()


# Default pixel anchors when the YAML gives `anchors: <int>` and autoanchor
# has not run. nl=4 values are the SOMI VisDrone set recorded in the
# reference YAML comments (models/modules/YOLO-SOMI.yaml:10-13); nl=3 is the
# stock YOLOv5 set (models/hub/anchors.yaml).
_DEFAULT_ANCHORS = {
    3: [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
        [116, 90, 156, 198, 373, 326],
    ],
    4: [
        [3, 4, 4, 8, 7, 6, 7, 11],
        [13, 8, 10, 17, 18, 12, 17, 23],
        [32, 15, 31, 26, 28, 49, 65, 35],
        [78, 73, 64, 98, 161, 47, 235, 85],
    ],
}


@dataclasses.dataclass
class LayerSpec:
    i: int
    f: Any  # int or list[int]
    n: int
    name: str
    args: list
    c2: int
    stride: float  # cumulative downsample factor of this layer's output


@dataclasses.dataclass
class ModelMeta:
    nc: int
    names: List[str]
    nl: int
    na: int
    strides: Tuple[float, ...]
    anchors_px: np.ndarray  # (nl, na, 2) pixel-space
    save: Tuple[int, ...]
    head_from: Tuple[int, ...]
    specs: List[LayerSpec]
    yaml: dict
    head_type: str = "Detect"  # registry name of the head family

    @property
    def no(self) -> int:
        return self.nc + 5

    @property
    def anchors_grid(self) -> np.ndarray:
        """Anchors in grid units (anchors_px / stride), the loss-path form
        (reference divides the anchor buffer by stride at init, yolo.py:1203)."""
        return self.anchors_px / np.asarray(self.strides, np.float32)[:, None, None]


def _anchor_preset(name: str):
    """Look up a named anchor set from configs/models/hub/anchors.yaml
    (counterpart of the reference's documentation-only models/hub/anchors.yaml;
    here `anchors: anchors_p6_1280` in a model YAML resolves directly)."""
    import yaml

    from yolosomi_tpu.utils.config import find_config

    path = find_config("hub/anchors", kind="models")
    presets = yaml.safe_load(open(path))
    if name not in presets:
        raise KeyError(f"anchor preset {name!r} not in {path} (have: {sorted(presets)})")
    return presets[name]


def _resolve_anchors(anchors, nl: int) -> np.ndarray:
    """Return (nl, na, 2) pixel anchors from a YAML anchors field."""
    if isinstance(anchors, str):
        anchors = _anchor_preset(anchors)
        if len(anchors) != nl:
            raise ValueError(f"anchor preset has {len(anchors)} levels, model has {nl}")
    if isinstance(anchors, int):
        if nl in _DEFAULT_ANCHORS and len(_DEFAULT_ANCHORS[nl][0]) // 2 == anchors:
            anchors = _DEFAULT_ANCHORS[nl]
        else:
            # geometric ladder per level: na sizes spanning [4s, ~13s] at stride s
            base = _DEFAULT_ANCHORS.get(nl)
            if base is not None:
                # resample the default ladder to na anchors per level
                anchors = [
                    np.array(lv, np.float32).reshape(-1, 2)[
                        np.linspace(0, len(lv) // 2 - 1, anchors).round().astype(int)
                    ].reshape(-1).tolist()
                    for lv in base
                ]
            else:
                anchors = [
                    (4.0 * 2**i * np.power(2.0, np.arange(anchors * 2) / 2.0)).tolist() for i in range(nl)
                ]
    a = np.asarray(anchors, np.float32)
    return a.reshape(nl, -1, 2)


def parse_model(cfg: dict, ch: int = 3, dtype=jnp.float32):
    """Compile YAML rows into (module list, specs, meta fields).

    Mirrors the reference's channel/repeat propagation rules
    (yolo.py:1453-1664) for the supported module families.
    """
    anchors, nc = cfg["anchors"], cfg["nc"]
    if isinstance(anchors, str):
        anchors = _anchor_preset(anchors)
    gd = cfg.get("depth_multiple", 1.0)
    gw = cfg.get("width_multiple", 1.0)
    na = (len(anchors[0]) // 2) if isinstance(anchors, list) else int(anchors)
    no = na * (nc + 5)

    chans: List[int] = [ch]
    strides: List[float] = [1.0]
    modules: List[nn.Module] = []
    specs: List[LayerSpec] = []
    save: List[int] = []
    head_from: Tuple[int, ...] = ()
    head_name = ""

    rows = list(cfg["backbone"]) + list(cfg["head"])
    for i, (f, n, mname, args) in enumerate(rows):
        mname = str(mname)
        if mname not in _REGISTRY:
            raise KeyError(f"module '{mname}' not in registry (row {i}); register via register_module()")
        cls, kind = _REGISTRY[mname]
        # token substitution replacing the reference's eval() of arg strings
        # (yolo.py:1466-1470): 'nc'/'anchors' resolve to config values,
        # 'None'/'True'/'False' to literals; other strings (e.g. 'nearest')
        # pass through.
        _tokens = {"nc": nc, "anchors": anchors, "None": None, "True": True, "False": False}
        args = [_tokens.get(a, a) if isinstance(a, str) else a for a in args]
        n_rep = max(round(n * gd), 1) if n > 1 else n

        def in_ch(fi):
            return chans[fi] if fi >= 0 else chans[len(chans) + fi]

        def in_stride(fi):
            return strides[fi] if fi >= 0 else strides[len(strides) + fi]

        stride = in_stride(f if isinstance(f, int) else f[0])
        kwargs: Dict[str, Any] = {}

        if kind in ("conv", "csp", "seam"):
            c1 = in_ch(f)
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            if kind == "seam":
                # SEAM forces c2 = c1 (reference: common.py:8451)
                c2 = c1
                margs = [c2, *args[1:]]
            elif kind == "csp":
                margs = [c2, n_rep, *args[1:]]
                n_rep = 1
            else:
                margs = [c2, *args[1:]]
            if cls is L.DWConv:
                kwargs["g"] = math.gcd(c1, c2)
            mod = cls(*margs, dtype=dtype, **kwargs)
            # stride propagation via the per-module stride-arg table
            s_local = 1
            spos = _STRIDE_ARG_POS.get(mname)
            if (
                kind == "conv"
                and spos is not None
                and len(margs) > spos
                and isinstance(margs[spos], int)
                and not isinstance(margs[spos], bool)
            ):
                s_local = margs[spos]
            if mname in _FIXED_STRIDE2:
                s_local = 2
            stride *= s_local
        elif kind == "plain":
            c2 = in_ch(f)
            mod = cls(*args, dtype=dtype) if args else cls(c2, dtype=dtype)
        elif kind == "dcnv3":
            # channel-preserving: force channels = ch[f] so width scaling
            # cannot desync the YAML arg from the graph
            c2 = in_ch(f)
            mod = cls(c2, *args[1:], dtype=dtype)
        elif kind == "upsample":
            c2 = in_ch(f)
            scale = args[1] if len(args) > 1 else 2
            mod = cls(size=args[0] if args else None, scale_factor=scale, mode=args[2] if len(args) > 2 else "nearest")
            stride /= scale
        elif kind == "concat":
            c2 = sum(in_ch(x) for x in f)
            mod = cls()
        elif kind == "fuse":
            c2 = in_ch(f[0])
            mod = cls(length=len(f), dtype=dtype)
        elif kind == "addN":
            c2 = max(in_ch(x) for x in f)
            mod = cls(c2, dtype=dtype)
        elif kind == "carafe":
            # content-aware 2x upsample; channel-preserving (common.py:4450)
            c2 = in_ch(f)
            mod = cls(*args, dtype=dtype)
            stride /= 2
        elif kind == "dysample":
            c2 = in_ch(f)
            scale = args[0] if args else 2
            mod = cls(*args, dtype=dtype)
            stride /= scale
        elif kind == "involution":
            # reference Involution outputs c1 channels regardless of the
            # YAML c2 arg (common.py:6954) — channel-preserving here
            c2 = in_ch(f)
            k = args[1] if len(args) > 1 else 3
            s_loc = args[2] if len(args) > 2 else 1
            mod = cls(c2, kernel_size=k, stride=s_loc, dtype=dtype)
            stride *= s_loc
        elif kind == "zoomcat":
            c2 = sum(in_ch(x) for x in f)
            mod = cls(dtype=dtype)
        elif kind == "pool":
            c2 = in_ch(f)
            k = args[0] if args else 2
            s = args[1] if len(args) > 1 else k
            p = args[2] if len(args) > 2 else 0
            mod = cls(k=k, s=s, p=p)
            stride *= s
        elif kind == "zeropad":
            c2 = in_ch(f)
            mod = cls(pads=tuple(args[0]) if args else (0, 1, 0, 1))
        elif kind == "spd":
            c2 = in_ch(f) * 4
            mod = cls()
            stride *= 2
        elif kind == "contract":
            g = args[0] if args else 2
            c2 = in_ch(f) * g * g
            mod = cls(gain=g)
            stride *= g
        elif kind == "expand":
            g = args[0] if args else 2
            c2 = in_ch(f) // (g * g)
            mod = cls(gain=g)
            stride /= g
        elif kind == "classify":
            # classification tail: args[0] is the class count — never
            # width-scaled (the conv kind's make_divisible would mangle it)
            c2 = args[0]
            mod = cls(*args, dtype=dtype)
        elif kind == "c2former":
            # Conv2Former's blocks project back to c1: channel-preserving
            # regardless of the declared c2 (common.py:2428; see layers_zoo)
            c2 = in_ch(f)
            mid = args[0]
            if mid != no:
                mid = make_divisible(mid * gw, 8)
            mod = cls(mid, n_rep, dtype=dtype)
            n_rep = 1
        elif kind == "preserve_args1":
            # channel-preserving; first YAML arg is the reference's ignored
            # c2 slot, the rest are real hyperparameters
            c2 = in_ch(f)
            mod = cls(0, *args[1:], dtype=dtype)
        elif kind == "noarg":
            c2 = in_ch(f)
            mod = cls(dtype=dtype)
        elif kind == "hsfpn":
            c2 = in_ch(f)
            mod = cls(*args, dtype=dtype)
        elif kind == "cam":
            fusion = args[0] if args else "weight"
            c1 = in_ch(f)
            c2 = c1 * 3 if fusion == "concat" else c1
            mod = cls(fusion=fusion, dtype=dtype)
        elif kind == "nary":
            c2 = in_ch(f[0])
            mod = cls(dtype=dtype)
        elif kind == "sdi":
            # output matches the first input's channels and resolution
            # (reference yolo.py:1514 records [ch[x] for x in f][0])
            c2 = in_ch(f[0])
            mod = cls(c2, dtype=dtype)
        elif kind == "bifpnsdi":
            c2 = args[0]
            mod = cls(c2, length=len(f), dtype=dtype)
            stride = max(in_stride(x) for x in f)
        elif kind == "bifpns":
            c2 = args[1] if len(args) > 1 else args[0]
            mod = cls(c2, length=len(f), dtype=dtype)
        elif kind == "bifusion":
            # reference yolo.py:1574: c2 = args[3] (out_channels)
            c2 = args[3] if len(args) > 3 else args[-1]
            mod = cls(c2, dtype=dtype)
            stride = in_stride(f[1])
        elif kind == "sf":
            c2 = sum(in_ch(x) for x in f)
            mod = cls(dtype=dtype)
            stride = in_stride(f[1])
        elif kind == "scalseq":
            c2 = args[0]
            mod = cls(c2, dtype=dtype)
            stride = in_stride(f[0])
        elif kind == "attmodel":
            c2 = in_ch(f[0])
            mod = cls(dtype=dtype)
            stride = in_stride(f[0])
        elif kind == "convtranspose":
            c1 = in_ch(f)
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            mod = cls(c2, *args[1:], dtype=dtype)
            s_up = args[2] if len(args) > 2 else mod.s
            stride /= s_up
        elif kind in ("head", "head_v8", "head_rtdetr"):
            head_from = tuple(x if x >= 0 else len(chans) + x for x in f)
            lv = _HEAD_LEVEL_SLICE.get(mname, lambda n: slice(0, n))(len(f))
            head_strides = tuple(float(in_stride(x)) for x in f[lv])
            nl = len(f[lv])
            if kind == "head_rtdetr":
                # NMS-free query decoder (reference: common.py:7514; takes
                # nc + optional [hd, nq] args, no anchors)
                hkw = {}
                if len(args) > 1 and isinstance(args[1], int):
                    hkw["hd"] = make_divisible(args[1] * gw, 8)
                if len(args) > 2:
                    hkw["nq"] = args[2]
                mod = cls(nc=nc, dtype=dtype, **hkw)
            elif kind == "head_v8":
                # anchor-free: no anchor args (reference DetectYOLOv8 takes
                # only nc + channels, yolo.py:725)
                mod = cls(nc=nc, strides=head_strides, dtype=dtype)
            else:
                anchors_px = _resolve_anchors(args[1] if len(args) > 1 else anchors, nl)
                kwargs = {}
                if mname == "Segment":
                    # [nc, anchors, nm, npr]; npr width-scales (ref yolo.py:1620)
                    if len(args) > 2:
                        kwargs["nm"] = args[2]
                    if len(args) > 3:
                        kwargs["npr"] = make_divisible(args[3] * gw, 8)
                mod = cls(
                    nc=nc,
                    anchors=tuple(tuple(a) for a in anchors_px.reshape(nl, -1).tolist()),
                    strides=head_strides,
                    dtype=dtype,
                    **kwargs,
                )
            c2 = 0
            head_name = mname
            stride = 0.0
        else:  # pragma: no cover
            raise AssertionError(kind)

        if n_rep > 1:
            # sequential repeat of a non-csp module (rare; mirror yolo.py:1641)
            mod = _Repeat(tuple(dataclasses.replace(mod) for _ in range(n_rep)))

        modules.append(mod)
        specs.append(LayerSpec(i, f, n_rep, mname, args, int(c2), stride))
        save.extend(x % i for x in ([f] if isinstance(f, int) else list(f)) if x != -1)
        if kind in ("head", "head_v8", "head_rtdetr"):
            # the head reads all inputs via absolute indices (head_from),
            # including any written as -1 — they must be saved too
            save.extend(head_from)
        if i == 0:
            chans, strides = [], []
        chans.append(int(c2))
        strides.append(stride)

    if not head_from:
        # headless graph (e.g. a Classify-tail classification config for
        # detect --classify): no anchors/levels to resolve
        meta = ModelMeta(head_type=head_name or "",
            nc=nc,
            names=[str(i) for i in range(nc)],
            nl=0,
            na=0,
            strides=(),
            anchors_px=np.zeros((0, 0, 2), np.float32),
            save=tuple(sorted(set(save))),
            head_from=(),
            specs=specs,
            yaml=cfg,
        )
        return modules, meta, head_name
    lv = _HEAD_LEVEL_SLICE.get(head_name, lambda n: slice(0, n))(len(head_from))
    nl = len(head_from[lv])
    head_strides = tuple(specs[j].stride for j in head_from[lv])
    anchors_px = _resolve_anchors(anchors, nl)
    meta = ModelMeta(head_type=head_name,
        nc=nc,
        names=[str(i) for i in range(nc)],
        nl=nl,
        na=anchors_px.shape[1],
        strides=head_strides,
        anchors_px=anchors_px,
        save=tuple(sorted(set(save))),
        head_from=head_from,
        specs=specs,
        yaml=cfg,
    )
    return modules, meta, head_name


class _Repeat(nn.Module):
    mods: Tuple[nn.Module, ...]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for m in self.mods:
            x = m(x, train)
        return x


class DetectionModel(nn.Module):
    """Graph-interpreting detection model (reference: Model, yolo.py:1164).

    `__call__` returns the head's raw per-level maps
    [(B, ny, nx, na, no), ...]; use `yolosomi_tpu.models.heads.decode`
    (or Runner.infer) for pixel-space boxes.
    """

    layers: Tuple[nn.Module, ...]
    froms: Tuple[Any, ...]
    save: Tuple[int, ...]
    head_from: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Optional[int] = None, inject=None,
                 features: bool = False):
        """Run the graph. `capture=i` additionally returns layer i's output;
        `inject={i: array}` replaces layer i's output (both power the
        Grad-CAM suite — the functional analogue of the reference's
        forward hooks, yolo-gradcam/yolov5_heatmap.py:22-80).
        `features=True` additionally returns the head's per-level input
        feature maps (the neck outputs) — the hint plane for feature
        distillation (engine/distill.py)."""
        saved: Dict[int, jax.Array] = {}
        captured = None
        feats = None
        prev = x
        n = len(self.layers)
        for i, (m, f) in enumerate(zip(self.layers, self.froms)):
            if i == n - 1 and self.head_from:  # head consumes its `from` list
                feats = [saved[j] for j in self.head_from]
                prev = m(feats, train)
                break
            if isinstance(f, int):
                inp = prev if f == -1 else saved[f if f >= 0 else i + f]
            else:
                inp = [prev if j == -1 else saved[j if j >= 0 else i + j] for j in f]
            prev = m(inp, train)
            if inject is not None and i in inject:
                prev = inject[i]
            if capture == i:
                captured = prev
            if i in self.save:
                saved[i] = prev
        if capture is not None:
            return prev, captured
        if features:
            return prev, tuple(feats or ())
        return prev

    def run_range(self, x, saved_in: Dict[int, jax.Array], lo: int, hi: int, train: bool = False):
        """Run layers [lo, hi) and return (out, saved_out) — the building
        block for pipeline-parallel staging (parallel/pipeline.py): a
        stage receives the previous stage's boundary activation as `x`
        plus the skip-connection tensors it consumes in `saved_in`, and
        emits the same for the next stage. lo/hi are static."""
        saved: Dict[int, jax.Array] = dict(saved_in)
        prev = x
        n = len(self.layers)
        for i in range(lo, hi):
            m, f = self.layers[i], self.froms[i]
            if i == n - 1 and self.head_from:
                return m([saved[j] for j in self.head_from], train), saved
            if isinstance(f, int):
                inp = prev if f == -1 else saved[f if f >= 0 else i + f]
            else:
                inp = [prev if j == -1 else saved[j if j >= 0 else i + j] for j in f]
            prev = m(inp, train)
            if i in self.save:
                saved[i] = prev
        return prev, saved


def build_model(cfg: dict, ch: int = 3, nc: Optional[int] = None, anchors=None, dtype=jnp.float32):
    """Compile a model YAML dict -> (DetectionModel, ModelMeta).

    Mirrors Model.__init__ overrides (reference: yolo.py:1170-1190): an
    explicit `nc` or `anchors` argument overrides the YAML value.
    """
    cfg = dict(cfg)
    if nc is not None and nc != cfg.get("nc"):
        LOGGER.info(f"Overriding model.yaml nc={cfg.get('nc')} with nc={nc}")
        cfg["nc"] = nc
    if anchors is not None:
        LOGGER.info(f"Overriding model.yaml anchors with anchors={anchors}")
        cfg["anchors"] = anchors
    modules, meta, head_name = parse_model(cfg, ch=ch, dtype=dtype)
    froms = tuple(s.f if isinstance(s.f, int) else tuple(s.f) for s in meta.specs)
    model = DetectionModel(
        layers=tuple(modules), froms=froms, save=meta.save, head_from=meta.head_from
    )
    return model, meta


def init_model(model: DetectionModel, meta: ModelMeta, rng=None, imgsz: int = 256):
    """Initialize variables and apply the detection-prior bias init
    (reference: yolo.py:1334-1396 — obj bias log(8/(640/s)^2), cls bias
    log(0.6/(nc-0.99999)))."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    # jit the init: one compile instead of thousands of eager dispatches
    variables = jax.jit(lambda r: model.init(r, dummy, train=False))(rng)
    variables = unfreeze(variables)
    params = variables["params"]
    head_key = f"layers_{len(model.layers) - 1}"
    head = params.get(head_key, {})
    nc = meta.nc
    cls_prior = math.log(0.6 / (nc - 0.99999)) if nc > 1 else 0.0
    for i, s in enumerate(meta.strides):
        obj_prior = math.log(8.0 / (640.0 / s) ** 2)
        mi = head.get(f"m{i}")
        if mi is None:
            continue
        if "b3" in mi:  # DecoupledDetect: separate box/obj and cls convs
            b = np.array(mi["b3"]["conv"]["bias"]).reshape(meta.na, 5)
            b[:, 4] += obj_prior
            mi["b3"]["conv"]["bias"] = jnp.asarray(b.reshape(-1))
            c = np.array(mi["c3"]["conv"]["bias"]).reshape(meta.na, nc)
            c += cls_prior
            mi["c3"]["conv"]["bias"] = jnp.asarray(c.reshape(-1))
        elif "conv" in mi:  # coupled Detect 1x1 conv
            # derive no from the bias itself: Segment carries nm extra mask
            # channels past nc+5 that keep zero priors
            no = np.array(mi["conv"]["bias"]).size // meta.na
            b = np.array(mi["conv"]["bias"]).reshape(meta.na, no)
            b[:, 4] += obj_prior
            b[:, 5 : 5 + nc] += cls_prior
            mi["conv"]["bias"] = jnp.asarray(b.reshape(-1))
    variables["params"] = params
    # plain dicts throughout: mixed FrozenDict/dict trees break tree_map
    # in the EMA update
    return variables


def count_params(variables) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables.get("params", variables)))
