"""CoreML .mlmodel export — the final leg of the reference's export
matrix (reference: export.py:130-161, `export_coreml`, which converts a
TorchScript trace through the `coremltools` pip package; that package is
absent from this image, so this module writes the CoreML NeuralNetwork
protobuf wire format directly).

Route: flax variables -> torch mirror (utils/torch_mirror, already
parity-pinned to the flax model by tests/test_onnx_export.py) -> walk the
mirror's module graph and lower each block to classic CoreML NN layers
(convolution with BN folded, sigmoid+multiply for SiLU, SAME-padded
max-pool for SPPF, slice quads for Focus, scale+add for BiFPN). This is
the same trust chain the reference uses (torch graph == CoreML graph by
the converter); here the converter is ours.

Claim boundary (same style as the tfjs leg): there is no CoreML runtime
on this image, so on-device execution cannot be checked. What IS checked,
end-to-end and executed (tests/test_coreml_export.py):
  - the artifact re-parses from raw bytes with an independent schema-less
    wire walker into a layer graph, and
  - `CoreMLExecutor` runs that parsed graph (torch functional ops,
    reading ONLY the .mlmodel bytes) and matches the mirror's raw head
    maps at float tolerance — i.e. the semantics we encoded are the
    model's semantics.
Field numbers/enums are transcribed from Apple's published Model.proto /
NeuralNetwork.proto (specificationVersion 4): Model.description=2,
.neuralNetwork=500; NeuralNetworkLayer oneof convolution=100/pooling=120/
activation=130/upsample=210/add=230/multiply=231/scale=245/concat=320/
slice=350; ConvolutionLayerParams outputChannels=1/kernelChannels=2/
nGroups=10/kernelSize=20/stride=30/dilationFactor=40/valid=50/same=51/
hasBias=70/weights=90/bias=91; ArrayFeatureType.FLOAT32=65568.

Scope: the yolov5-family graphs (Conv/DWConv/Focus/Bottleneck/C3/SPP/
SPPF/Upsample/Concat/BiFPN + coupled Detect), i.e. the same graphs the
reference's own CoreML leg was exercised on (yolov5s). Outputs are the
raw per-level head maps (B, na*(5+nc), ny, nx) — the reference's CoreML
artifact also ships the undecoded training-form head (its convert runs
on the export-mode trace, export.py:139).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from yolosomi_tpu.utils.general import LOGGER

FLOAT32 = 65568  # ArrayFeatureType.ArrayDataType.FLOAT32

# ---- protobuf wire writer -------------------------------------------------


def _vint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(fnum: int, wt: int) -> bytes:
    return _vint((fnum << 3) | wt)


def _u(fnum: int, v: int) -> bytes:
    """varint field"""
    return _key(fnum, 0) + _vint(v)


def _ld(fnum: int, payload: bytes) -> bytes:
    """length-delimited field"""
    return _key(fnum, 2) + _vint(len(payload)) + payload


def _s(fnum: int, text: str) -> bytes:
    return _ld(fnum, text.encode())


def _packed_u64(fnum: int, vals) -> bytes:
    return _ld(fnum, b"".join(_vint(v) for v in vals))


def _packed_f32(fnum: int, arr: np.ndarray) -> bytes:
    return _ld(fnum, np.ascontiguousarray(arr, np.float32).tobytes())


def _weights(arr: np.ndarray) -> bytes:
    """WeightParams with floatValue (field 1, packed floats)."""
    return _packed_f32(1, np.asarray(arr, np.float32).reshape(-1))


def _border(ph: int, pw: int) -> bytes:
    """BorderAmounts{borderAmounts:[EdgeSizes(h), EdgeSizes(w)]} (field 10;
    EdgeSizes.startEdgeSize=1/.endEdgeSize=2)."""
    edge_h = _u(1, ph) + _u(2, ph)
    edge_w = _u(1, pw) + _u(2, pw)
    return _ld(10, edge_h) + _ld(10, edge_w)


# ---- layer emitters -------------------------------------------------------


class _Emitter:
    def __init__(self) -> None:
        self.layers: List[bytes] = []
        self._n = 0

    def _name(self, hint: str) -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def _layer(self, name: str, inputs: List[str], outputs: List[str], body: bytes) -> None:
        msg = _s(1, name)
        for i in inputs:
            msg += _s(2, i)
        for o in outputs:
            msg += _s(3, o)
        self.layers.append(msg + body)

    def conv(
        self,
        inp: str,
        W: np.ndarray,
        b: Optional[np.ndarray],
        stride: int = 1,
        pad: Optional[int] = None,
        groups: int = 1,
        hint: str = "conv",
    ) -> str:
        """ConvolutionLayerParams (oneof field 100). W is OIHW (torch
        layout); pad defaults to k//2 (torch autopad), encoded as
        ValidPadding with explicit symmetric border amounts — exact
        zero-pad torch semantics at any stride."""
        co, cig, kh, kw = W.shape
        p = kh // 2 if pad is None else pad
        body = (
            _u(1, co)
            + _u(2, cig * groups)
            + _u(10, groups)
            + _packed_u64(20, [kh, kw])
            + _packed_u64(30, [stride, stride])
            + _packed_u64(40, [1, 1])
            + _ld(50, _ld(1, _border(p, p)))  # ValidPadding.paddingAmounts
            + _u(70, 1 if b is not None else 0)
            + _ld(90, _weights(W))
        )
        if b is not None:
            body += _ld(91, _weights(b))
        out = self._name(hint)
        self._layer(out, [inp], [out], _ld(100, body))
        return out

    def silu(self, inp: str) -> str:
        """x * sigmoid(x): activation(sigmoid) + multiply."""
        sig = self._name("sig")
        # ActivationParams.sigmoid = 40 (ActivationSigmoid is empty)
        self._layer(sig, [inp], [sig], _ld(130, _ld(40, b"")))
        out = self._name("silu")
        self._layer(out, [inp, sig], [out], _ld(231, b""))  # MultiplyLayerParams
        return out

    def maxpool_same(self, inp: str, k: int) -> str:
        """Stride-1 SAME max pool (torch MaxPool2d(k,1,k//2): the zero pad
        never wins because CoreML SAME pooling excludes padding)."""
        body = (
            _u(1, 0)  # PoolingType.MAX
            + _packed_u64(10, [k, k])
            + _packed_u64(20, [1, 1])
            + _ld(31, b"")  # SamePadding (symmetric here: pad_total = k-1... k odd)
        )
        out = self._name("pool")
        self._layer(out, [inp], [out], _ld(120, body))
        return out

    def upsample2x(self, inp: str) -> str:
        body = _packed_u64(1, [2, 2]) + _u(5, 0)  # scalingFactor, mode NN
        out = self._name("up")
        self._layer(out, [inp], [out], _ld(210, body))
        return out

    def concat(self, inputs: List[str]) -> str:
        out = self._name("cat")
        self._layer(out, inputs, [out], _ld(320, b""))  # channel concat
        return out

    def add(self, a: str, b: str) -> str:
        out = self._name("add")
        self._layer(out, [a, b], [out], _ld(230, b""))
        return out

    def scale_scalar(self, inp: str, v: float) -> str:
        """ScaleLayerParams: shapeScale=[1], scale=WeightParams([v])."""
        body = _packed_u64(1, [1]) + _ld(2, _weights(np.array([v], np.float32)))
        out = self._name("scale")
        self._layer(out, [inp], [out], _ld(245, body))
        return out

    def slice2(self, inp: str, axis: int, start: int) -> str:
        """Stride-2 slice along axis (1=height, 2=width), the Focus quad.
        SliceLayerParams startIndex=1/endIndex=2/stride=3/axis=4."""
        body = _u(1, start) + _u(2, (1 << 62) - 1) + _u(3, 2) + _u(4, axis)
        out = self._name("slice")
        self._layer(out, [inp], [out], _ld(350, body))
        return out

    def rename(self, inp: str, out: str) -> None:
        """Identity via ActivationLinear(alpha=1): binds a tensor to a
        stable output name."""
        # ActivationLinear{float alpha=1}: field 1 is fixed32 -> key 0x0d
        lin = _ld(5, b"\x0d" + struct.pack("<f", 1.0))
        self._layer(out, [inp], [out], _ld(130, lin))


# ---- module lowering ------------------------------------------------------


def _fold_bn(conv, bn) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BatchNorm into conv weights (reference torch_utils.py:202-222
    does the same fusion at deploy time)."""
    W = conv.weight.detach().numpy().astype(np.float64)
    b = (
        conv.bias.detach().numpy().astype(np.float64)
        if conv.bias is not None
        else np.zeros(W.shape[0])
    )
    gamma = bn.weight.detach().numpy().astype(np.float64)
    beta = bn.bias.detach().numpy().astype(np.float64)
    mean = bn.running_mean.detach().numpy().astype(np.float64)
    var = bn.running_var.detach().numpy().astype(np.float64)
    scale = gamma / np.sqrt(var + bn.eps)
    return (W * scale[:, None, None, None]).astype(np.float32), (
        (b - mean) * scale + beta
    ).astype(np.float32)


class _Lowerer:
    """Lower torch-mirror modules to CoreML layers."""

    def __init__(self, em: _Emitter) -> None:
        self.em = em

    def tconv(self, m, inp: str) -> str:
        W, b = _fold_bn(m.conv, m.bn)
        out = self.em.conv(
            inp,
            W,
            b,
            stride=m.conv.stride[0],
            pad=m.conv.padding[0],
            groups=m.conv.groups,
        )
        return self.em.silu(out)

    def bottleneck(self, m, inp: str) -> str:
        y = self.tconv(m.cv2, self.tconv(m.cv1, inp))
        return self.em.add(inp, y) if m.add else y

    def c3(self, m, inp: str) -> str:
        a = self.tconv(m.cv1, inp)
        for bot in m.m:
            a = self.bottleneck(bot, a)
        b = self.tconv(m.cv2, inp)
        return self.tconv(m.cv3, self.em.concat([a, b]))

    def sppf(self, m, inp: str) -> str:
        x = self.tconv(m.cv1, inp)
        k = m.mp.kernel_size
        y1 = self.em.maxpool_same(x, k)
        y2 = self.em.maxpool_same(y1, k)
        y3 = self.em.maxpool_same(y2, k)
        return self.tconv(m.cv2, self.em.concat([x, y1, y2, y3]))

    def spp(self, m, inp: str) -> str:
        x = self.tconv(m.cv1, inp)
        pools = [self.em.maxpool_same(x, mp.kernel_size) for mp in m.mp]
        return self.tconv(m.cv2, self.em.concat([x] + pools))

    def focus(self, m, inp: str) -> str:
        # torch order: [::2,::2], [1::2,::2], [::2,1::2], [1::2,1::2]
        quads = []
        for hs, ws in ((0, 0), (1, 0), (0, 1), (1, 1)):
            h = self.em.slice2(inp, 1, hs)
            quads.append(self.em.slice2(h, 2, ws))
        return self.tconv(m.conv, self.em.concat(quads))

    def bifpn(self, m, inputs: List[str]) -> str:
        import torch

        w = m.weight.detach()
        wn = (w / (torch.sum(w * torch.sigmoid(w)) + m.epsilon)).numpy()
        out = self.em.scale_scalar(inputs[0], float(wn[0]))
        for i in range(1, len(inputs)):
            out = self.em.add(out, self.em.scale_scalar(inputs[i], float(wn[i])))
        return out


def export_coreml(
    cfg: dict,
    meta,
    variables: dict,
    path: str,
    imgsz: int = 640,
) -> Tuple[object, List[str]]:
    """Export to a CoreML .mlmodel. Returns (torch_mirror, unmatched_keys)
    so callers can run parity checks against the mirror (the executed
    check lives in tests/test_coreml_export.py)."""
    import torch.nn as nn

    from yolosomi_tpu.utils.onnx_export import state_dict_from_variables
    from yolosomi_tpu.utils.torch_mirror import (
        TC3,
        TSPP,
        TSPPF,
        TBiFPN,
        TBottleneck,
        TConcat,
        TConv,
        TDetect,
        TFocus,
        build_torch_mirror,
    )

    tmodel = build_torch_mirror(cfg, meta, imgsz=imgsz, decode=False)
    sd, missing = state_dict_from_variables(variables, tmodel)
    tmodel.load_state_dict(sd)
    tmodel.eval()

    em = _Emitter()
    lo = _Lowerer(em)
    tensors: Dict[int, str] = {}  # layer index -> output tensor name
    out_names: List[str] = []
    out_shapes: List[Tuple[int, ...]] = []

    def src(i: int, f) -> str:
        j = i + f if f < 0 else f
        return "images" if (f == -1 and i == 0) else tensors[j]

    for i, (m, f) in enumerate(zip(tmodel.model, tmodel._froms)):
        if isinstance(m, TConv):
            tensors[i] = lo.tconv(m, src(i, f))
        elif isinstance(m, TFocus):
            tensors[i] = lo.focus(m, src(i, f))
        elif isinstance(m, TBottleneck):
            tensors[i] = lo.bottleneck(m, src(i, f))
        elif isinstance(m, TC3):
            tensors[i] = lo.c3(m, src(i, f))
        elif isinstance(m, TSPPF):
            tensors[i] = lo.sppf(m, src(i, f))
        elif isinstance(m, TSPP):
            tensors[i] = lo.spp(m, src(i, f))
        elif isinstance(m, nn.Upsample):
            tensors[i] = em.upsample2x(src(i, f))
        elif isinstance(m, TConcat):
            tensors[i] = em.concat([src(i, j) for j in f])
        elif isinstance(m, TBiFPN):
            tensors[i] = lo.bifpn(m, [src(i, j) for j in f])
        elif isinstance(m, TDetect):
            for li, (conv, j, s) in enumerate(zip(m.m, f, m.strides)):
                W = conv.weight.detach().numpy().astype(np.float32)
                b = conv.bias.detach().numpy().astype(np.float32)
                raw = em.conv(tensors[j], W, b, stride=1, pad=0, hint=f"head{li}")
                name = f"p{li + 3}"
                em.rename(raw, name)
                out_names.append(name)
                out_shapes.append((1, W.shape[0], imgsz // s, imgsz // s))
        else:
            raise NotImplementedError(
                f"no CoreML lowering for {type(m).__name__} (row {i}) — the "
                "coreml leg covers the yolov5-family graphs"
            )

    # ---- assemble Model ----
    def feature(name: str, shape: Tuple[int, ...]) -> bytes:
        arr = _packed_u64(1, shape) + _u(2, FLOAT32)  # ArrayFeatureType
        ftype = _ld(5, arr)  # FeatureType.multiArrayType
        return _s(1, name) + _ld(3, ftype)

    desc = _ld(1, feature("images", (1, 3, imgsz, imgsz)))
    for n, shp in zip(out_names, out_shapes):
        desc += _ld(10, feature(n, shp))
    desc += _ld(100, _s(1, "YOLO-SOMI TPU framework CoreML export"))

    nnet = b"".join(_ld(1, layer) for layer in em.layers)
    nnet += _u(5, 1)  # arrayInputShapeMapping = EXACT_ARRAY_MAPPING

    model = _u(1, 4) + _ld(2, desc) + _ld(500, nnet)
    with open(path, "wb") as fh:
        fh.write(model)
    LOGGER.info(
        f"coreml: wrote {path} ({len(model) / 1e6:.1f} MB, "
        f"{len(em.layers)} layers, outputs {out_names})"
    )
    return tmodel, missing


# ---- independent reader + executor ---------------------------------------


def _walk(buf: bytes):
    """Schema-less protobuf walk (same shape as onnx_export._walk)."""
    i, fields = 0, []
    n = len(buf)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            fields.append((fnum, wt, v))
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            fields.append((fnum, wt, buf[i : i + ln]))
            i += ln
        elif wt == 5:
            fields.append((fnum, wt, buf[i : i + 4]))
            i += 4
        elif wt == 1:
            fields.append((fnum, wt, buf[i : i + 8]))
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt} at byte {i}")
    return fields


def _unpack_u64(payload: bytes) -> List[int]:
    out = []
    i = 0
    while i < len(payload):
        v = 0
        shift = 0
        while True:
            b = payload[i]
            i += 1
            v |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        out.append(v)
    return out


def parse_mlmodel(path: str) -> dict:
    """Parse a .mlmodel into {'spec_version', 'inputs', 'outputs',
    'layers': [{'name','inputs','outputs','type','params'}]}."""
    data = open(path, "rb").read()
    top = _walk(data)
    spec_version = next((v for f, w, v in top if f == 1 and w == 0), None)
    desc = next(v for f, w, v in top if f == 2 and w == 2)
    nnet = next(v for f, w, v in top if f == 500 and w == 2)

    def features(field: int) -> List[dict]:
        out = []
        for f, w, v in _walk(desc):
            if f == field and w == 2:
                fd = _walk(v)
                name = next(x for ff, ww, x in fd if ff == 1).decode()
                ftype = next(x for ff, ww, x in fd if ff == 3)
                arr = next(x for ff, ww, x in _walk(ftype) if ff == 5)
                shape = next(
                    (_unpack_u64(x) for ff, ww, x in _walk(arr) if ff == 1 and ww == 2), []
                )
                out.append({"name": name, "shape": shape})
        return out

    layer_types = {
        100: "convolution",
        120: "pooling",
        130: "activation",
        210: "upsample",
        230: "add",
        231: "multiply",
        245: "scale",
        320: "concat",
        350: "slice",
    }
    layers = []
    for f, w, v in _walk(nnet):
        if f != 1 or w != 2:
            continue
        fields = _walk(v)
        name = ""
        inputs, outputs = [], []
        ltype, params = None, None
        for ff, ww, x in fields:
            if ff == 1:
                name = x.decode()
            elif ff == 2:
                inputs.append(x.decode())
            elif ff == 3:
                outputs.append(x.decode())
            elif ff in layer_types:
                ltype, params = layer_types[ff], x
        layers.append(
            {"name": name, "inputs": inputs, "outputs": outputs, "type": ltype, "params": params}
        )
    return {
        "spec_version": spec_version,
        "inputs": features(1),
        "outputs": features(10),
        "layers": layers,
    }


def _weight_array(payload: bytes) -> np.ndarray:
    raw = next(x for f, w, x in _walk(payload) if f == 1 and w == 2)
    return np.frombuffer(raw, "<f4").copy()


class CoreMLExecutor:
    """Execute a parsed .mlmodel with torch functional ops. Reads ONLY the
    artifact bytes — the executed half of the export's verification."""

    def __init__(self, path: str) -> None:
        self.spec = parse_mlmodel(path)

    def __call__(self, x: "np.ndarray") -> Dict[str, np.ndarray]:
        import torch
        import torch.nn.functional as F

        env: Dict[str, "torch.Tensor"] = {
            self.spec["inputs"][0]["name"]: torch.from_numpy(np.asarray(x, np.float32))
        }
        for layer in self.spec["layers"]:
            ins = [env[n] for n in layer["inputs"]]
            p = _walk(layer["params"]) if layer["params"] is not None else []

            def get(fnum, default=None):
                return next((v for f, w, v in p if f == fnum), default)

            t = layer["type"]
            if t == "convolution":
                co = get(1)
                groups = get(10, 1)
                kh, kw = _unpack_u64(get(20))
                sh, sw = _unpack_u64(get(30))
                valid = get(50)
                if valid is None:
                    raise ValueError("executor: only ValidPadding convs are emitted")
                border = next(x for f, w, x in _walk(valid) if f == 1)
                edges = [x for f, w, x in _walk(border) if f == 10]
                ph = next((v for f, w, v in _walk(edges[0]) if f == 1), 0)
                pw = next((v for f, w, v in _walk(edges[1]) if f == 1), 0)
                W = _weight_array(get(90))
                cin_total = get(2)
                W = W.reshape(co, cin_total // groups, kh, kw)
                b = _weight_array(get(91)) if get(70, 0) else None
                out = F.conv2d(
                    ins[0],
                    torch.from_numpy(W),
                    torch.from_numpy(b) if b is not None else None,
                    stride=(sh, sw),
                    padding=(ph, pw),
                    groups=groups,
                )
            elif t == "pooling":
                kh, kw = _unpack_u64(get(10))
                # stride-1 SAME max pool == torch (k,1,k//2) (pad excluded)
                out = F.max_pool2d(ins[0], (kh, kw), stride=1, padding=kh // 2)
            elif t == "activation":
                kind = layer["params"]
                fields = {f: v for f, w, v in p}
                if 40 in fields:  # sigmoid
                    out = torch.sigmoid(ins[0])
                elif 5 in fields:  # linear (identity rename)
                    alpha = next(
                        struct.unpack("<f", v)[0]
                        for f, w, v in _walk(fields[5])
                        if f == 1 and w == 5
                    )
                    out = ins[0] * alpha
                else:
                    raise ValueError(f"unknown activation fields {sorted(fields)}")
            elif t == "upsample":
                sf = _unpack_u64(get(1))
                out = F.interpolate(ins[0], scale_factor=(sf[0], sf[1]), mode="nearest")
            elif t == "add":
                out = ins[0]
                for extra in ins[1:]:
                    out = out + extra
            elif t == "multiply":
                out = ins[0]
                for extra in ins[1:]:
                    out = out * extra
            elif t == "scale":
                v = _weight_array(get(2))
                out = ins[0] * float(v[0])
            elif t == "concat":
                out = torch.cat(ins, 1)
            elif t == "slice":
                start, stride, axis = get(1, 0), get(3, 1), get(4, 0)
                if axis == 1:
                    out = ins[0][:, :, start::stride, :]
                elif axis == 2:
                    out = ins[0][:, :, :, start::stride]
                else:
                    out = ins[0][:, start::stride]
            else:
                raise ValueError(f"unknown layer type {t}")
            env[layer["outputs"][0]] = out
        return {o["name"]: env[o["name"]].numpy() for o in self.spec["outputs"]}


def coreml_summary(path: str) -> dict:
    """Structural summary: layer-type histogram + IO (the CoreML analogue
    of onnx_export.onnx_summary)."""
    spec = parse_mlmodel(path)
    hist: Dict[str, int] = {}
    for layer in spec["layers"]:
        hist[str(layer["type"])] = hist.get(str(layer["type"]), 0) + 1
    return {
        "spec_version": spec["spec_version"],
        "n_layers": len(spec["layers"]),
        "ops": hist,
        "inputs": [i["name"] for i in spec["inputs"]],
        "outputs": [o["name"] for o in spec["outputs"]],
    }
