"""ONNX export: flax variables -> torch mirror -> torch.onnx serializer.

Counterpart of the reference's export_onnx (export.py:64-130). The image
ships torch but not the `onnx` package; torch's TorchScript exporter
serializes the ModelProto in C++ and only imports `onnx` for an
onnxscript-function repackaging step that is a no-op for graphs without
custom onnxscript ops (torchscript_exporter/onnx_proto_utils.py:
_add_onnxscript_fn returns the bytes unchanged when no ONNXFunction node
exists). All our mirror graphs lower to standard ATen->ONNX ops, so that
step is safely bypassed here.

Validation without onnxruntime happens on two axes:
  - numerics: the torch mirror itself is asserted against the flax model
    (tests/test_onnx_export.py), and the ONNX graph is torch's own
    serialization of that mirror;
  - structure: `onnx_summary` walks the protobuf wire format directly
    (schema-less varint/length-delimited parser, field numbers from the
    public onnx.proto: ModelProto.graph=7, GraphProto.node=1/
    initializer=5/input=11/output=12, NodeProto.op_type=4) and reports
    the op histogram + tensor counts.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax

from yolosomi_tpu.utils.general import LOGGER
from yolosomi_tpu.utils.torch_convert import _torch_key_candidates


def _to_torch_leaf(v: np.ndarray, torch_shape: Tuple[int, ...]) -> np.ndarray:
    """Inverse of torch_convert._convert_leaf: our layout -> torch layout."""
    v = np.asarray(v, np.float32)
    ts = tuple(torch_shape)
    if v.ndim == 5:
        v = v.transpose(0, 4, 3, 1, 2)  # K,kh,kw,I,O -> K,O,I,kh,kw
    elif v.ndim == 2 and len(ts) == 4 and ts[2:] == (1, 1):
        v = v.T[:, :, None, None]  # our Dense kernel -> torch 1x1 Conv2d
    elif v.ndim == 4:
        v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    elif v.ndim == 2 and tuple(v.shape) != ts:
        v = v.T  # dense (in,out) -> (out,in)
    if tuple(v.shape) != ts:
        raise ValueError(f"shape mismatch {v.shape} vs {ts}")
    # owned, writable, contiguous for torch.from_numpy (jax buffers are
    # exposed as read-only numpy views)
    return np.array(v, np.float32)


def state_dict_from_variables(variables: dict, tmodel) -> Tuple[dict, List[str]]:
    """Map our variable tree onto a torch mirror's state_dict (the inverse
    walk of torch_convert.convert_state_dict — same key derivation, so a
    round trip is exact). Returns (state_dict, unmatched_torch_keys);
    buffers with no flax counterpart (anchors/grids/num_batches_tracked)
    keep their constructed values."""
    import torch

    ours: Dict[str, np.ndarray] = {}
    for collection in ("params", "batch_stats"):
        flat, _ = jax.tree_util.tree_flatten_with_path(variables.get(collection, {}))
        for path, leaf in flat:
            keys = [p.key if hasattr(p, "key") else str(p) for p in path]
            # register every candidate name (ODConv bias-bank ambiguity);
            # the torch model's own key set picks the right one below
            for tk in _torch_key_candidates(keys, collection):
                ours.setdefault(tk, np.asarray(leaf, np.float32))

    sd = tmodel.state_dict()
    out, missing = {}, []
    for k, v in sd.items():
        base = k.rsplit(".", 1)[-1]
        if (
            base == "num_batches_tracked"
            or base == "anchors"
            or base.startswith("grid")
            or base.startswith("anchor")
        ):
            out[k] = v
            continue
        if k not in ours:
            missing.append(k)
            out[k] = v
            continue
        out[k] = torch.from_numpy(_to_torch_leaf(ours[k], tuple(v.shape)))
    if missing:
        LOGGER.warning(f"onnx_export: {len(missing)} torch keys unmatched, e.g. {missing[:5]}")
    return out, missing


def export_onnx(
    cfg: dict,
    meta,
    variables: dict,
    path: str,
    imgsz: int = 640,
    batch: int = 1,
    opset: int = 12,
    decode: bool = True,
    dynamic_batch: bool = False,
):
    """Export the model to ONNX. Returns (torch_mirror, unmatched_keys) so
    callers can run their own parity checks against the mirror."""
    import torch

    from yolosomi_tpu.utils.torch_mirror import build_torch_mirror

    tmodel = build_torch_mirror(cfg, meta, imgsz=imgsz, decode=decode)
    sd, missing = state_dict_from_variables(variables, tmodel)
    tmodel.load_state_dict(sd)
    tmodel.eval()

    # bypass the onnxscript repackaging step (needs the absent `onnx`
    # package; provably a no-op for graphs without ONNXFunction nodes)
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

    x = torch.zeros(batch, 3, imgsz, imgsz)
    dyn = {"images": {0: "batch"}, "output": {0: "batch"}} if dynamic_batch else None
    with torch.no_grad():
        torch.onnx.export(
            tmodel,
            x,
            path,
            opset_version=opset,
            input_names=["images"],
            output_names=["output"],
            dynamic_axes=dyn,
            dynamo=False,
        )
    return tmodel, missing


def export_torchscript(
    cfg: dict,
    meta,
    variables: dict,
    path: str,
    imgsz: int = 640,
    batch: int = 1,
    decode: bool = True,
):
    """TorchScript export via the same mirror (reference export.py:50-63).
    Fully executable on this image — tests load the artifact back and
    assert box parity against the flax model."""
    import torch

    from yolosomi_tpu.utils.torch_mirror import build_torch_mirror

    tmodel = build_torch_mirror(cfg, meta, imgsz=imgsz, decode=decode)
    sd, missing = state_dict_from_variables(variables, tmodel)
    tmodel.load_state_dict(sd)
    tmodel.eval()
    x = torch.zeros(batch, 3, imgsz, imgsz)
    with torch.no_grad():
        ts = torch.jit.trace(tmodel, x)
    ts.save(str(path))
    return tmodel, missing


# ---- schema-less protobuf wire walker ------------------------------------


def _walk(buf: bytes):
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
        if wt == 0:  # varint
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
        elif wt == 2:  # length-delimited
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


def onnx_summary(path: str) -> dict:
    """Structural summary of an .onnx file via direct wire-format parsing:
    {'ops': {op_type: count}, 'n_nodes', 'n_initializers', 'inputs',
    'outputs', 'opset'}."""
    data = open(path, "rb").read()
    model = _walk(data)
    graph = next(v for f, w, v in model if f == 7 and w == 2)
    opset = 0
    for f, w, v in model:
        if f == 8 and w == 2:  # opset_import: OperatorSetIdProto.version=2
            for f2, w2, v2 in _walk(v):
                if f2 == 2 and w2 == 0:
                    opset = max(opset, v2)
    g = _walk(graph)
    ops: Dict[str, int] = {}
    n_nodes = 0
    for f, w, v in g:
        if f == 1 and w == 2:  # node
            n_nodes += 1
            for f2, w2, v2 in _walk(v):
                if f2 == 4 and w2 == 2:  # op_type
                    name = v2.decode()
                    ops[name] = ops.get(name, 0) + 1
    def _names(field):
        out = []
        for f, w, v in g:
            if f == field and w == 2:
                for f2, w2, v2 in _walk(v):
                    if f2 == 1 and w2 == 2:  # ValueInfoProto.name
                        out.append(v2.decode())
        return out

    return {
        "ops": ops,
        "n_nodes": n_nodes,
        "n_initializers": sum(1 for f, w, v in g if f == 5 and w == 2),
        "inputs": _names(11),
        "outputs": _names(12),
        "opset": opset,
    }
