"""TensorFlow.js graph-model export — the last leg of the reference's
export matrix (reference: export.py:246-263, `export_tfjs`, which shells
out to the `tensorflowjs_converter` pip tool; that package is absent
from this image, so this module emits the tfjs graph-model wire format
directly from the frozen GraphDef).

Artifact layout (the format tfjs_converter produces and tf.loadGraphModel
consumes):

    model_web/
      model.json            {"format": "graph-model", "modelTopology": ...,
                             "weightsManifest": [...], "signature": ...}
      group1-shard1ofN.bin  little-endian weight payload, 4 MB shards

- `modelTopology` is the frozen GraphDef as JSON with every extracted
  Const node's tensor payload stripped (dtype + shape kept); the runtime
  re-binds weights by node name from the manifest.
- `weightsManifest` lists one group whose `weights` entries appear in
  payload order; the shard files are the concatenated C-order
  little-endian tensor bytes split at the shard size.
- int64 consts are narrowed to int32 (the converter's own behavior —
  tfjs has no i64); a bounds check guards the narrowing.

Verification on this image is structural (tests/test_export.py): the
manifest + shards reassemble bit-exact to every Const of the source
graph and the stripped topology parses with the node set intact. A
browser/node execution check needs the tfjs runtime, which has no
counterpart here — same claim boundary as the reference's converter
(it also only writes the artifact).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from yolosomi_tpu.utils.general import LOGGER

# GraphDef dtype -> (tfjs manifest dtype, numpy dtype written to shards)
_DTYPES = {
    "float32": ("float32", np.float32),
    "int32": ("int32", np.int32),
    "int64": ("int32", np.int32),  # narrowed, bounds-checked
    "bool": ("bool", np.uint8),
}


def _strip_const(node) -> None:
    """Remove the tensor payload from a Const node in place, keeping
    dtype and shape (what the tfjs converter leaves in the topology)."""
    t = node.attr["value"].tensor
    t.ClearField("tensor_content")
    for field in (
        "float_val", "double_val", "int_val", "int64_val",
        "bool_val", "half_val", "string_val",
    ):
        t.ClearField(field)


def export_tfjs(saved_model_dir: Path, out_dir: Path, shard_bytes: int = 4 << 20) -> Path:
    import tensorflow as tf
    from google.protobuf.json_format import MessageToDict
    from tensorflow.python.framework.convert_to_constants import (
        convert_variables_to_constants_v2,
    )

    model = tf.saved_model.load(str(saved_model_dir))
    conc = model.f.get_concrete_function()
    frozen = convert_variables_to_constants_v2(conc)
    gd = frozen.graph.as_graph_def()

    weights: List[dict] = []
    payload = bytearray()
    skipped = []
    for node in gd.node:
        if node.op != "Const":
            continue
        arr = tf.make_ndarray(node.attr["value"].tensor)
        key = arr.dtype.name
        if key not in _DTYPES:
            skipped.append(f"{node.name}:{key}")
            continue  # exotic dtype: leave inline in the topology
        name, np_dtype = _DTYPES[key]
        if key == "int64":
            lo, hi = np.iinfo(np.int32).min, np.iinfo(np.int32).max
            if arr.size and (arr.min() < lo or arr.max() > hi):
                raise ValueError(f"int64 const {node.name} overflows int32 narrowing")
        weights.append({"name": node.name, "shape": list(arr.shape), "dtype": name})
        payload += np.ascontiguousarray(arr.astype(np_dtype, copy=False)).tobytes()
        _strip_const(node)
    if skipped:
        LOGGER.info(f"tfjs: {len(skipped)} consts kept inline (unsupported dtypes): {skipped[:4]}")

    out_dir.mkdir(parents=True, exist_ok=True)
    n_shards = max(1, -(-len(payload) // shard_bytes))
    paths = [f"group1-shard{i + 1}of{n_shards}.bin" for i in range(n_shards)]
    for i, p in enumerate(paths):
        (out_dir / p).write_bytes(bytes(payload[i * shard_bytes:(i + 1) * shard_bytes]))

    def _sig(tensors) -> Dict[str, dict]:
        out = {}
        for t in tensors:
            out[t.name] = {
                "name": t.name,
                "dtype": t.dtype.name,
                "tensorShape": {"dim": [{"size": str(d)} for d in t.shape]},
            }
        return out

    model_json = {
        "format": "graph-model",
        "generatedBy": f"tensorflow {tf.__version__}",
        "convertedBy": "yolosomi_tpu export.py (tfjs graph-model writer)",
        "signature": {"inputs": _sig(frozen.inputs), "outputs": _sig(frozen.outputs)},
        "modelTopology": MessageToDict(gd),
        "weightsManifest": [{"paths": paths, "weights": weights}],
    }
    (out_dir / "model.json").write_text(json.dumps(model_json))
    LOGGER.info(
        f"TFJS: {out_dir} ({len(weights)} weights, {len(payload) / 1e6:.1f} MB, "
        f"{n_shards} shard(s))"
    )
    return out_dir


def read_tfjs_weights(out_dir: Path) -> Tuple[dict, Dict[str, np.ndarray]]:
    """Reassemble {const_name: ndarray} from a tfjs graph-model dir —
    the independent reader used by the round-trip test."""
    out_dir = Path(out_dir)
    model_json = json.loads((out_dir / "model.json").read_text())
    out: Dict[str, np.ndarray] = {}
    for group in model_json["weightsManifest"]:
        blob = b"".join((out_dir / p).read_bytes() for p in group["paths"])
        off = 0
        for w in group["weights"]:
            np_dtype = {"float32": np.float32, "int32": np.int32, "bool": np.uint8}[w["dtype"]]
            n = int(np.prod(w["shape"], dtype=np.int64)) if w["shape"] else 1
            nbytes = n * np.dtype(np_dtype).itemsize
            arr = np.frombuffer(blob[off:off + nbytes], dtype=np_dtype).reshape(w["shape"])
            out[w["name"]] = arr
            off += nbytes
        assert off == len(blob), f"manifest/shard size mismatch: {off} != {len(blob)}"
    return model_json, out
