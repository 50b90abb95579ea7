"""Torch-checkpoint -> JAX-variables converter (convert-time only).

The reference pickles whole nn.Modules into .pt files and reloads them
with attempt_load (experimental.py:90-122). This converter maps a torch
*state_dict* onto our flax variable tree by walking OUR tree and
deriving the expected torch key for each leaf (SURVEY.md §5.4: "must NOT
require torch at runtime, only at convert time" — this module only
handles numpy arrays; loading the .pt happens in tools/convert_torch.py).

Key mapping rules (our path -> torch key):
    layers_<i>/...           -> model.<i>....
    .../m<k>/...             -> ....m.<k>....   (module lists)
    .../cv/conv/kernel       -> ....conv.weight (Conv wrapper: BN'd conv)
    .../conv/kernel          -> ....weight      (bare ConvRaw, e.g. head convs)
    .../bn/{scale,bias}      -> ....bn.{weight,bias}
    .../bn/{mean,var}        -> ....bn.{running_mean,running_var}
    Dense kernels            -> transposed .weight

Conv kernels transpose OIHW -> HWIO. Unmatched leaves keep their
initialized values and are reported (the intersect_dicts contract,
reference train.py:102-108).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from yolosomi_tpu.utils.general import LOGGER

_LIST_RE = re.compile(r"^(m|dw|pw|bn_dw|bn_pw|ia|im|tr)(\d+)$")


def _path_to_torch_key(path: List[str], collection: str) -> str:
    """Translate one of our tree paths to the expected torch state_dict key."""
    parts = []
    for p in path[:-1]:
        if p.startswith("layers_"):
            parts.append(f"model.{p.split('_')[1]}")
            continue
        m = _LIST_RE.match(p)
        if m:
            parts.append(f"{m.group(1)}.{m.group(2)}")
            continue
        parts.append(p)
    leaf = path[-1]
    key = ".".join(parts)
    # CBAM channel-attention MLP: our fc1/fc2 Denses correspond to the
    # reference's shared_MLP Sequential slots 0 and 2 (common.py:339-360)
    key = key.replace(".channel_attention.fc1", ".channel_attention.shared_MLP.0")
    key = key.replace(".channel_attention.fc2", ".channel_attention.shared_MLP.2")
    # SEAM (reference common.py:8448-8471): the depthwise-residual stack is
    # one nn.Sequential named DCovN — patch conv at [0], its BN at [2], then
    # per repeat i a Sequential at [3+i] holding Residual(fn=[conv,GELU,BN]),
    # a pointwise conv at [1] and its BN at [3]
    key = key.replace(".dcov_patch", ".DCovN.0")
    key = key.replace(".bn_patch", ".DCovN.2")
    key = re.sub(r"\.bn_dw\.(\d+)", lambda m: f".DCovN.{3 + int(m.group(1))}.0.fn.2", key)
    key = re.sub(r"\.bn_pw\.(\d+)", lambda m: f".DCovN.{3 + int(m.group(1))}.3", key)
    key = re.sub(r"\.dw\.(\d+)", lambda m: f".DCovN.{3 + int(m.group(1))}.0.fn.0", key)
    key = re.sub(r"\.pw\.(\d+)", lambda m: f".DCovN.{3 + int(m.group(1))}.1", key)
    # head module lists whose flax stem differs from the torch attribute:
    # ASFF_Detect keeps its fusers in `asffs` (yolo.py:177); IAuxDetect's
    # aux convs in `m2` (yolo.py:524)
    key = re.sub(r"(^|\.)asff(\d+)\.", lambda m: f"{m.group(1)}asffs.{m.group(2)}.", key)
    key = re.sub(r"(^|\.)m2_(\d+)\.", lambda m: f"{m.group(1)}m2.{m.group(2)}.", key)
    # TSCODE_Detect (yolo.py:646-656): six per-level ModuleLists; our
    # m_cls{i}_{j} / m_reg_conf{i}_{j} flatten the inner Sequentials
    key = re.sub(
        r"(^|\.)m_(sce|dpe|cls|reg_conf|reg|conf)(\d+)(?:_(\d+))?\.",
        lambda m: f"{m.group(1)}m_{m.group(2)}.{m.group(3)}."
        + (f"{m.group(4)}." if m.group(4) is not None else ""),
        key,
    )
    # DPE's up_forp{2,3} are Sequential(Upsample, Conv) — the Conv is slot 1
    key = key.replace(".up_forp2.", ".up_forp2.1.").replace(".up_forp3.", ".up_forp3.1.")
    # Swin Mlp (common.py:1147): our flat mlp_fc1/mlp_fc2 names live in the
    # reference's `mlp` submodule
    key = key.replace(".mlp_fc1", ".mlp.fc1").replace(".mlp_fc2", ".mlp.fc2")
    # anchor-free v8/v11 heads (yolo.py:187/725/778): per-level Sequential
    # branches cv2.{i}.{j} / cv3.{i}.{j}; our flax names flatten them to
    # cv2_{i}_{j} (and one2one_cv2_{i}_{j} for the end2end copies)
    key = re.sub(
        r"(^|\.)(one2one_)?(cv2|cv3)_(\d+)_(\d+)\.",
        lambda m: f"{m.group(1)}{m.group(2) or ''}{m.group(3)}.{m.group(4)}.{m.group(5)}.",
        key,
    )

    if collection == "batch_stats":
        stat = {"mean": "running_mean", "var": "running_var"}[leaf]
        return f"{key}.{stat}"

    if leaf == "kernel":
        # our Conv wrapper nests ConvRaw('cv') holding nn.Conv('conv'):
        # X/cv/conv/kernel <-> torch X.conv.weight. A bare ConvRaw named
        # 'conv' maps to a raw nn.Conv2d: X/conv/kernel <-> torch X.weight.
        if key.endswith(".cv.conv"):
            return key[: -len(".cv.conv")] + ".conv.weight"
        if key.endswith(".conv"):
            return key[: -len(".conv")] + ".weight"
        return key + ".weight"
    if leaf == "bias":
        if key.endswith(".cv.conv"):
            return key[: -len(".cv.conv")] + ".conv.bias"
        if key.endswith(".conv"):
            return key[: -len(".conv")] + ".bias"
        return key + ".bias"
    if leaf == "scale":  # BatchNorm gamma
        return key + ".weight"
    if leaf in ("weight", "w"):  # BiFPN fusion weights
        return key + "." + leaf
    return key + "." + leaf


def _torch_key_candidates(path: List[str], collection: str) -> List[str]:
    """All plausible torch keys for one of our tree paths, primary first.

    Two ambiguities, disambiguated by which key the torch state_dict
    actually contains (and by shape validation at the call site):
    - a flax leaf `X/conv/bias`: for a bare ConvRaw named 'conv' the torch
      module is a raw nn.Conv2d (key X.bias), but for ODConv the torch
      module keeps a (K, c2) candidate-bias bank at X.conv.bias
      (reference common.py:4529);
    - a flax module named fc1/fc2: some reference blocks declare
      self.fc1/self.fc2 directly (se_block common.py:2886, TransformerLayer
      :1036), others wrap the pair in `fc = nn.Sequential` with the layers
      at slots 0 and 2 (SEAM common.py:8470, EMACBAMBottleneck :910) — so
      X.fc1.* and X.fc.0.* are both offered."""
    # a root-level param (e.g. Sum's `w`) has no module prefix: drop the
    # leading dot the join would otherwise produce
    primary = _path_to_torch_key(path, collection).lstrip(".")
    out = [primary]
    if path[-1] == "bias" and len(path) >= 2 and path[-2] == "conv":
        joined = primary[: -len(".bias")]
        out.append(f"{joined}.conv.bias")
    for flax_name, seq_name in ((".fc1.", ".fc.0."), (".fc2.", ".fc.2.")):
        if flax_name in primary:
            out.append(primary.replace(flax_name, seq_name))
    # add_conv blocks (reference common.py:5322, used by ASFF) name their
    # BatchNorm 'batch_norm' where the standard Conv wrapper names it 'bn'
    if ".bn." in primary:
        out.append(primary.replace(".bn.", ".batch_norm."))
    # GhostBottleneck (reference common.py:2012-2023) wraps its stages in
    # anonymous Sequentials `conv`/`shortcut`; our flax names are flat.
    # Candidates only — conv1/conv2 are also legitimate direct names
    # elsewhere (CLLABlock), so the torch key set disambiguates.
    for pat, rep in (
        (r"(^|\.)conv1\.", r"\1conv.0."),
        (r"(^|\.)dw\.", r"\1conv.1."),
        (r"(^|\.)conv2\.", r"\1conv.2."),
        (r"(^|\.)sc_dw\.", r"\1shortcut.0."),
        (r"(^|\.)sc_pw\.", r"\1shortcut.1."),
    ):
        alt = re.sub(pat, rep, primary)
        if alt != primary:
            out.append(alt)
    # v10 blocks wrap their stages in anonymous Sequentials: CIB's five
    # convs live in `cv1 = nn.Sequential(...)` (common.py:8990-8996) and
    # PSA's FFN pair in `ffn = nn.Sequential(...)` (common.py:7244-7247);
    # our flax names flatten them to cv1_{i} / ffn_{i}
    alt = re.sub(r"(^|\.)(cv1|ffn)_(\d+)\.", lambda m: f"{m.group(1)}{m.group(2)}.{m.group(3)}.", primary)
    if alt != primary:
        out.append(alt)
    # n>1 plain modules (e.g. yolov3's Bottleneck ladders): the reference's
    # parse_model wraps them in an anonymous nn.Sequential (yolo.py:1664,
    # numeric child names); our compiler names the repeats mods_{i}
    alt = re.sub(r"\.mods_(\d+)\.", lambda m: f".{m.group(1)}.", primary)
    if alt != primary:
        out.append(alt)
    return out


def _convert_leaf(value: np.ndarray, our_shape: Tuple[int, ...], leaf: str = "") -> np.ndarray:
    """Dtype/layout conversion: conv OIHW->HWIO, dense (out,in)->(in,out),
    ODConv candidate banks (K,O,I,kh,kw)->(K,kh,kw,I,O), 1x1-conv
    attention heads -> dense kernels."""
    v = np.asarray(value, np.float32)
    if v.ndim == 5:
        v = v.transpose(0, 3, 4, 2, 1)  # K,O,I,kh,kw -> K,kh,kw,I,O
    elif v.ndim == 4 and len(our_shape) == 2 and v.shape[2:] == (1, 1):
        v = v[:, :, 0, 0].T  # torch Conv2d-1x1 head -> our Dense kernel
    elif v.ndim == 4 and v.shape[0] == 1 and v.shape[2:] == (1, 1) and tuple(our_shape[:3]) == (1, 1, 1):
        v = v.transpose(0, 2, 3, 1)  # Implicit{A,M} (1,C,1,1) -> NHWC (1,1,1,C)
    elif v.ndim == 4:
        v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    elif v.ndim == 2 and (leaf == "kernel" or tuple(v.shape) != tuple(our_shape)):
        # dense (out,in) -> (in,out). A Dense *kernel* ALWAYS transposes —
        # square Linear weights (e.g. CLLA's q/k/v, TransformerLayer) were
        # silently passed through before this leaf-name disambiguation
        # (caught by the CLLADetect reference oracle). Same-shape non-kernel
        # 2D banks (ODConv's (K, c2) bias) still pass through.
        v = v.T
    if tuple(v.shape) != tuple(our_shape):
        raise ValueError(f"shape mismatch {v.shape} vs {our_shape}")
    return v


def convert_state_dict(torch_sd: Dict[str, np.ndarray], variables: dict, strict: bool = False) -> dict:
    """Fill our variable tree from a torch state_dict (numpy values).

    Returns a new variables dict; logs transfer coverage."""
    out = {"params": {}, "batch_stats": {}}
    matched = missed = 0
    misses: List[str] = []

    for collection in ("params", "batch_stats"):
        tree = variables.get(collection, {})
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        new_leaves = []
        for path, leaf in flat:
            keys = [p.key if hasattr(p, "key") else str(p) for p in path]
            hit = None
            err = None
            for tk in _torch_key_candidates(keys, collection):
                if tk not in torch_sd:
                    continue
                try:
                    hit = jnp.asarray(_convert_leaf(torch_sd[tk], leaf.shape, leaf=keys[-1]))
                    break
                except ValueError as e:
                    err = f"{tk}: {e}"
            if hit is not None:
                new_leaves.append(hit)
                matched += 1
                continue
            misses.append(err or _path_to_torch_key(keys, collection))
            missed += 1
            new_leaves.append(leaf)
        out[collection] = jax.tree_util.tree_unflatten(treedef, new_leaves)

    LOGGER.info(f"torch_convert: matched {matched}, missed {missed} leaves")
    if misses:
        LOGGER.info("torch_convert: first misses: " + "; ".join(misses[:8]))
    if strict and missed:
        raise KeyError(f"{missed} unmatched leaves, e.g. {misses[:5]}")
    return out


def anchors_from_state_dict(torch_sd: Dict[str, np.ndarray], strides) -> np.ndarray | None:
    """Recover pixel anchors from a checkpoint's head buffer: the reference
    stores grid-unit anchors (divided by stride at init, yolo.py:1203)."""
    for k, v in torch_sd.items():
        if k.endswith(".anchors"):
            a = np.asarray(v, np.float32)  # (nl, na, 2) grid units
            return a * np.asarray(strides, np.float32)[:, None, None]
    return None
