"""Model loading/inference runner shared by the CLIs.

Counterpart of the reference's attempt_load + backend dispatch
(experimental.py:90-122, detect.py:83-130): builds a model from a YAML
config, optionally restores weights from a msgpack checkpoint, and
provides a jitted batched inference function (forward + decode + NMS on
device).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from yolosomi_tpu.engine.checkpoint import load_artifact
from yolosomi_tpu.models.heads import decode
from yolosomi_tpu.models.yolo import build_model, init_model
from yolosomi_tpu.ops.nms import non_max_suppression
from yolosomi_tpu.utils.config import find_config, load_model_cfg
from yolosomi_tpu.utils.general import LOGGER


class Runner:
    def __init__(
        self,
        cfg: str,
        weights: Optional[str] = None,
        nc: Optional[int] = None,
        dtype=jnp.bfloat16,
        imgsz: int = 640,
        spatial_shards: int = 1,
    ):
        # spatial sharding (SURVEY.md §5.7): split activations along H on
        # the mesh 'model' axis so 1280px+ drone frames fit per chip group;
        # XLA's SPMD partitioner inserts the conv halo exchanges.
        self.spatial_mesh = None
        if spatial_shards > 1:
            from yolosomi_tpu.parallel.mesh import create_mesh

            n = len(jax.devices())
            assert n % spatial_shards == 0, f"{spatial_shards} shards over {n} devices"
            self.spatial_mesh = create_mesh(model=spatial_shards, data=n // spatial_shards)
        cfg_dict = load_model_cfg(find_config(cfg))
        self.model, self.meta = build_model(cfg_dict, nc=nc, dtype=dtype)
        self.dtype = dtype
        ckpt_anchors = None
        if weights and Path(weights).exists():
            peek, ckpt_anchors = load_artifact(weights)
            nc_changed = False
            if nc is None:
                # infer nc from the checkpoint head shapes (the reference
                # gets it from the pickled module; ours are bare pytrees)
                detected = self._infer_nc(peek["params"])
                if detected is not None and detected != self.meta.nc:
                    LOGGER.info(f"nc={detected} inferred from checkpoint (cfg said {self.meta.nc})")
                    nc = detected
                    nc_changed = True
            if ckpt_anchors is not None or nc_changed:
                # adopt the artifact's (autoanchor-refined) anchors — the
                # reference reads them from the pickled m.anchors buffer
                anchors_arg = ckpt_anchors.tolist() if ckpt_anchors is not None else None
                self.model, self.meta = build_model(
                    cfg_dict, nc=nc, anchors=anchors_arg, dtype=dtype
                )
                if ckpt_anchors is not None:
                    LOGGER.info("anchors restored from checkpoint")
            self.variables = jax.tree_util.tree_map(jnp.asarray, peek)
            LOGGER.info(f"loaded weights {weights}")
        else:
            if weights:
                LOGGER.warning(f"weights {weights} not found; using random init")
            self.variables = init_model(self.model, self.meta, imgsz=min(imgsz, 256))
        self._infer_cache = {}
        self._loss_cache = {}

    def val_loss_fn(self, compute_loss):
        """Jitted (variables, images, targets) -> loss components for the
        per-epoch val loop. Cached per loss object: a fresh jit closure
        each epoch recompiles the whole forward+loss program (~30 s/epoch
        measured on the flagship — this cache is the difference between
        7 s and 38 s epochs in train.py's val gating)."""
        key = id(compute_loss)
        if key not in self._loss_cache:

            @jax.jit
            def loss_fn_batch(variables, images, targets):
                if images.dtype == jnp.uint8:
                    images = images.astype(jnp.float32) / 255.0
                preds = self.model.apply(variables, images, train=False)
                return compute_loss(preds, targets)[1]

            self._loss_cache[key] = loss_fn_batch
        return self._loss_cache[key]

    def _infer_nc(self, params: dict):
        head_keys = [k for k in params if k.startswith("layers_")]
        if not head_keys:
            return None
        head = params[max(head_keys, key=lambda k: int(k.split("_")[1]))]
        m0 = head.get("m0", {})
        na = self.meta.na
        try:
            if "c3" in m0:  # DecoupledDetect class branch: na*nc outputs
                return int(np.asarray(m0["c3"]["conv"]["bias"]).size // na)
            if "conv" in m0:  # coupled Detect: na*(nc+5) outputs
                return int(np.asarray(m0["conv"]["bias"]).size // na - 5)
        except Exception:
            return None
        return None

    @property
    def names(self):
        return self.meta.names

    @property
    def stride(self) -> int:
        return int(max(self.meta.strides))

    def _decode(self, preds):
        if self.meta.head_type in ("DetectYOLOv8", "DetectYOLO8Head", "DetectV8", "DetectYolov11", "DetectV11"):
            from yolosomi_tpu.models.heads import decode_v8

            return decode_v8(preds, self.meta.strides, self.meta.nc)
        if self.meta.head_type == "Segment":
            # (levels, proto): detection path decodes the levels; the nm
            # mask-coefficient tail is dropped here (assemble_masks consumes
            # it via model.apply directly — heads.py Segment docstring)
            levels, _proto = preds
            dec = decode(levels, self.meta.anchors_px, self.meta.strides)
            return dec[..., : 5 + self.meta.nc]
        return decode(preds, self.meta.anchors_px, self.meta.strides)

    def infer_fn(
        self, conf_thres=0.25, iou_thres=0.45, multi_label=False, agnostic=False, max_det=300,
        augment=False, class_mask=None, exact=False, max_nms=4096,
    ):
        """Jitted (images float NHWC [0,1]) -> (B, max_det, 6) detections.
        `augment=True` runs scale/flip TTA (reference: yolo.py:1253);
        `class_mask` is an (nc,) bool array filter (--classes)."""
        key = (conf_thres, iou_thres, multi_label, agnostic, max_det, augment,
               exact, max_nms,
               None if class_mask is None else tuple(np.asarray(class_mask).tolist()))
        if key not in self._infer_cache:
            classes = None if class_mask is None else jnp.asarray(np.asarray(class_mask))

            def fn(variables, images):
                # uint8 batches normalize on device: 4x less host->device
                # transfer than f32 (the reference ships uint8 too and
                # divides on GPU, train.py:249)
                if images.dtype == jnp.uint8:
                    # normalize straight into the compute dtype: uint8 is
                    # exact in bf16 and the first conv casts anyway; skips
                    # a full-size f32 intermediate (HBM write+read)
                    images = images.astype(self.dtype) / jnp.asarray(255.0, self.dtype)
                if self.meta.head_type == "RTDETRDecoder":
                    # NMS-free query head: (B, nq, 4+nc) sigmoided cxcywh in
                    # [0,1] + class scores -> top max_det rows, no suppression
                    out = self.model.apply(variables, images, train=False)
                    h, w = images.shape[1:3]
                    cx, cy, bw, bh = (out[..., i] for i in range(4))
                    boxes = jnp.stack(
                        [(cx - bw / 2) * w, (cy - bh / 2) * h,
                         (cx + bw / 2) * w, (cy + bh / 2) * h], axis=-1
                    )
                    scores = out[..., 4:]
                    if classes is not None:
                        scores = jnp.where(classes[None, None, :], scores, 0.0)
                    conf = jnp.max(scores, axis=-1)
                    cls = jnp.argmax(scores, axis=-1).astype(jnp.float32)
                    conf = jnp.where(conf > conf_thres, conf, 0.0)
                    k = min(max_det, conf.shape[1])
                    top, idx = jax.lax.top_k(conf, k)
                    rows = jnp.concatenate(
                        [jnp.take_along_axis(boxes, idx[..., None], axis=1),
                         top[..., None],
                         jnp.take_along_axis(cls, idx, axis=1)[..., None]], axis=-1
                    )
                    rows = jnp.where(top[..., None] > 0, rows, 0.0)
                    pad = max_det - k
                    if pad:
                        rows = jnp.pad(rows, ((0, 0), (0, pad), (0, 0)))
                    return rows
                if augment:
                    from yolosomi_tpu.ops.tta import forward_augment

                    def apply_decode(xi):
                        preds = self.model.apply(variables, xi, train=False)
                        return self._decode(preds)

                    dec = forward_augment(apply_decode, images, self.meta.nl, gs=self.stride)
                elif (
                    not multi_label
                    and not exact
                    and self.meta.head_type in ("Detect", "DecoupledDetect", "DetectODConv",
                                                 "DecoupledDetect1", "Decoupled_Detect")
                ):
                    # serving fast path: fused score->top-k->decode-k->NMS
                    # (ops/nms.py fused_postprocess; keep-set parity tested)
                    from yolosomi_tpu.ops.nms import fused_postprocess

                    preds = self.model.apply(variables, images, train=False)
                    return fused_postprocess(
                        preds, self.meta.anchors_px, tuple(self.meta.strides),
                        conf_thres=conf_thres, iou_thres=iou_thres, classes=classes,
                        agnostic=agnostic, max_det=max_det, max_nms=max_nms,
                    )
                else:
                    preds = self.model.apply(variables, images, train=False)
                    dec = self._decode(preds)
                return non_max_suppression(
                    dec,
                    conf_thres=conf_thres,
                    iou_thres=iou_thres,
                    classes=classes,
                    multi_label=multi_label,
                    agnostic=agnostic,
                    max_det=max_det,
                    max_nms=max_nms,
                    exact=exact,
                )

            if self.spatial_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                mesh = self.spatial_mesh
                fn = jax.jit(
                    fn,
                    in_shardings=(
                        NamedSharding(mesh, P()),  # params replicated
                        NamedSharding(mesh, P("data", "model", None, None)),  # H-sharded
                    ),
                    out_shardings=NamedSharding(mesh, P()),
                )
            else:
                fn = jax.jit(fn)
            self._infer_cache[key] = fn
        return self._infer_cache[key]

    def __call__(self, images: np.ndarray, **nms_kw) -> np.ndarray:
        """images: (B,H,W,3) uint8 BGR or float [0,1]. Returns numpy
        (B, max_det, 6) [x1,y1,x2,y2,conf,cls] in letterboxed pixels."""
        out = self.infer_fn(**nms_kw)(self.variables, jnp.asarray(images))
        return np.asarray(out)


class EnsembleRunner:
    """Multi-checkpoint ensemble (reference: experimental.py:74-87
    Ensemble + attempt_load multi-weight path): each model's decoded rows
    concatenate along the anchor axis before a single shared NMS.

    `weights` is a list of checkpoint paths; `cfg` either one config for
    all or a per-checkpoint list. All members must share nc.
    """

    def __init__(self, cfg, weights, nc=None, dtype=jnp.bfloat16, imgsz: int = 640):
        cfgs = cfg if isinstance(cfg, (list, tuple)) else [cfg] * len(weights)
        assert len(cfgs) == len(weights)
        self.members = [Runner(c, w, nc=nc, dtype=dtype, imgsz=imgsz) for c, w in zip(cfgs, weights)]
        ncs = {m.meta.nc for m in self.members}
        assert len(ncs) == 1, f"ensemble members disagree on nc: {ncs}"
        self.meta = self.members[0].meta
        self.dtype = dtype
        self._infer_cache = {}
        LOGGER.info(f"ensemble of {len(self.members)} models")

    @property
    def names(self):
        return self.meta.names

    @property
    def stride(self) -> int:
        return max(m.stride for m in self.members)

    @property
    def variables(self):
        return [m.variables for m in self.members]

    def infer_fn(self, conf_thres=0.25, iou_thres=0.45, multi_label=False, agnostic=False,
                 max_det=300, augment=False, class_mask=None, exact=False, max_nms=4096):
        key = (conf_thres, iou_thres, multi_label, agnostic, max_det, augment, exact, max_nms,
               None if class_mask is None else tuple(np.asarray(class_mask).tolist()))
        if key not in self._infer_cache:
            classes = None if class_mask is None else jnp.asarray(np.asarray(class_mask))
            members = self.members

            @jax.jit
            def fn(variables_list, images):
                if images.dtype == jnp.uint8:
                    # normalize straight into the compute dtype: uint8 is
                    # exact in bf16 and the first conv casts anyway; skips
                    # a full-size f32 intermediate (HBM write+read)
                    images = images.astype(self.dtype) / jnp.asarray(255.0, self.dtype)
                rows = []
                for m, v in zip(members, variables_list):
                    if augment:
                        from yolosomi_tpu.ops.tta import forward_augment

                        def apply_decode(xi, m=m, v=v):
                            return m._decode(m.model.apply(v, xi, train=False))

                        rows.append(forward_augment(apply_decode, images, m.meta.nl, gs=m.stride))
                    else:
                        rows.append(m._decode(m.model.apply(v, images, train=False)))
                dec = jnp.concatenate(rows, axis=1)  # anchor-dim concat (experimental.py:80)
                return non_max_suppression(
                    dec, conf_thres=conf_thres, iou_thres=iou_thres, classes=classes,
                    multi_label=multi_label, agnostic=agnostic, max_det=max_det,
                    max_nms=max_nms, exact=exact,
                )

            self._infer_cache[key] = fn
        return self._infer_cache[key]

    def __call__(self, images: np.ndarray, **nms_kw) -> np.ndarray:
        out = self.infer_fn(**nms_kw)(self.variables, jnp.asarray(images))
        return np.asarray(out)


def attempt_load(weights, cfg, nc=None, dtype=jnp.bfloat16, imgsz: int = 640, spatial_shards: int = 1):
    """Reference attempt_load (experimental.py:90-122): one weight -> a
    Runner; several -> an EnsembleRunner."""
    if isinstance(weights, (list, tuple)) and len(weights) > 1:
        return EnsembleRunner(cfg, list(weights), nc=nc, dtype=dtype, imgsz=imgsz)
    w = weights[0] if isinstance(weights, (list, tuple)) else weights
    return Runner(cfg, w, nc=nc, dtype=dtype, imgsz=imgsz, spatial_shards=spatial_shards)
