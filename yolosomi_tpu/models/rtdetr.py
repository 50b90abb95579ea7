"""RT-DETR decoder, TPU-native (reference: common.py:7514-7740 RTDETRDecoder,
which composes ultralytics' DeformableTransformerDecoder).

Scope matches the reference's actual surface: the reference imports the
decoder stack from the ultralytics package and registers the class but
never wires it into a shipped YAML or a loss (its get_cdn_group denoising
path needs ultralytics' RT-DETR trainer). Here: the full inference
decoder — multi-level projection, anchor proposal + top-k query
selection, ndl deformable-attention decoder layers with iterative bbox
refinement — NMS-free output (B, nq, 4+nc).

TPU design notes:
- The deformable attention's bilinear sampling is an XLA batched gather
  (same decision as DCNv3, see PARITY.md §2.9) — nq*nh*P points, tiny.
- Static shapes throughout: level shapes are compile-time constants, the
  top-k query selection is lax.top_k (fixed nq).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MLP(nn.Module):
    """num_layers-deep ReLU MLP (ultralytics MLP)."""

    hidden: int
    out: int
    num_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"l{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, name=f"l{self.num_layers - 1}")(x)


def _bilinear_sample_level(value: jax.Array, loc: jax.Array, h: int, w: int) -> jax.Array:
    """Sample (B, h*w, C) level features at normalized locations.

    loc: (B, Q, P, 2) in [0, 1] (grid_sample align_corners=False
    convention: pixel centers at (i+0.5)/w). Returns (B, Q, P, C);
    out-of-range taps contribute zero.
    """
    b, hw, c = value.shape
    px = loc[..., 0] * w - 0.5
    py = loc[..., 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    out = 0.0
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xc = x0 + dx
        yc = y0 + dy
        wgt = jnp.abs(1.0 - jnp.abs(px - xc)) * jnp.abs(1.0 - jnp.abs(py - yc))
        inb = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        flat = yi * w + xi  # (B, Q, P)
        tap = jnp.take_along_axis(
            value, flat.reshape(b, -1)[..., None], axis=1
        ).reshape(*flat.shape, c)
        out = out + tap * (wgt * inb)[..., None]
    return out


class DeformableAttention(nn.Module):
    """Multi-scale deformable cross-attention (Deformable-DETR §4.1;
    ultralytics MSDeformAttn). Each head samples ndp points per level at
    learned offsets around the reference box and mixes them with learned
    softmax weights."""

    hd: int = 256
    nh: int = 8
    ndp: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, refer_bbox, feats, shapes):
        # query (B, Q, hd); refer_bbox (B, Q, 4) cxcywh in [0,1]
        # feats (B, sum(HW), hd); shapes: static [(h, w), ...]
        b, q, _ = query.shape
        nl = len(shapes)
        dh = self.hd // self.nh
        P = self.ndp
        offsets = nn.Dense(self.nh * nl * P * 2, dtype=self.dtype, name="sampling_offsets")(query)
        offsets = offsets.reshape(b, q, self.nh, nl, P, 2)
        weights = nn.Dense(self.nh * nl * P, dtype=self.dtype, name="attention_weights")(query)
        weights = jax.nn.softmax(weights.reshape(b, q, self.nh, nl * P), axis=-1)
        weights = weights.reshape(b, q, self.nh, nl, P)
        value = nn.Dense(self.hd, dtype=self.dtype, name="value_proj")(feats)

        center = refer_bbox[..., None, None, None, :2]  # (B,Q,1,1,1,2)
        wh = refer_bbox[..., None, None, None, 2:]
        loc = center + offsets[..., :, :] / P * wh * 0.5  # (B,Q,nh,nl,P,2)

        out = jnp.zeros((b, q, self.nh, dh), self.dtype)
        start = 0
        for li, (h, w) in enumerate(shapes):
            hw = h * w
            v = value[:, start : start + hw].reshape(b, hw, self.nh, dh)
            start += hw
            for hi in range(self.nh):
                tap = _bilinear_sample_level(v[:, :, hi], loc[:, :, hi, li], h, w)
                out = out.at[:, :, hi].add(
                    jnp.sum(tap * weights[:, :, hi, li, :, None], axis=2)
                )
        out = out.reshape(b, q, self.hd)
        return nn.Dense(self.hd, dtype=self.dtype, name="output_proj")(out)


class DecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (ultralytics
    DeformableTransformerDecoderLayer)."""

    hd: int = 256
    nh: int = 8
    d_ffn: int = 1024
    ndp: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, query_pos):
        q = embed + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nh, qkv_features=self.hd, dtype=self.dtype, name="self_attn"
        )(q, q, embed)
        embed = nn.LayerNorm(dtype=self.dtype, name="norm1")(embed + attn)
        cross = DeformableAttention(self.hd, self.nh, self.ndp, dtype=self.dtype, name="cross_attn")(
            embed + query_pos, refer_bbox, feats, shapes
        )
        embed = nn.LayerNorm(dtype=self.dtype, name="norm2")(embed + cross)
        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(embed)
        y = nn.Dense(self.hd, dtype=self.dtype, name="linear2")(nn.relu(y))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(embed + y)


class RTDETRDecoder(nn.Module):
    """NMS-free detection decoder over FPN levels (reference:
    common.py:7514). Returns (B, nq, 4 + nc): sigmoid cxcywh in [0,1]
    units + per-class sigmoid scores."""

    nc: int = 80
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        b = xs[0].shape[0]
        shapes = tuple((x.shape[1], x.shape[2]) for x in xs)
        feats = []
        for i, x in enumerate(xs):
            p = nn.Conv(self.hd, (1, 1), use_bias=False, dtype=self.dtype, name=f"input_proj{i}_conv")(x)
            p = nn.BatchNorm(
                use_running_average=not train, momentum=0.97, epsilon=1e-3,
                dtype=self.dtype, name=f"input_proj{i}_bn",
            )(p)
            feats.append(p.reshape(b, -1, self.hd))
        feats = jnp.concatenate(feats, axis=1)  # (B, sum HW, hd)

        # anchor proposals (reference _generate_anchors: grid centers +
        # 0.05 * 2^level sizes, logit space, invalid -> +inf)
        anchors = []
        for li, (h, w) in enumerate(shapes):
            gy, gx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
            xy = jnp.stack([(gx + 0.5) / w, (gy + 0.5) / h], -1).reshape(-1, 2)
            wh = jnp.full((h * w, 2), 0.05 * 2.0**li)
            anchors.append(jnp.concatenate([xy, wh], -1))
        anchors = jnp.concatenate(anchors, 0)[None]  # (1, sum HW, 4)
        eps = 1e-2
        valid = jnp.all((anchors > eps) & (anchors < 1 - eps), -1, keepdims=True)
        anchors = jnp.where(valid, jnp.log(anchors / (1 - anchors)), jnp.inf)

        memory = jnp.where(valid, feats, 0.0)
        memory = nn.LayerNorm(dtype=self.dtype, name="enc_norm")(
            nn.Dense(self.hd, dtype=self.dtype, name="enc_output")(memory)
        )
        enc_scores = nn.Dense(self.nc, dtype=self.dtype, name="enc_score_head")(memory)
        top_v, top_i = jax.lax.top_k(jnp.max(enc_scores, -1), self.nq)  # (B, nq)
        top_feats = jnp.take_along_axis(memory, top_i[..., None], axis=1)
        top_anchors = jnp.take_along_axis(
            jnp.broadcast_to(anchors, (b, anchors.shape[1], 4)), top_i[..., None], axis=1
        )
        refer_logit = MLP(self.hd, 4, 3, dtype=self.dtype, name="enc_bbox_head")(top_feats) + top_anchors
        refer_bbox = nn.sigmoid(refer_logit)

        embed = jax.lax.stop_gradient(top_feats)
        refer = jax.lax.stop_gradient(refer_bbox)
        qph = MLP(2 * self.hd, self.hd, 2, dtype=self.dtype, name="query_pos_head")
        for li in range(self.ndl):
            query_pos = qph(refer)  # recomputed from the refined boxes, shared weights
            embed = DecoderLayer(
                self.hd, self.nh, self.d_ffn, self.ndp, dtype=self.dtype, name=f"layer{li}"
            )(embed, refer, feats, shapes, query_pos)
            delta = MLP(self.hd, 4, 3, dtype=self.dtype, name=f"dec_bbox_head{li}")(embed)
            refer = nn.sigmoid(delta + jnp.log(refer / (1 - refer + 1e-9) + 1e-9))
        scores = nn.sigmoid(nn.Dense(self.nc, dtype=self.dtype, name=f"dec_score_head{self.ndl - 1}")(embed))
        return jnp.concatenate([refer, scores], axis=-1)
