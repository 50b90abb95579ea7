"""TF-ops mirror of the parsed YAML graph — the counterpart of the
reference's hand-written Keras re-port (reference: models/tf.py, used by
its export.py for the TFLite/TFJS legs).

Why this exists: this image's jax2tf emits a single XlaCallModule op
(native StableHLO serialization; the legacy plain-TF-ops lowering is
gone), which TF-Serving and the TFLite converter accept but a
TensorFlow.js runtime cannot execute — and a frozen XlaCallModule graph
has no Const nodes for the tfjs weight manifest. This module rebuilds
the graph from plain TF ops instead, exactly as the reference's tf.py
rebuilds its torch graph in Keras — except the weights come straight
from the flax variables (NHWC/HWIO everywhere, zero layout conversion)
and numerics are asserted against the flax model (tests/test_export.py).

Inference-mode only (BN running stats). Covers the exported families:
the SOMI flagship block set (Conv, C2fCBAM/CBAM, C2fEMACBAM/EMACBAM,
ODConv, SEAM, SPPF, BiFPN, Upsample, Concat, DecoupledDetect), the
v5/v8 hub set (Focus, Bottleneck, BottleneckCSP, C3, C2f, SPP, Detect,
BiFPN_Add2/3, Ghost/C3Ghost, C3TR/TransformerBlock, Contract,
MaxPool2d/ZeroPad2d, SE), and the v10 set (SCDown, CIB/C2fCIB/RepVGGDW,
PSA). Unmirrored blocks raise NotImplementedError and export falls back
to the jax2tf path.
"""

from __future__ import annotations

import math
from typing import Any, List

import numpy as np


def _tf():
    import tensorflow as tf

    return tf


# --------------------------------------------------------------------------
# primitive mirrors (params are the flax subtrees, already numpy)
# --------------------------------------------------------------------------


def _pair(x):
    return (x, x) if isinstance(x, int) else tuple(x)


def _autopad(k, p=None, d: int = 1):
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else [d * (x - 1) + 1 for x in k]
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def _conv_raw(p, x, k=1, s=1, pad=None, g=1, d=1):
    """flax ConvRaw (models/layers.py:68) in tf ops. Kernel stays HWIO."""
    tf = _tf()
    kh, kw = _pair(k)
    ph, pw = _pair(_autopad(k, pad, d))
    kern = tf.constant(p["conv"]["kernel"])  # (kh, kw, cin/g, cout)
    x = tf.pad(x, [[0, 0], [ph, ph], [pw, pw], [0, 0]])
    cin = x.shape[-1]
    if g == 1:
        y = tf.nn.conv2d(x, kern, strides=[1, s, s, 1], padding="VALID",
                         dilations=[1, d, d, 1])
    elif g == cin and p["conv"]["kernel"].shape[2] == 1:
        # depthwise: flax (kh,kw,1,c) -> tf (kh,kw,c,1)
        y = tf.nn.depthwise_conv2d(
            x, tf.transpose(kern, [0, 1, 3, 2]), strides=[1, s, s, 1],
            padding="VALID", dilations=[d, d],
        )
    else:  # general grouped: split/concat (CPU-safe)
        cout = p["conv"]["kernel"].shape[-1]
        xs = tf.split(x, g, axis=-1)
        ks = tf.split(kern, g, axis=-1)
        y = tf.concat(
            [tf.nn.conv2d(xi, ki, strides=[1, s, s, 1], padding="VALID",
                          dilations=[1, d, d, 1]) for xi, ki in zip(xs, ks)],
            axis=-1,
        )
        assert y.shape[-1] == cout
    if "bias" in p["conv"]:
        y = y + tf.constant(p["conv"]["bias"])
    return y


def _bn(p, st, x, eps=1e-3):
    tf = _tf()
    inv = 1.0 / np.sqrt(np.asarray(st["var"], np.float32) + eps)
    scale = np.asarray(p["scale"], np.float32) * inv
    shift = np.asarray(p["bias"], np.float32) - np.asarray(st["mean"], np.float32) * scale
    return x * tf.constant(scale) + tf.constant(shift)


def _silu(x):
    tf = _tf()
    return x * tf.sigmoid(x)


def _gelu_exact(x):
    tf = _tf()
    return 0.5 * x * (1.0 + tf.math.erf(x / np.float32(math.sqrt(2.0))))


def _dense(p, x):
    tf = _tf()
    y = x @ tf.constant(p["kernel"])  # flax Dense kernel is (in, out)
    if "bias" in p:
        y = y + tf.constant(p["bias"])
    return y


def _conv_block(p, st, x, k=1, s=1, pad=None, g=1, d=1, act=True):
    """flax Conv = ConvRaw(no bias) + BN + SiLU."""
    y = _conv_raw({"conv": p["cv"]["conv"]}, x, k, s, pad, g, d)
    y = _bn(p["bn"], st["bn"], y)
    if act is True:
        return _silu(y)
    if callable(act):  # a custom activation has no tf mirror — fail loudly
        raise NotImplementedError(f"tf_mirror: callable Conv activation {act!r}")
    return y


def _maxpool(x, k, s=1):
    tf = _tf()
    p = k // 2
    x = tf.pad(x, [[0, 0], [p, p], [p, p], [0, 0]], constant_values=x.dtype.min)
    return tf.nn.max_pool2d(x, ksize=k, strides=s, padding="VALID")


# --------------------------------------------------------------------------
# block mirrors; each fn(module, params, stats, x) -> y
# --------------------------------------------------------------------------


def _bottleneck(m, p, st, x):
    c1 = int(x.shape[-1])
    y = _conv_block(p["cv1"], st["cv1"], x, k=m.k[0])
    y = _conv_block(p["cv2"], st["cv2"], y, k=m.k[1], g=m.g)
    return x + y if m.shortcut and c1 == m.c2 else y


def _c3(m, p, st, x):
    tf = _tf()
    y1 = _conv_block(p["cv1"], st["cv1"], x)
    for i in range(m.n):
        sub = type("B", (), {"k": ((1, 1), (3, 3)), "g": m.g, "shortcut": m.shortcut,
                             "c2": int(m.c2 * m.e)})
        y1 = _bottleneck(sub, p[f"m{i}"], st.get(f"m{i}", {}), y1)
    y2 = _conv_block(p["cv2"], st["cv2"], x)
    return _conv_block(p["cv3"], st["cv3"], tf.concat([y1, y2], -1))


def _c2f(m, p, st, x, bottleneck_fn=None):
    tf = _tf()
    c = int(m.c2 * m.e)
    y = _conv_block(p["cv1"], st["cv1"], x)
    ys = [y[..., :c], y[..., c:]]
    for i in range(m.n):
        if bottleneck_fn is None:
            sub = type("B", (), {"k": ((3, 3), (3, 3)), "g": m.g, "shortcut": m.shortcut, "c2": c})
            ys.append(_bottleneck(sub, p[f"m{i}"], st.get(f"m{i}", {}), ys[-1]))
        else:
            ys.append(bottleneck_fn(p[f"m{i}"], st.get(f"m{i}", {}), ys[-1]))
    return _conv_block(p["cv2"], st["cv2"], tf.concat(ys, -1))


def _channel_attention(p, x):
    tf = _tf()
    avg = tf.reduce_mean(x, axis=(1, 2))
    mx = tf.reduce_max(x, axis=(1, 2))
    mlp = lambda v: _dense(p["fc2"], tf.nn.relu(_dense(p["fc1"], v)))  # noqa: E731
    return tf.sigmoid(mlp(avg) + mlp(mx))[:, None, None, :]


def _spatial_attention(p, x, k=7):
    tf = _tf()
    stats = tf.concat(
        [tf.reduce_mean(x, axis=-1, keepdims=True), tf.reduce_max(x, axis=-1, keepdims=True)], -1
    )
    return tf.sigmoid(_conv_raw(p["cv1"], stats, k=k))


def _cbam_bottleneck(m, p, st, x):
    c1 = int(x.shape[-1])
    y = _conv_block(p["cv1"], st["cv1"], x, k=m.k[0])
    y = _channel_attention(p["channel_attention"], y) * y
    y = _spatial_attention(p["spatial_attention"], y, k=m.kernel_size) * y
    y = _conv_block(p["cv2"], st["cv2"], y, k=m.k[1])
    return x + y if m.shortcut and c1 == m.c2 else y


def _emacbam_bottleneck(m, p, st, x, c2, factor=8):
    tf = _tf()
    y = _conv_raw(p["cv1"], x, k=3)
    y = _conv_raw(p["cv2"], y, k=3)
    b, h, w, c = [int(d) if d is not None else -1 for d in y.shape]
    gch = max(c // factor, 1)
    mlp = lambda v: _dense(p["fc2"], tf.nn.relu(_dense(p["fc1"], v)))  # noqa: E731
    gate_c = tf.sigmoid(mlp(tf.reduce_mean(y, axis=(1, 2))) + mlp(tf.reduce_max(y, axis=(1, 2))))
    y = y * gate_c[:, None, None, :]
    gy = tf.reshape(y, [-1, h, w, factor, gch])
    ph = tf.reduce_mean(gy, axis=2)  # (B,H,G,gch)
    pw = tf.reduce_mean(gy, axis=1)  # (B,W,G,gch)
    profile = tf.concat([ph, pw], axis=1)  # (B,H+W,G,gch)
    profile = tf.reshape(tf.transpose(profile, [0, 2, 1, 3]), [-1, h + w, 1, gch])
    gate_s = _conv_raw(p["conv_spatial"], profile, k=(7, 1), pad=(3, 0))
    gate_s = tf.sigmoid(tf.reshape(gate_s, [-1, factor, h + w, 1]))
    gate_h = tf.transpose(tf.reshape(gate_s[:, :, :h], [-1, factor, h, 1, 1]), [0, 2, 3, 1, 4])
    gate_w = tf.transpose(tf.reshape(gate_s[:, :, h:], [-1, factor, w, 1, 1]), [0, 3, 2, 1, 4])
    gy = gy * gate_h * gate_w
    gy = tf.reshape(gy, [-1, h, w, c])
    # per-channel instance norm (flax GroupNorm num_groups=c, f32 stats)
    gy32 = tf.cast(gy, tf.float32)
    mean = tf.reduce_mean(gy32, axis=(1, 2), keepdims=True)
    var = tf.reduce_mean(tf.square(gy32 - mean), axis=(1, 2), keepdims=True)
    gy = (gy32 - mean) * tf.math.rsqrt(var + 1e-5)
    return gy * tf.constant(np.asarray(p["gn"]["scale"], np.float32)) + tf.constant(
        np.asarray(p["gn"]["bias"], np.float32)
    )


def _seam(m, p, st, x):
    tf = _tf()
    c = int(x.shape[-1])
    y = _conv_raw(p["dcov_patch"], x, k=3, g=c)
    y = _bn(p["bn_patch"], st["bn_patch"], _gelu_exact(y))
    for i in range(m.n):
        r = _conv_raw(p[f"dw{i}"], y, k=3, g=c)
        r = _bn(p[f"bn_dw{i}"], st[f"bn_dw{i}"], _gelu_exact(r))
        y = y + r
        y = _conv_raw(p[f"pw{i}"], y, k=1)
        y = _bn(p[f"bn_pw{i}"], st[f"bn_pw{i}"], _gelu_exact(y))
    v = tf.reduce_mean(y, axis=(1, 2))
    v = _dense(p["fc2"], tf.nn.relu(_dense(p["fc1"], v)))
    return x * tf.exp(tf.sigmoid(v))[:, None, None, :]


def _odconv2d(m, p, st, x):
    """ODConv via the im2col lowering (the vmap/batch-grouped form has no
    tf counterpart; im2col is the parity-tested alternative lowering,
    models/layers.py impl='im2col')."""
    tf = _tf()
    b = -1
    h, w, c1 = (int(d) for d in x.shape[1:])
    k, s = m.k, m.s
    pd = _autopad(k, m.p, m.d)
    weight = np.asarray(p["weight"], np.float32)  # (K, kh, kw, cin, cout)
    K, kh, kw, cin, cout = weight.shape

    v = tf.reduce_mean(x, axis=(1, 2))
    v = _dense(p["fc"], v)
    v = _bn(p["bn"], st["bn"], v, eps=1e-5)
    v = tf.nn.relu(v)
    attn_f = tf.sigmoid(_dense(p["fc_f"], v))  # (B, cout)
    attn_s = tf.reshape(tf.sigmoid(_dense(p["fc_s"], v)), [b, kh, kw])
    attn_c = tf.sigmoid(_dense(p["fc_c"], v))  # (B, cin)
    attn_w = tf.nn.softmax(_dense(p["fc_w"], v), axis=-1)  # (B, K)

    wmix = tf.einsum("bk,khwio->bhwio", attn_w, tf.constant(weight))
    wmix = (
        wmix
        * attn_s[:, :, :, None, None]
        * attn_c[:, None, None, :, None]
        * attn_f[:, None, None, None, :]
    )
    xp = tf.pad(x, [[0, 0], [pd, pd], [pd, pd], [0, 0]])
    patches = tf.image.extract_patches(
        xp, sizes=[1, kh, kw, 1], strides=[1, s, s, 1], rates=[1, 1, 1, 1], padding="VALID"
    )  # (B, oh, ow, kh*kw*cin) with features ordered (kh, kw, cin)
    oh, ow = (int(d) for d in patches.shape[1:3])
    wflat = tf.reshape(wmix, [b, kh * kw * cin, cout])
    out = tf.einsum(
        "bpk,bko->bpo", tf.reshape(patches, [b, oh * ow, kh * kw * cin]), wflat
    )
    out = tf.reshape(out, [b, oh, ow, cout])
    bias = p.get("bias")
    if bias is not None:
        bmix = attn_w @ tf.constant(np.asarray(bias, np.float32))  # (B, cout)
        out = out + bmix[:, None, None, :]
    return out


def _ghost_conv(m_k, m_s, m_g, act, p, st, x):
    tf = _tf()
    y = _conv_block(p["cv1"], st["cv1"], x, k=m_k, s=m_s, g=m_g, act=act)
    c_ = int(y.shape[-1])
    y2 = _conv_block(p["cv2"], st["cv2"], y, k=5, g=c_, act=act)
    return tf.concat([y, y2], -1)


def _ghost_bottleneck(m, p, st, x):
    c1 = int(x.shape[-1])
    y = _ghost_conv(1, 1, 1, True, p["conv1"], st["conv1"], x)
    if m.s == 2:
        c_ = m.c2 // 2
        y = _conv_block(p["dw"], st["dw"], y, k=m.k, s=m.s, g=c_, act=False)
    y = _ghost_conv(1, 1, 1, False, p["conv2"], st["conv2"], y)
    if m.s == 2:
        sc = _conv_block(p["sc_dw"], st["sc_dw"], x, k=m.k, s=m.s, g=c1, act=False)
        sc = _conv_block(p["sc_pw"], st["sc_pw"], sc, k=1, act=False)
    elif c1 == m.c2:
        sc = x
    else:
        sc = _conv_block(p["sc_pw"], st["sc_pw"], x, k=1, act=False)
    return y + sc


def _layernorm(p, x, eps=1e-5):
    tf = _tf()
    mean = tf.reduce_mean(x, axis=-1, keepdims=True)
    var = tf.reduce_mean(tf.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * tf.math.rsqrt(var + np.float32(eps)) * tf.constant(
        p["scale"]
    ) + tf.constant(p["bias"])


def _transformer_layer(p, x, num_heads):
    """Mirror of layers.TransformerLayer: pre-LN -> bias-free q/k/v
    linears -> torch-layout MultiheadAttention (packed in_proj on top —
    the reference double-projects) -> residual; pre-LN -> 4x ReLU MLP
    (bias-free) -> residual."""
    tf = _tf()
    B = -1
    N, C = (int(d) for d in x.shape[1:])
    h = num_heads
    hd = C // h
    y = _layernorm(p["ln1"], x)
    q, k, v = (_dense(p[n], y) for n in ("q", "k", "v"))
    w_in = np.asarray(p["ma"]["in_proj_weight"])  # torch layout (3C, C)
    b_in = np.asarray(p["ma"]["in_proj_bias"])
    q = (q @ tf.constant(w_in[:C].T) + tf.constant(b_in[:C])) * np.float32(hd**-0.5)
    k = k @ tf.constant(w_in[C : 2 * C].T) + tf.constant(b_in[C : 2 * C])
    v = v @ tf.constant(w_in[2 * C :].T) + tf.constant(b_in[2 * C :])

    def split(t):
        return tf.transpose(tf.reshape(t, [B, N, h, hd]), [0, 2, 1, 3])

    attn = tf.nn.softmax(tf.einsum("bhnd,bhmd->bhnm", split(q), split(k)), axis=-1)
    out = tf.reshape(
        tf.transpose(tf.einsum("bhnm,bhmd->bhnd", attn, split(v)), [0, 2, 1, 3]), [B, N, C]
    )
    x = _dense(p["ma"]["out_proj"], out) + x
    y = _layernorm(p["ln2"], x)
    return _dense(p["fc2"], tf.nn.relu(_dense(p["fc1"], y))) + x


def _transformer_block(m_c2, m_heads, m_n, p, st, x):
    tf = _tf()
    if int(x.shape[-1]) != m_c2:
        x = _conv_block(p["conv"], st["conv"], x)
    H, W, C = (int(d) for d in x.shape[1:])
    pf = tf.reshape(x, [-1, H * W, C])
    pf = pf + _dense(p["linear"], pf)
    for i in range(m_n):
        pf = _transformer_layer(p[f"tr{i}"], pf, m_heads)
    return tf.reshape(pf, [-1, H, W, C])


def _repvggdw(p, st, x, c):
    a = _conv_block(p["conv"], st["conv"], x, k=7, g=c, act=False)
    b = _conv_block(p["conv1"], st["conv1"], x, k=3, g=c, act=False)
    return _silu(a + b)


def _cib(m, p, st, x, c2):
    c1 = int(x.shape[-1])
    c_ = c2  # C2fCIB uses e=1.0 inside the bottleneck
    y = _conv_block(p["cv1_0"], st["cv1_0"], x, k=3, g=c1)
    y = _conv_block(p["cv1_1"], st["cv1_1"], y, k=1)
    if "cv1_2" in p and "conv1" in p["cv1_2"]:  # RepVGGDW variant (lk=True)
        y = _repvggdw(p["cv1_2"], st["cv1_2"], y, int(y.shape[-1]))
    else:
        y = _conv_block(p["cv1_2"], st["cv1_2"], y, k=3, g=int(y.shape[-1]))
    y = _conv_block(p["cv1_3"], st["cv1_3"], y, k=1)
    y = _conv_block(p["cv1_4"], st["cv1_4"], y, k=3, g=c2)
    return x + y if m.shortcut and c1 == c2 else y


def _attention_psa(p, st, x, dim, num_heads, attn_ratio=0.5):
    tf = _tf()
    h, w, c = (int(d) for d in x.shape[1:])
    n = h * w
    head_dim = dim // num_heads
    key_dim = int(head_dim * attn_ratio)
    scale = np.float32(key_dim ** -0.5)
    qkv = _conv_block(p["qkv"], st["qkv"], x, k=1, act=False)
    qkv = tf.transpose(
        tf.reshape(qkv, [-1, n, num_heads, key_dim * 2 + head_dim]), [0, 2, 1, 3]
    )
    q, k, v = tf.split(qkv, [key_dim, key_dim, head_dim], axis=-1)
    attn = tf.nn.softmax(tf.einsum("bhnk,bhmk->bhnm", q, k) * scale, axis=-1)
    y = tf.einsum("bhnm,bhmd->bhnd", attn, v)
    y = tf.reshape(tf.transpose(y, [0, 2, 1, 3]), [-1, h, w, c])
    pe = _conv_block(
        p["pe"], st["pe"],
        tf.reshape(tf.transpose(v, [0, 2, 1, 3]), [-1, h, w, c]), k=3, g=dim, act=False,
    )
    return _conv_block(p["proj"], st["proj"], y + pe, k=1, act=False)


def _psa(m, p, st, x):
    tf = _tf()
    c1 = int(x.shape[-1])
    c = int(c1 * m.e)
    y = _conv_block(p["cv1"], st["cv1"], x)
    a, bpart = y[..., :c], y[..., c:]
    bpart = bpart + _attention_psa(p["attn"], st["attn"], bpart, c, max(c // 64, 1))
    f = _conv_block(p["ffn_0"], st["ffn_0"], bpart, k=1)
    f = _conv_block(p["ffn_1"], st["ffn_1"], f, k=1, act=False)
    bpart = bpart + f
    return _conv_block(p["cv2"], st["cv2"], tf.concat([a, bpart], -1))


def _decouple(m, p, st, x, nc, na):
    tf = _tf()
    ny, nx = (int(d) for d in x.shape[1:3])
    stem = _conv_block(p["a"], st["a"], x)
    r = _conv_block(p["b1"], st["b1"], stem, k=3)
    r = _conv_block(p["b2"], st["b2"], r, k=3)
    r = _conv_raw(p["b3"], r, k=1)
    c = _conv_block(p["c1"], st["c1"], stem)
    c = _conv_block(p["c2"], st["c2"], c)
    c = _conv_raw(p["c3"], c, k=1)
    r = tf.reshape(r, [-1, ny, nx, na, 5])
    c = tf.reshape(c, [-1, ny, nx, na, nc])
    return tf.concat([r, c], -1)


# --------------------------------------------------------------------------
# graph walker
# --------------------------------------------------------------------------


def _apply_block(m, p, st, x):
    """Dispatch one flax layer to its tf mirror. `x` is a tensor or a list."""
    tf = _tf()
    name = type(m).__name__
    if name == "Conv" or name == "DWConv":
        return _conv_block(p, st, x, k=m.k, s=m.s, pad=m.p, g=m.g, d=m.d, act=m.act)
    if name == "Focus":
        patches = tf.concat(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], -1
        )
        return _conv_block(p["conv"], st["conv"], patches, k=m.k, s=m.s, pad=m.p, g=m.g, act=m.act)
    if name == "Bottleneck":
        return _bottleneck(m, p, st, x)
    if name == "C3":
        return _c3(m, p, st, x)
    if name == "C2f":
        return _c2f(m, p, st, x)
    if name == "C2fCBAM":
        sub = type("B", (), {"k": (3, 3), "g": m.g, "shortcut": m.shortcut,
                             "c2": int(m.c2 * m.e), "kernel_size": m.kernel_size})
        return _c2f(m, p, st, x, bottleneck_fn=lambda pp, ss, xx: _cbam_bottleneck(sub, pp, ss, xx))
    if name == "C2fEMACBAM":
        c = int(m.c2 * m.e)
        return _c2f(m, p, st, x, bottleneck_fn=lambda pp, ss, xx: _emacbam_bottleneck(m, pp, ss, xx, c))
    if name == "CBAM":
        x = _channel_attention(p["channel_attention"], x) * x
        return _spatial_attention(p["spatial_attention"], x) * x
    if name == "SEAM":
        return _seam(m, p, st, x)
    if name == "SPPF":
        y = _conv_block(p["cv1"], st["cv1"], x)
        y1 = _maxpool(y, m.k)
        y2 = _maxpool(y1, m.k)
        y3 = _maxpool(y2, m.k)
        return _conv_block(p["cv2"], st["cv2"], tf.concat([y, y1, y2, y3], -1))
    if name == "SPP":
        y = _conv_block(p["cv1"], st["cv1"], x)
        pools = [y] + [_maxpool(y, k) for k in m.k]
        return _conv_block(p["cv2"], st["cv2"], tf.concat(pools, -1))
    if name == "Concat":
        return tf.concat(list(x), -1)
    if name == "Upsample":
        s = int(m.scale_factor)
        return tf.repeat(tf.repeat(x, s, axis=1), s, axis=2)
    if name == "BiFPN":
        wv = np.asarray(p["weight"], np.float32)
        # exactly as flax: norm = sum(w * sigmoid(w)) + eps
        norm = float(np.sum(wv * (1.0 / (1.0 + np.exp(-wv))))) + m.epsilon
        wn = wv / norm
        out = wn[0] * x[0]
        for i in range(1, len(x)):
            out = out + wn[i] * x[i]
        return out
    if name in ("BiFPN_Add2", "BiFPN_Add3"):
        wv = np.maximum(np.asarray(p["w"], np.float32), 0.0)
        wn = wv / (wv.sum() + 1e-4)
        y = wn[0] * x[0] + wn[1] * x[1]
        if name == "BiFPN_Add3":
            y = y + wn[2] * x[2]
        return _conv_raw(p["conv"], _silu(y), k=1)
    if name == "ODConv":
        y = _odconv2d(m_attr(m), p["conv"], st["conv"], x)
        y = _bn(p["bn"], st["bn"], y)
        return _silu(y) if m.act is True else y
    if name == "BottleneckCSP":
        c_ = int(m.c2 * m.e)
        y1 = _conv_block(p["cv1"], st["cv1"], x)
        for i in range(m.n):
            sub = type("B", (), {"k": (3, 3), "g": m.g, "shortcut": m.shortcut, "c2": c_})
            y1 = _bottleneck(sub, p[f"m{i}"], st.get(f"m{i}", {}), y1)
        y1 = _conv_raw(p["cv3"], y1, k=1)
        y2 = _conv_raw(p["cv2"], x, k=1)
        y = _bn(p["bn"], st["bn"], tf.concat([y1, y2], -1))
        return _conv_block(p["cv4"], st["cv4"], _silu(y))
    if name == "GhostConv":
        return _ghost_conv(m.k, m.s, m.g, m.act, p, st, x)
    if name == "GhostBottleneck":
        return _ghost_bottleneck(m, p, st, x)
    if name == "C3Ghost":
        c_ = int(m.c2 * m.e)
        y1 = _conv_block(p["cv1"], st["cv1"], x)
        for i in range(m.n):
            sub = type("G", (), {"k": 3, "s": 1, "c2": c_})
            y1 = _ghost_bottleneck(sub, p[f"m{i}"], st.get(f"m{i}", {}), y1)
        y2 = _conv_block(p["cv2"], st["cv2"], x)
        return _conv_block(p["cv3"], st["cv3"], tf.concat([y1, y2], -1))
    if name == "C3TR":
        c_ = int(m.c2 * m.e)
        y1 = _conv_block(p["cv1"], st["cv1"], x)
        y1 = _transformer_block(c_, 4, m.n, p["m"], st.get("m", {}), y1)
        y2 = _conv_block(p["cv2"], st["cv2"], x)
        return _conv_block(p["cv3"], st["cv3"], tf.concat([y1, y2], -1))
    if name == "TransformerBlock":
        return _transformer_block(m.c2, m.num_heads, m.n, p, st, x)
    if name == "SCDown":
        y = _conv_block(p["cv1"], st["cv1"], x)
        return _conv_block(p["cv2"], st["cv2"], y, k=m.k, s=m.s, g=m.c2, act=False)
    if name == "RepVGGDW":
        return _repvggdw(p, st, x, m.c2)
    if name == "CIB":
        return _cib(m, p, st, x, m.c2)
    if name == "C2fCIB":
        c = int(m.c2 * m.e)
        sub = type("B", (), {"shortcut": m.shortcut})
        return _c2f(m, p, st, x, bottleneck_fn=lambda pp, ss, xx: _cib(sub, pp, ss, xx, c))
    if name == "PSA":
        return _psa(m, p, st, x)
    if name == "SE":
        v = tf.reduce_mean(x, axis=(1, 2))
        v = _dense(p["l2"], tf.nn.relu(_dense(p["l1"], v)))
        return x * tf.sigmoid(v)[:, None, None, :]
    if name == "Contract":
        g = m.gain
        H, W, C = (int(d) for d in x.shape[1:])
        x = tf.reshape(x, [-1, H // g, g, W // g, g, C])
        x = tf.transpose(x, [0, 1, 3, 2, 4, 5])
        return tf.reshape(x, [-1, H // g, W // g, C * g * g])
    if name == "MaxPool2d":
        if m.p:
            x = tf.pad(x, [[0, 0], [m.p, m.p], [m.p, m.p], [0, 0]], constant_values=x.dtype.min)
        return tf.nn.max_pool2d(x, ksize=m.k, strides=m.s, padding="VALID")
    if name == "ZeroPad2d":
        l, r, t, b_ = m.pads
        return tf.pad(x, [[0, 0], [t, b_], [l, r], [0, 0]])
    raise NotImplementedError(
        f"tf_mirror: no mirror for block {name} (add it to _apply_block)"
    )


def m_attr(m):
    """ODConv wrapper -> the inner ODConv2d's attribute view."""
    return type("OD", (), {"k": m.k, "s": m.s, "p": m.p, "d": 1, "g": m.g,
                           "r": 1.0 / 16.0, "K": m.kerNums})


def _head(m, p, st, xs, meta):
    tf = _tf()
    name = type(m).__name__
    na, nc, no = meta.na, meta.nc, meta.nc + 5
    outs = []
    if name == "Detect":
        for i, x in enumerate(xs):
            ny, nx = (int(d) for d in x.shape[1:3])
            y = _conv_raw(p[f"m{i}"], x, k=1)
            outs.append(tf.reshape(y, [-1, ny, nx, na, no]))
        return outs
    if name == "DecoupledDetect":
        return [_decouple(m, p[f"m{i}"], st.get(f"m{i}", {}), x, nc, na) for i, x in enumerate(xs)]
    raise NotImplementedError(f"tf_mirror: head {name} not mirrored")


def _decode(preds, meta):
    """heads.decode in tf ops: (B, sum(ny*nx*na), no) pixel rows."""
    tf = _tf()
    outs = []
    anchors = np.asarray(meta.anchors_px, np.float32)
    for i, pmap in enumerate(preds):
        ny, nx, na, no = (int(d) for d in pmap.shape[1:])
        stride = float(meta.strides[i])
        y = tf.sigmoid(tf.cast(pmap[..., :4], tf.float32))
        gx, gy = np.meshgrid(np.arange(nx, dtype=np.float32), np.arange(ny, dtype=np.float32))
        mesh = np.stack([gx, gy], -1)[None, :, :, None, :]
        xy = (y[..., 0:2] * 2.0 - 0.5 + tf.constant(mesh)) * stride
        wh = tf.square(y[..., 2:4] * 2.0) * tf.constant(anchors[i].reshape(1, 1, 1, na, 2))
        rest = tf.sigmoid(tf.cast(pmap[..., 4:], tf.float32))
        outs.append(tf.reshape(tf.concat([xy, wh, rest], -1), [-1, ny * nx * na, no]))
    return tf.concat(outs, axis=1)


def build_tf_module(model, meta, variables, imgsz: int, batch: int = 1, with_decode: bool = True):
    """tf.Module whose .f is a plain-TF-ops tf.function mirroring the flax
    DetectionModel forward (+ heads.decode), weights baked as constants.
    Freezable to a Const-bearing GraphDef (the tfjs requirement)."""
    import jax

    tf = _tf()
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))

    def forward(images):
        saved = {}
        prev = images
        n = len(model.layers)
        for i, (m, f) in enumerate(zip(model.layers, model.froms)):
            p = params.get(f"layers_{i}", {})
            st = stats.get(f"layers_{i}", {})
            if i == n - 1 and model.head_from:
                preds = _head(m, p, st, [saved[j] for j in model.head_from], meta)
                return _decode(preds, meta) if with_decode else preds
            if isinstance(f, int):
                inp = prev if f == -1 else saved[f if f >= 0 else i + f]
            else:
                inp = [prev if j == -1 else saved[j if j >= 0 else i + j] for j in f]
            prev = _apply_block(m, p, st, inp)
            if i in model.save:
                saved[i] = prev
        return prev

    module = tf.Module()
    module.f = tf.function(
        forward,
        input_signature=[tf.TensorSpec([batch, imgsz, imgsz, 3], tf.float32)],
        autograph=False,
    )
    return module


def export_saved_model_tf(model, meta, variables, imgsz: int, batch: int, out) -> Any:
    """SavedModel of the TF-ops mirror (plain ops: TFJS-, Serving- and
    grappler-compatible, unlike the XlaCallModule SavedModel)."""
    tf = _tf()
    module = build_tf_module(model, meta, variables, imgsz, batch)
    module.f.get_concrete_function()  # trace now, fail fast
    tf.saved_model.save(module, str(out))
    return out
