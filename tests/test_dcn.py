"""DCNv3/DCNv2 numerical parity (the framework's port of the reference
parity harness, models/ops_dcnv3/test.py: forward allclose at fp64/fp32,
gradient parity, deliberately awkward channel counts {1, 16, 30, 71}).

Oracle: an independent torch implementation of the published DCNv3
sampling spec using F.grid_sample (bilinear, zeros, align_corners=False).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolosomi_tpu.ops.dcn import DCNv2, DCNv3, dcnv3_core  # noqa: E402


def torch_dcnv3_oracle(inp, offset, mask, kh, kw, sh, sw, ph, pw, dh, dw, G, Cg, offset_scale):
    """Torch oracle following the published DCNv3 core math."""
    inp = torch.nn.functional.pad(inp, (0, 0, pw, pw, ph, ph))
    N, H_, W_, _ = inp.shape
    _, Hout, Wout, _ = offset.shape
    P = kh * kw

    ref_y = torch.linspace((dh * (kh - 1)) // 2 + 0.5, (dh * (kh - 1)) // 2 + 0.5 + (Hout - 1) * sh, Hout)
    ref_x = torch.linspace((dw * (kw - 1)) // 2 + 0.5, (dw * (kw - 1)) // 2 + 0.5 + (Wout - 1) * sw, Wout)
    ref = torch.stack(torch.meshgrid(ref_y / H_, ref_x / W_, indexing="ij"), -1)[..., [1, 0]]  # (H,W,2) xy

    gx = torch.linspace(-((dw * (kw - 1)) // 2), -((dw * (kw - 1)) // 2) + (kw - 1) * dw, kw)
    gy = torch.linspace(-((dh * (kh - 1)) // 2), -((dh * (kh - 1)) // 2) + (kh - 1) * dh, kh)
    # kernel-x fastest (reference meshgrid(x, y) 'ij')
    mg_x, mg_y = torch.meshgrid(gx / W_, gy / H_, indexing="ij")
    grid = torch.stack([mg_x, mg_y], -1).reshape(P, 2)

    off = offset.reshape(N, Hout, Wout, G, P, 2)
    norm = torch.tensor([W_, H_], dtype=torch.float32)
    loc = ref[None, :, :, None, None, :] + grid[None, None, None, None] * offset_scale + off * offset_scale / norm
    gridn = 2 * loc - 1  # (N, Hout, Wout, G, P, 2)

    x_ = inp.reshape(N, H_ * W_, G, Cg).permute(0, 2, 3, 1).reshape(N * G, Cg, H_, W_)
    sg = gridn.permute(0, 3, 1, 2, 4, 5).reshape(N * G, Hout, Wout * P, 2) if False else (
        gridn.permute(0, 3, 1, 2, 4, 5).reshape(N * G, Hout * Wout, P, 2)
    )
    sampled = F.grid_sample(x_, sg, mode="bilinear", padding_mode="zeros", align_corners=False)
    # (N*G, Cg, Hout*Wout, P)
    m = mask.reshape(N, Hout * Wout, G, P).permute(0, 2, 1, 3).reshape(N * G, 1, Hout * Wout, P)
    out = (sampled * m).sum(-1).reshape(N, G * Cg, Hout * Wout)
    return out.permute(0, 2, 1).reshape(N, Hout, Wout, G * Cg)


@pytest.mark.parametrize("channels,group", [(1, 1), (16, 4), (30, 5), (71, 71)])
def test_dcnv3_forward_parity_fp32(channels, group, rng):
    N, H, W = 2, 8, 9
    G = group
    Cg = channels // G
    P = 9
    inp = rng.standard_normal((N, H, W, G * Cg)).astype(np.float32)
    offset = (rng.standard_normal((N, H, W, G * P * 2)) * 2).astype(np.float32)
    mask_raw = rng.standard_normal((N, H, W, G, P)).astype(np.float32)
    mask = torch.softmax(torch.from_numpy(mask_raw), -1).numpy().reshape(N, H, W, G * P)

    ours = np.asarray(
        dcnv3_core(jnp.asarray(inp), jnp.asarray(offset), jnp.asarray(mask), 3, 3, 1, 1, 1, 1, 1, 1, G, Cg, 1.0)
    )
    oracle = torch_dcnv3_oracle(
        torch.from_numpy(inp), torch.from_numpy(offset), torch.from_numpy(mask.copy()),
        3, 3, 1, 1, 1, 1, 1, 1, G, Cg, 1.0,
    ).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-2, atol=1e-3)  # reference tolerances (test.py:85)


def test_dcnv3_forward_parity_fp64(rng):
    """fp64 path must match the oracle tightly (test.py:55 analogue)."""
    N, H, W, G, Cg, P = 1, 6, 6, 2, 4, 9
    inp = rng.standard_normal((N, H, W, G * Cg))
    offset = rng.standard_normal((N, H, W, G * P * 2)) * 2
    mask_raw = rng.standard_normal((N, H, W, G, P))
    mask = torch.softmax(torch.from_numpy(mask_raw), -1).numpy().reshape(N, H, W, G * P)

    jax.config.update("jax_enable_x64", True)
    try:
        ours = np.asarray(
            dcnv3_core(
                jnp.asarray(inp, jnp.float64), jnp.asarray(offset, jnp.float64), jnp.asarray(mask, jnp.float64),
                3, 3, 1, 1, 1, 1, 1, 1, G, Cg, 1.0,
            )
        )
    finally:
        jax.config.update("jax_enable_x64", False)
    oracle = torch_dcnv3_oracle(
        torch.from_numpy(inp.astype(np.float32)), torch.from_numpy(offset.astype(np.float32)),
        torch.from_numpy(mask.astype(np.float32)), 3, 3, 1, 1, 1, 1, 1, 1, G, Cg, 1.0,
    ).double().numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_dcnv3_stride2(rng):
    """Downsampling config (the SOMI use case: stride-2 DCN)."""
    N, H, W, G, Cg, P = 1, 8, 8, 2, 4, 9
    Hout = Wout = 4
    inp = rng.standard_normal((N, H, W, G * Cg)).astype(np.float32)
    offset = rng.standard_normal((N, Hout, Wout, G * P * 2)).astype(np.float32)
    mask_raw = rng.standard_normal((N, Hout, Wout, G, P)).astype(np.float32)
    mask = torch.softmax(torch.from_numpy(mask_raw), -1).numpy().reshape(N, Hout, Wout, G * P)

    ours = np.asarray(
        dcnv3_core(jnp.asarray(inp), jnp.asarray(offset), jnp.asarray(mask), 3, 3, 2, 2, 1, 1, 1, 1, G, Cg, 1.0)
    )
    oracle = torch_dcnv3_oracle(
        torch.from_numpy(inp), torch.from_numpy(offset), torch.from_numpy(mask.copy()),
        3, 3, 2, 2, 1, 1, 1, 1, G, Cg, 1.0,
    ).numpy()
    assert ours.shape == (N, Hout, Wout, G * Cg)
    np.testing.assert_allclose(ours, oracle, rtol=1e-2, atol=1e-3)


def test_dcnv3_gradients(rng):
    """Backward parity: autodiff through our core vs torch autograd through
    the oracle (replaces the reference's 6 hand-written CUDA backward
    kernels, test.py:93-216)."""
    N, H, W, G, Cg, P = 1, 5, 5, 2, 3, 9
    inp = rng.standard_normal((N, H, W, G * Cg)).astype(np.float32)
    offset = (rng.standard_normal((N, H, W, G * P * 2)) * 0.7).astype(np.float32)
    mask_raw = rng.standard_normal((N, H, W, G, P)).astype(np.float32)
    mask = torch.softmax(torch.from_numpy(mask_raw), -1).numpy().reshape(N, H, W, G * P)

    def f(i, o, m):
        return jnp.sum(dcnv3_core(i, o, m, 3, 3, 1, 1, 1, 1, 1, 1, G, Cg, 1.0) ** 2)

    gi, go, gm = jax.grad(f, argnums=(0, 1, 2))(jnp.asarray(inp), jnp.asarray(offset), jnp.asarray(mask))

    ti = torch.from_numpy(inp).requires_grad_(True)
    to = torch.from_numpy(offset).requires_grad_(True)
    tm = torch.from_numpy(mask.copy()).requires_grad_(True)
    loss = (torch_dcnv3_oracle(ti, to, tm, 3, 3, 1, 1, 1, 1, 1, 1, G, Cg, 1.0) ** 2).sum()
    loss.backward()

    np.testing.assert_allclose(np.asarray(gi), ti.grad.numpy(), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(go), to.grad.numpy(), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gm), tm.grad.numpy(), rtol=1e-2, atol=1e-3)


def test_dcnv3_module_identity_at_init(rng):
    """Zero-init offset/mask heads -> uniform mask over the 3x3 taps: the
    module must behave like proj(avg-ish sampling), shape-preserving and
    finite (reference init contract, modules/dcnv3.py:178)."""
    mod = DCNv3(channels=16, group=4)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(variables, x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_dcnv2_zero_offset_matches_half_conv(rng):
    """With zero-init offset/mask conv: offsets 0, mask sigmoid(0)=0.5 ->
    output = 0.5 * plain conv with the same taps (pre-BN)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    mod = DCNv2(c2=6, k=3, s=1, p=1, act=False)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    # bypass BN by reading the pre-BN einsum through a manual conv check
    w = np.asarray(variables["params"]["weight"])  # (P, C, O)
    b = np.asarray(variables["params"]["bias"])
    wt = torch.from_numpy(w.reshape(3, 3, 4, 6).transpose(3, 2, 0, 1).copy())
    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())
    ref = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), 1, 1).permute(0, 2, 3, 1).numpy()
    expect = 0.5 * (ref - b) + b  # mask halves the conv, bias added after

    y = mod.apply(variables, x, train=False)
    # undo BN: at init scale=1, bias=0, mean=0, var=1 -> y = (pre-BN)/sqrt(1+eps)
    from yolosomi_tpu.models.layers import BN_EPS

    pre_bn = np.asarray(y) * np.sqrt(1 + BN_EPS)
    np.testing.assert_allclose(pre_bn, expect, rtol=1e-3, atol=1e-4)
