"""ODConv numerical parity vs an independent torch implementation of the
published omni-dimensional dynamic convolution (the reference's trickiest
pure-python module, common.py:4495-4610)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolosomi_tpu.models.layers import ODConv2d  # noqa: E402


class TorchODConv(nn.Module):
    """Published ODConv math: GAP -> 1x1 conv -> BN -> ReLU trunk, four
    sigmoid/softmax attention heads, per-sample mixed kernels applied via
    the grouped-conv batch trick."""

    def __init__(self, c1, c2, k=3, s=1, K=4, r=1 / 16):
        super().__init__()
        self.c1, self.c2, self.k, self.s, self.K = c1, c2, k, s, K
        hidden = max(int(c1 * r), 16)
        self.weight = nn.Parameter(torch.randn(K, c2, c1, k, k) * 0.1)
        self.bias = nn.Parameter(torch.zeros(K, c2))
        self.fc = nn.Conv2d(c1, hidden, 1, bias=False)
        self.bn = nn.BatchNorm2d(hidden)
        self.fc_f = nn.Linear(hidden, c2)
        self.fc_s = nn.Linear(hidden, k * k)
        self.fc_c = nn.Linear(hidden, c1)
        self.fc_w = nn.Linear(hidden, K)

    def forward(self, x):
        B, C, H, W = x.shape
        v = x.mean((2, 3), keepdim=True)
        v = self.fc(v)
        if v.size(0) > 1:
            v = self.bn(v)
        v = torch.relu(v.squeeze(-1).squeeze(-1))
        attn_f = self.fc_f(v).sigmoid()
        attn_s = self.fc_s(v).sigmoid()
        attn_c = self.fc_c(v).sigmoid()
        attn_w = self.fc_w(v).softmax(-1)
        attn = (
            attn_f.view(B, 1, -1, 1, 1, 1)
            * attn_s.view(B, 1, 1, 1, self.k, self.k)
            * attn_c.view(B, 1, 1, -1, 1, 1)
            * attn_w.view(B, -1, 1, 1, 1, 1)
        )
        weight = (attn * self.weight).sum(1).view(-1, self.c1, self.k, self.k)
        bias = (attn_w @ self.bias).view(-1)
        out = F.conv2d(x.reshape(1, B * C, H, W), weight, bias, self.s, self.k // 2, groups=B)
        return out.view(B, self.c2, *out.shape[2:])


def test_odconv_parity_eval():
    c1, c2 = 8, 12
    tmod = TorchODConv(c1, c2).eval()
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}

    jmod = ODConv2d(c2, k=3, s=1, K=4)
    x = np.random.default_rng(0).standard_normal((3, 10, 10, c1)).astype(np.float32)
    variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    from yolosomi_tpu.utils.torch_convert import convert_state_dict

    sd_pref = {f"model.0.{k}": v for k, v in sd.items()}
    wrapped = {"params": {"layers_0": variables["params"]},
               "batch_stats": {"layers_0": variables["batch_stats"]}}
    conv = convert_state_dict(sd_pref, wrapped, strict=True)
    variables = {"params": conv["params"]["layers_0"], "batch_stats": conv["batch_stats"]["layers_0"]}

    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = jmod.apply(variables, jnp.asarray(x), False)
    np.testing.assert_allclose(t_out.transpose(0, 2, 3, 1), np.asarray(j_out), atol=3e-4, rtol=1e-3)


def test_odconv_stride2():
    c1 = c2 = 8
    tmod = TorchODConv(c1, c2, k=3, s=2).eval()
    sd = {f"model.0.{k}": v.detach().numpy() for k, v in tmod.state_dict().items()}
    jmod = ODConv2d(c2, k=3, s=2, K=4)
    x = np.random.default_rng(1).standard_normal((2, 8, 8, c1)).astype(np.float32)
    variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    from yolosomi_tpu.utils.torch_convert import convert_state_dict

    wrapped = {"params": {"layers_0": variables["params"]},
               "batch_stats": {"layers_0": variables["batch_stats"]}}
    conv = convert_state_dict(sd, wrapped, strict=True)
    variables = {"params": conv["params"]["layers_0"], "batch_stats": conv["batch_stats"]["layers_0"]}
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = jmod.apply(variables, jnp.asarray(x), False)
    assert j_out.shape == (2, 4, 4, c2)
    np.testing.assert_allclose(t_out.transpose(0, 2, 3, 1), np.asarray(j_out), atol=3e-4, rtol=1e-3)


def test_pos_matmul_impl_matches_vmap():
    """The MXU-friendly kernel-position batched-matmul lowering is
    numerically identical to the batch-grouped conv lowering."""
    import jax
    import jax.numpy as jnp
    from yolosomi_tpu.models.layers import ODConv2d

    rng = np.random.default_rng(3)
    for k, s, hw in ((1, 1, 8), (3, 2, 16), (3, 1, 15)):
        x = jnp.asarray(rng.standard_normal((2, hw, hw, 8)), jnp.float32)
        m1 = ODConv2d(16, k, s)
        m2 = ODConv2d(16, k, s, impl="pos_matmul")
        v = m1.init(jax.random.PRNGKey(k), x)
        d = np.abs(np.asarray(m1.apply(v, x)) - np.asarray(m2.apply(v, x))).max()
        assert d < 1e-5, (k, s, hw, d)
