"""Full-graph torch parity: the complete yolov5s hub architecture.

The per-block parity harness (test_torch_parity.py) validates block math;
this validates the ENTIRE yolov5s graph — Focus stem, CSP backbone, PANet
head with Upsample/Concat routing, SPPF, Detect — through the weight
converter with reference-style state_dict keys (model.<i>...), i.e. the
exact key layout a real yolov5s .pt checkpoint carries (reference:
models/yolov5s.yaml + torch_utils). A real checkpoint differs from this
randomized one only in value distribution, not in structure, so this is
the strongest conversion-correctness evidence available in an offline
image (no egress to fetch weights; see PARITY.md 'real-data mAP').
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_torch_parity import TC3, TConv, TFocus, TSPPF, _randomized_state_dict  # noqa: E402
from yolosomi_tpu.models.heads import decode  # noqa: E402
from yolosomi_tpu.models.yolo import build_model, init_model  # noqa: E402
from yolosomi_tpu.utils.config import find_config, load_model_cfg  # noqa: E402
from yolosomi_tpu.utils.torch_convert import convert_state_dict  # noqa: E402

NC = 80
NA = 3


class TDetect(nn.Module):
    def __init__(self, nc, ch):
        super().__init__()
        self.m = nn.ModuleList(nn.Conv2d(c, NA * (nc + 5), 1) for c in ch)

    def forward(self, xs):
        return [m(x) for m, x in zip(self.m, xs)]


class TYolov5s(nn.Module):
    """yolov5s at gd=0.33/gw=0.5 with upstream layer indexing."""

    def __init__(self):
        super().__init__()
        C = TConv
        self.model = nn.ModuleList(
            [
                TFocus(3, 32, 3),            # 0
                C(32, 64, 3, 2),             # 1
                TC3(64, 64, 1),              # 2
                C(64, 128, 3, 2),            # 3
                TC3(128, 128, 3),            # 4
                C(128, 256, 3, 2),           # 5
                TC3(256, 256, 3),            # 6
                C(256, 512, 3, 2),           # 7
                TC3(512, 512, 1),            # 8
                TSPPF(512, 512, 5),          # 9
                C(512, 256, 1, 1),           # 10
                nn.Upsample(scale_factor=2, mode="nearest"),  # 11
                nn.Identity(),               # 12 Concat
                TC3(512, 256, 1, shortcut=False),  # 13
                C(256, 128, 1, 1),           # 14
                nn.Upsample(scale_factor=2, mode="nearest"),  # 15
                nn.Identity(),               # 16 Concat
                TC3(256, 128, 1, shortcut=False),  # 17
                C(128, 128, 3, 2),           # 18
                nn.Identity(),               # 19 Concat
                TC3(256, 256, 1, shortcut=False),  # 20
                C(256, 256, 3, 2),           # 21
                nn.Identity(),               # 22 Concat
                TC3(512, 512, 1, shortcut=False),  # 23
                TDetect(NC, (128, 256, 512)),  # 24
            ]
        )

    def forward(self, x):
        m = self.model
        x0 = m[0](x)
        x1 = m[1](x0)
        x2 = m[2](x1)
        x3 = m[3](x2)
        x4 = m[4](x3)
        x5 = m[5](x4)
        x6 = m[6](x5)
        x7 = m[7](x6)
        x8 = m[8](x7)
        x9 = m[9](x8)
        x10 = m[10](x9)
        x11 = m[11](x10)
        x12 = torch.cat([x11, x6], 1)
        x13 = m[13](x12)
        x14 = m[14](x13)
        x15 = m[15](x14)
        x16 = torch.cat([x15, x4], 1)
        x17 = m[17](x16)
        x18 = m[18](x17)
        x19 = torch.cat([x18, x14], 1)
        x20 = m[20](x19)
        x21 = m[21](x20)
        x22 = torch.cat([x21, x10], 1)
        x23 = m[23](x22)
        return m[24]([x17, x20, x23])


@pytest.fixture(scope="module")
def v5s_pair():
    tmodel = TYolov5s().eval()
    sd = _randomized_state_dict(tmodel)

    cfg = load_model_cfg(find_config("yolov5s"))
    model, meta = build_model(cfg, nc=NC)
    variables = init_model(model, meta, imgsz=64)
    variables = convert_state_dict(sd, variables)
    return tmodel, model, meta, variables


def test_full_yolov5s_converter_coverage(v5s_pair):
    """Every torch parameter/buffer must land on a flax leaf (no silent
    key-mapping gaps across the whole hub graph)."""
    tmodel, model, meta, variables = v5s_pair
    sd = tmodel.state_dict()
    n_torch = sum(1 for k in sd if "num_batches_tracked" not in k)
    leaves = jax.tree_util.tree_leaves(variables)
    n_ours = len(leaves)
    assert n_ours == n_torch, (n_ours, n_torch)


def test_full_yolov5s_raw_map_parity(v5s_pair):
    tmodel, model, meta, variables = v5s_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_out = model.apply(variables, jnp.asarray(x), False)
    assert len(j_out) == 3
    for lvl, (tm, jm) in enumerate(zip(t_out, j_out)):
        b, ny, nx, na, no = jm.shape
        tm = tm.reshape(b, na, no, ny, nx).permute(0, 3, 4, 1, 2).numpy()
        np.testing.assert_allclose(
            tm, np.asarray(jm), atol=2e-3, rtol=1e-3,
            err_msg=f"level {lvl}",
        )


def test_full_yolov5s_decoded_box_parity(v5s_pair):
    """Decoded pixel boxes agree end-to-end (the quantity mAP depends on)."""
    tmodel, model, meta, variables = v5s_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    j_out = model.apply(variables, jnp.asarray(x), False)
    dec = np.asarray(decode(j_out, meta.anchors_px, meta.strides))[0]

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    # reference decode (yolo.py:84-97)
    rows = []
    for lvl, tm in enumerate(t_out):
        s = meta.strides[lvl]
        b, _, ny, nx = tm.shape
        tm = tm.reshape(1, NA, NC + 5, ny, nx).permute(0, 1, 3, 4, 2)
        ys, xs = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        grid = np.stack([xs, ys], -1)[None, None]
        t = torch.sigmoid(tm).numpy()
        xy = (t[..., :2] * 2 - 0.5 + grid) * s
        wh = (t[..., 2:4] * 2) ** 2 * np.asarray(meta.anchors_px[lvl]).reshape(1, NA, 1, 1, 2)
        lvl_rows = np.concatenate([xy, wh, t[..., 4:]], -1)  # (1, na, ny, nx, no)
        # ours flattens (ny, nx, na); match that order
        rows.append(lvl_rows.transpose(0, 2, 3, 1, 4).reshape(1, -1, NC + 5))
    ref = np.concatenate(rows, 1)[0]
    assert dec.shape == ref.shape
    np.testing.assert_allclose(dec[:, :4], ref[:, :4], atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(dec[:, 4:], ref[:, 4:], atol=2e-3)
