"""Pin the pure-torch torchvision.ops.nms shim (ops/torch_nms.py) against
the same sequential-greedy numpy oracle that pins our tiled TPU NMS
(tests/test_nms.py). The shim is what lets the REFERENCE's own val.py
execute on this image for the cross-framework mAP gate
(tools/ref_val_gate.py; reference: utils/general.py:694)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from yolosomi_tpu.ops.torch_nms import nms as torch_nms  # noqa: E402

from tests.test_nms import _ref_greedy_nms  # noqa: E402


def _rand_boxes(rng, n, scale=100.0):
    xy = rng.uniform(0, scale, (n, 2))
    wh = rng.uniform(1, scale / 2, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("iou_thres", [0.3, 0.5, 0.7])
def test_torch_nms_matches_sequential_greedy(seed, iou_thres):
    rng = np.random.default_rng(seed)
    boxes = _rand_boxes(rng, 200)
    scores = rng.uniform(0.01, 1.0, 200).astype(np.float32)
    keep_ref = _ref_greedy_nms(boxes, scores, iou_thres)
    keep = torch_nms(torch.from_numpy(boxes), torch.from_numpy(scores), iou_thres)
    # both return descending-score order
    order = np.argsort(-scores[keep_ref], kind="stable")
    assert keep.tolist() == [keep_ref[i] for i in order]


def test_torch_nms_identical_boxes_suppress_to_one():
    boxes = torch.tensor([[0, 0, 10, 10]], dtype=torch.float32).repeat(5, 1)
    scores = torch.tensor([0.9, 0.8, 0.7, 0.6, 0.5])
    keep = torch_nms(boxes, scores, 0.5)
    assert keep.tolist() == [0]


def test_torch_nms_disjoint_boxes_all_kept_in_score_order():
    boxes = torch.tensor(
        [[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50]], dtype=torch.float32
    )
    scores = torch.tensor([0.3, 0.9, 0.6])
    keep = torch_nms(boxes, scores, 0.5)
    assert keep.tolist() == [1, 2, 0]


@pytest.mark.parametrize("max_keep", [1, 5, 50])
def test_torch_nms_max_keep_is_exact_prefix(max_keep):
    """Early stop after max_keep keeps == full run truncated to max_keep
    (the reference's `i = i[:max_det]`, general.py:695-696)."""
    rng = np.random.default_rng(7)
    boxes = torch.from_numpy(_rand_boxes(rng, 400))
    scores = torch.from_numpy(rng.uniform(0.01, 1.0, 400).astype(np.float32))
    full = torch_nms(boxes, scores, 0.5)
    capped = torch_nms(boxes, scores, 0.5, max_keep=max_keep)
    assert capped.tolist() == full[:max_keep].tolist()


def test_torch_nms_empty():
    keep = torch_nms(torch.zeros((0, 4)), torch.zeros((0,)), 0.5)
    assert keep.numel() == 0 and keep.dtype == torch.int64


def test_install_registers_stub(monkeypatch):
    import sys

    # force the no-torchvision branch even if a stub is already registered
    for name in ("torchvision", "torchvision.ops", "torchvision.transforms"):
        monkeypatch.delitem(sys.modules, name, raising=False)
    from yolosomi_tpu.ops.torch_nms import install

    tv = install()
    import torchvision

    assert torchvision is tv and torchvision.ops.nms is torch_nms
