"""Pure-torch greedy NMS — a drop-in for `torchvision.ops.nms`.

The reference's eval path (reference: utils/general.py:694
`torchvision.ops.nms(boxes, scores, iou_thres)`) is the ONLY torchvision
op its dataloader→forward→NMS→ap_per_class pipeline touches, and
torchvision is not on this image. This shim implements the same
contract — greedy descending-score suppression of boxes with
IoU strictly greater than `iou_thres`, returning kept indices in
descending-score order — in plain torch, so the reference's own val.py
can execute end-to-end for the cross-framework mAP gate
(tools/ref_val_gate.py).

Semantics pinned against our property-tested sequential-greedy oracle in
tests/test_torch_nms.py (same convention as ops/nms.py: suppress on
`iou > thresh`, ties broken by original index order via stable sort).
"""

from __future__ import annotations


def nms(boxes, scores, iou_threshold: float, max_keep: int = None):
    """Greedy NMS on xyxy `boxes` (N,4) with `scores` (N,).

    Returns a 1-D int64 tensor of kept indices, descending score
    (torchvision.ops.nms contract).

    `max_keep` stops the greedy loop after that many keeps — EXACT (not
    approximate) whenever the caller truncates the result to its first
    `max_keep` rows anyway, because greedy keeps are produced in
    descending-score order. The reference's non_max_suppression does
    exactly that (`i = i[:max_det]`, utils/general.py:695-696), which is
    what keeps the pure-python loop inside the reference's own 10 s NMS
    time limit on 30k-candidate eval batches.
    """
    import torch

    n = boxes.shape[0]
    if n == 0:
        return torch.zeros((0,), dtype=torch.int64, device=boxes.device)
    # stable sort: equal scores keep original index order, matching both
    # torchvision and the sequential-greedy oracle
    order = torch.argsort(scores, descending=True, stable=True)
    boxes = boxes.float()
    x1, y1, x2, y2 = boxes.unbind(-1)
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(i)
        if order.numel() == 1 or (max_keep is not None and len(keep) >= max_keep):
            break
        rest = order[1:]
        xx1 = torch.maximum(x1[i], x1[rest])
        yy1 = torch.maximum(y1[i], y1[rest])
        xx2 = torch.minimum(x2[i], x2[rest])
        yy2 = torch.minimum(y2[i], y2[rest])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[rest] - inter).clamp(min=1e-12)
        order = rest[iou <= iou_threshold]
    return torch.stack(keep).to(torch.int64)


def install():
    """Register stub `torchvision` modules exposing this nms, if (and only
    if) real torchvision is absent. Returns the module that owns `.ops.nms`."""
    import sys
    import types

    try:
        import torchvision  # noqa: F401

        return sys.modules["torchvision"]
    except ImportError:
        pass
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    if not hasattr(tv, "__version__"):
        tv.__version__ = "0.15.0"
    tvo = getattr(tv, "ops", None) or types.ModuleType("torchvision.ops")
    tvo.nms = nms
    tv.ops = tvo
    tvt = getattr(tv, "transforms", None) or types.ModuleType("torchvision.transforms")
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tvo
    sys.modules["torchvision.transforms"] = tvt
    return tv
