"""Hub entry points (counterpart of reference hubconf.py).

    import hubconf
    model = hubconf.yolo_somi(weights="somi.msgpack")
    results = model(["img1.jpg", "img2.jpg"])
    results.pandas()
"""

from __future__ import annotations

from yolosomi_tpu.api import load


def custom(cfg: str, weights: str = None, **kw):
    """Arbitrary config/weights (reference: hubconf.py custom)."""
    return load(cfg, weights, **kw)


def yolo_somi(weights: str = None, **kw):
    return load("yolo-somi", weights, **kw)


def yolo_somi_dcn(weights: str = None, **kw):
    return load("yolo-somi-dcn", weights, **kw)


def yolov5s(weights: str = None, **kw):
    return load("yolov5s", weights, **kw)


def yolov5l(weights: str = None, **kw):
    return load("yolov5l", weights, **kw)
