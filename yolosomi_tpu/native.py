"""Native host-pipeline bindings (ctypes over native/imgproc.cc).

The reference ships native code for its hot paths (CUDA DCNv3, C++ NMS
via torchvision); on TPU those live in XLA — the native-worthy remainder
is the host data path. This module compiles native/imgproc.cc on first
use (g++ -O3 -shared) and exposes:

    letterbox(img, new_shape, ...)       cv2-parity single image
    assemble_batch(imgs, imgsz, ...)     threaded batch letterbox into one
                                         NHWC uint8 buffer

Falls back to the cv2 implementations in data/augment.py when the
toolchain is unavailable (native_available() == False).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from yolosomi_tpu.utils.general import LOGGER

_LIB = None
_TRIED = False

_SRC = Path(__file__).resolve().parents[1] / "native" / "imgproc.cc"
_SO = Path(__file__).resolve().parents[1] / "native" / "imgproc.so"


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread", str(_SRC), "-o", str(_SO)]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            LOGGER.info(f"built native imgproc: {_SO}")
        lib = ctypes.CDLL(str(_SO))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.letterbox_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.assemble_batch_u8.argtypes = [
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _LIB = lib
    except Exception as e:
        LOGGER.warning(f"native imgproc unavailable ({e}); using cv2 fallback")
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def letterbox(img: np.ndarray, new_shape: int | Tuple[int, int] = 640, pad_value: int = 114):
    """Native letterbox; returns (out u8 (oh,ow,3), ratio, (dw, dh))."""
    lib = _load()
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    oh, ow = new_shape
    if lib is None:
        from yolosomi_tpu.data.augment import letterbox as cv2_letterbox

        out, (r, _), (dw, dh) = cv2_letterbox(img, new_shape, auto=False, scaleup=True)
        return out, r, (dw, dh)
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((oh, ow, img.shape[2]), np.uint8)
    ratio = (ctypes.c_float * 1)()
    pads = (ctypes.c_float * 2)()
    lib.letterbox_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), img.shape[0], img.shape[1], img.shape[2],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow, pad_value, ratio, pads,
    )
    return out, float(ratio[0]), (float(pads[0]), float(pads[1]))


def assemble_batch(imgs: List[np.ndarray], imgsz: int, pad_value: int = 114, n_threads: Optional[int] = None):
    """Threaded batch letterbox -> (batch u8 (N,imgsz,imgsz,3), ratios, pads)."""
    lib = _load()
    n = len(imgs)
    if lib is None:
        outs, ratios, pads = [], np.zeros(n, np.float32), np.zeros((n, 2), np.float32)
        for i, im in enumerate(imgs):
            o, r, (dw, dh) = letterbox(im, imgsz, pad_value)
            outs.append(o)
            ratios[i] = r
            pads[i] = (dw, dh)
        return np.stack(outs), ratios, pads
    import os

    if n_threads is None:
        n_threads = min(n, os.cpu_count() or 1)
    imgs = [np.ascontiguousarray(im, np.uint8) for im in imgs]
    ch = imgs[0].shape[2]
    batch = np.empty((n, imgsz, imgsz, ch), np.uint8)
    srcs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in imgs]
    )
    shs = (ctypes.c_int * n)(*[im.shape[0] for im in imgs])
    sws = (ctypes.c_int * n)(*[im.shape[1] for im in imgs])
    ratios = np.zeros(n, np.float32)
    pads = np.zeros((n, 2), np.float32)
    lib.assemble_batch_u8(
        srcs, shs, sws, n, ch,
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), imgsz, imgsz, pad_value,
        ratios.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pads.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    return batch, ratios, pads
