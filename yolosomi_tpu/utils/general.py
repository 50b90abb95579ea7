"""General-purpose helpers.

TPU-native counterpart of the reference's utils/general.py (logging,
path helpers, divisibility checks). Box/NMS functions live in
yolosomi_tpu.utils.boxes and yolosomi_tpu.ops.nms instead of here.
Reference: /root/reference/utils/general.py:47-300.
"""

from __future__ import annotations

import logging
import math
import os
import platform
import re
import time
from contextlib import contextmanager
from pathlib import Path

VERBOSE = str(os.getenv("YOLOSOMI_VERBOSE", "true")).lower() == "true"


def set_logging(name: str = "yolosomi_tpu", verbose: bool = VERBOSE) -> logging.Logger:
    """Rank-aware logger: INFO only on process 0 (reference: general.py:47-54,
    which gates on RANK; here jax.process_index() is the multi-host rank)."""
    level = logging.INFO if verbose and _process_index() == 0 else logging.WARNING
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


LOGGER = set_logging()


def colorstr(*input):
    """ANSI-color a string, e.g. colorstr('blue', 'hello') (reference:
    general.py colorstr)."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m",
        "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def make_divisible(x, divisor: int = 8) -> int:
    """Round channel count up to the nearest multiple of `divisor`
    (reference: general.py make_divisible; used by the YAML compiler's
    width_multiple scaling, models/yolo.py:1484)."""
    return int(math.ceil(x / divisor) * divisor)


def check_img_size(imgsz, s: int = 32, floor: int = 0):
    """Verify image size is a multiple of the max model stride `s`
    (reference: general.py check_img_size)."""
    if isinstance(imgsz, int):
        new_size = max(make_divisible(imgsz, int(s)), floor)
    else:
        new_size = [max(make_divisible(x, int(s)), floor) for x in imgsz]
    if new_size != imgsz:
        LOGGER.warning(f"WARNING: --img-size {imgsz} must be multiple of max stride {s}, updating to {new_size}")
    return new_size


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, runs/exp3, ... (reference: general.py:819-831)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        (path if not path.suffix else path.parent).mkdir(parents=True, exist_ok=True)
    return path


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent last.ckpt in search_dir for --resume (reference:
    general.py:130-133)."""
    import glob

    runs = glob.glob(f"{search_dir}/**/last.ckpt*", recursive=True) + glob.glob(
        f"{search_dir}/**/last.msgpack", recursive=True
    )
    return max(runs, key=os.path.getctime) if runs else ""


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Sinusoidal ramp y1->y2 over `steps` (reference: general.py one_cycle;
    the default LR schedule, train.py:146)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def labels_to_class_weights(labels, nc: int = 80):
    """Inverse-frequency class weights from a list of (n,5) label arrays
    (reference: general.py labels_to_class_weights)."""
    import numpy as np

    if len(labels) == 0:
        return np.ones(nc)
    classes = np.concatenate([l[:, 0] for l in labels], 0).astype(int)
    weights = np.bincount(classes, minlength=nc).astype(float)
    weights[weights == 0] = 1
    weights = 1.0 / weights
    weights /= weights.sum()
    return weights


def labels_to_image_weights(labels, nc: int = 80, class_weights=None):
    """Per-image sampling weights from class weights (reference: general.py
    labels_to_image_weights; used with --image-weights)."""
    import numpy as np

    if class_weights is None:
        class_weights = np.ones(nc)
    class_counts = np.array([np.bincount(l[:, 0].astype(int), minlength=nc) for l in labels])
    return (class_weights.reshape(1, nc) * class_counts).sum(1)


class Profile:
    """Context-manager stopwatch accumulating dt (reference: general.py:57-66)."""

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        self.dt = time.time() - self.start
        self.t += self.dt


@contextmanager
def timed(msg: str):
    t0 = time.time()
    yield
    LOGGER.info(f"{msg}: {time.time() - t0:.3f}s")


def emojis(s: str = "") -> str:
    """Platform-safe emoji string (reference: general.py emojis)."""
    return re.sub(r"[\U00010000-\U0010ffff]", "", s) if platform.system() == "Windows" else s


def clean_str(s: str) -> str:
    """Replace special characters for filenames (reference: general.py clean_str)."""
    return re.sub(pattern="[|@#!¡·$€%&()=?¿^*;:,¨´><+]", repl="_", string=s)


def try_except(func):
    """Swallow-and-log decorator for non-critical checks (reference:
    general.py:99-107)."""

    def handler(*args, **kwargs):
        try:
            return func(*args, **kwargs)
        except Exception as e:
            LOGGER.warning(f"{func.__name__}: {e}")

    return handler


def select_device(device: str = "") -> None:
    """Select the JAX platform ('', 'tpu', 'cpu') — counterpart of the
    reference's select_device (torch_utils.py:58). Must run before first
    device use; also updates the live config because a TPU-tunnel
    sitecustomize may have imported jax already."""
    if not device:
        return
    os.environ["JAX_PLATFORMS"] = device
    try:
        import jax

        jax.config.update("jax_platforms", device)
    except Exception as e:
        LOGGER.warning(f"select_device({device}): {e}")
