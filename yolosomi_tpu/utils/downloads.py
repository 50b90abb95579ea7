"""Weight/dataset fetch helpers (reference: utils/downloads.py, 150 LoC).

Same contract: `attempt_download` resolves a local path or fetches a URL
(with size validation and partial-file cleanup); `download` fans out over
a list with optional unzip. Network use is stdlib urllib — no torch.hub
dependency — and every fetch degrades gracefully to a clear error when
the host has no egress (this build image has none; the local-path fast
paths are what the test suite exercises).
"""

from __future__ import annotations

import shutil
import subprocess
import urllib.parse
import urllib.request
from pathlib import Path
from typing import Iterable

from yolosomi_tpu.utils.general import LOGGER


def is_url(s) -> bool:
    try:
        r = urllib.parse.urlparse(str(s))
        return all([r.scheme in ("http", "https"), r.netloc])
    except Exception:
        return False


def safe_download(url: str, file: Path, min_bytes: float = 1e0, retry: int = 2) -> Path:
    """Download url -> file, removing partial files on failure
    (reference: downloads.py safe_download)."""
    file = Path(file)
    for attempt in range(retry + 1):
        try:
            LOGGER.info(f"Downloading {url} to {file}...")
            urllib.request.urlretrieve(url, file)  # nosec - caller-supplied URL
            if file.exists() and file.stat().st_size > min_bytes:
                return file
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"download attempt {attempt + 1} failed: {e}")
        if file.exists():
            file.unlink()
    raise RuntimeError(
        f"Download failure for {url} (no egress on this host?). "
        f"Place the file at {file} manually."
    )


def attempt_download(file, repo_url: str | None = None) -> Path:
    """Return `file` if it exists locally; otherwise treat it as (or build)
    a URL and fetch (reference: downloads.py attempt_download)."""
    file = Path(str(file).strip().replace("'", ""))
    if file.exists():
        return file
    if is_url(file):
        name = Path(urllib.parse.urlparse(str(file)).path).name
        return safe_download(str(file), Path(name))
    if repo_url:
        return safe_download(f"{repo_url.rstrip('/')}/{file.name}", file)
    raise FileNotFoundError(
        f"{file} not found locally and is not a URL; pass repo_url= to fetch by name"
    )


def download(urls: Iterable[str], dir: Path = Path("."), unzip: bool = True, delete: bool = False):
    """Multi-file download with optional unzip (reference: downloads.py
    download; sequential — the build image is single-core)."""
    dir = Path(dir)
    dir.mkdir(parents=True, exist_ok=True)
    out = []
    for url in urls:
        f = dir / Path(urllib.parse.urlparse(url).path).name
        if not f.exists():
            safe_download(url, f)
        if unzip and f.suffix in (".zip", ".tar", ".gz"):
            LOGGER.info(f"Unzipping {f}...")
            if f.suffix == ".zip":
                shutil.unpack_archive(str(f), str(dir))
            else:
                subprocess.run(["tar", "xf", str(f), "--directory", str(dir)], check=True)
            if delete:
                f.unlink()
        out.append(f)
    return out
