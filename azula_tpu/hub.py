r"""Weight distribution: download, cache, verify, extract.

Capability parity with the reference `azula/hub.py` (125 LoC): module-global
cache directory, URL-sanitized cache filenames, streaming hash verification
(`"alg:prefix"` format, `hub.py:83-101`), tar/zip extraction to a `<file>+x`
directory (`hub.py:103-123`). Torch-free: downloads go through `urllib`.
"""

from __future__ import annotations

__all__ = [
    "get_hub_dir",
    "set_hub_dir",
    "download",
]

import hashlib
import os
import re
import shutil
import tarfile
import urllib.parse
import urllib.request
import zipfile

from pathlib import Path

_HUB_DIR: Path | None = None


def get_hub_dir() -> Path:
    r"""Returns the cache directory for downloaded files."""

    if _HUB_DIR is None:
        return Path.home() / ".cache" / "azula_tpu" / "hub"
    else:
        return _HUB_DIR


def set_hub_dir(path: str | Path) -> None:
    r"""Overrides the cache directory for downloaded files."""

    global _HUB_DIR
    _HUB_DIR = Path(path)


def _safe_filename(url: str) -> str:
    name = urllib.parse.urlparse(url).path.rsplit("/", 1)[-1]
    name = urllib.parse.unquote(name)
    return re.sub(r"[^\w.\-+]", "_", name)


def download(
    url: str,
    filename: str | None = None,
    hash_prefix: str | None = None,
    extract: bool = False,
    quiet: bool = False,
) -> Path:
    r"""Downloads a file into the hub cache, optionally verifying its hash and
    extracting archives.

    Arguments:
        url: The source URL. Google-Drive links go through `gdown` if available.
        filename: The cache filename. Defaults to a sanitized URL basename.
        hash_prefix: Expected content hash as `"alg:prefix"` (e.g.
            `"sha256:a3f2..."`); raises on mismatch.
        extract: Whether to extract tar/zip archives; returns the extraction
            directory `<file>+x` instead of the file.
        quiet: Whether to silence progress output.

    Returns:
        The path of the cached file (or extraction directory).
    """

    hub = get_hub_dir()
    hub.mkdir(parents=True, exist_ok=True)

    if filename is None:
        filename = _safe_filename(url)

    target = hub / filename

    if not target.exists():
        if not quiet:
            from .utils.logging import get_logger

            get_logger("azula_tpu.hub").info("downloading %s to %s", url, target)

        tmp = target.with_suffix(target.suffix + ".part")

        try:
            if "drive.google.com" in url:
                try:
                    import gdown
                except ImportError as e:
                    raise RuntimeError(
                        "Google-Drive downloads require the optional `gdown` package."
                    ) from e

                gdown.download(url, str(tmp), quiet=quiet)
            else:
                with urllib.request.urlopen(url) as response, open(tmp, "wb") as f:
                    shutil.copyfileobj(response, f)

            os.replace(tmp, target)
        finally:
            if tmp.exists():
                tmp.unlink()

    if hash_prefix is not None:
        alg, _, prefix = hash_prefix.partition(":")

        digest = hashlib.new(alg)
        with open(target, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                digest.update(chunk)

        if not digest.hexdigest().startswith(prefix):
            raise RuntimeError(
                f"hash mismatch for {target}: "
                f"expected {alg} prefix {prefix}, got {digest.hexdigest()}"
            )

    if extract:
        out = target.with_name(target.name + "+x")

        if not out.exists():
            if tarfile.is_tarfile(target):
                with tarfile.open(target) as tar:
                    tar.extractall(out, filter="data")
            elif zipfile.is_zipfile(target):
                with zipfile.ZipFile(target) as zf:
                    zf.extractall(out)
            else:
                raise RuntimeError(f"{target} is not a recognized archive")

        return out

    return target
