"""Pretrained-artifact fetching (local dir / file:// / URL / HF hub).

TPU-native equivalent of the reference fetcher
(``vendor/speechbrain/speechbrain/pretrained/fetching.py:20-179``):
``fetch(filename, source, savedir)`` guarantees a local path with the
same side-effect contract — local directory sources are returned
in place, web/hub sources are materialised under ``savedir`` (cached:
an existing destination short-circuits unless ``overwrite``).

Deployment note: this build environment has ZERO egress, so the
URL/HF-hub branches raise a clear ``FetchError`` when the network is
unreachable rather than hanging; local-path and file:// fetching (the
paths ``utils/parameter_transfer.py`` and the inference interfaces use)
are fully functional. ``huggingface_hub`` is optional and imported
lazily.
"""

import logging
import pathlib
import shutil
import urllib.error
import urllib.parse
import urllib.request
from collections import namedtuple
from enum import Enum
from typing import Optional, Union

logger = logging.getLogger(__name__)


class FetchFrom(Enum):
    """Where to fetch from (reference ``fetching.py:29-38``)."""

    LOCAL = 1
    HUGGING_FACE = 2
    URI = 3


FetchSource = namedtuple("FetchSource", ["FetchFrom", "path"])


class FetchError(RuntimeError):
    """Raised when a remote fetch fails (e.g. no egress)."""


def fetch(filename: str,
          source: Union[str, FetchSource],
          savedir: Union[str, pathlib.Path] = "./pretrained_model_checkpoints",
          overwrite: bool = False,
          save_filename: Optional[str] = None,
          use_auth_token: bool = False,
          revision: Optional[str] = None,
          cache_dir: Union[str, pathlib.Path, None] = None,
          timeout: float = 10.0) -> pathlib.Path:
    """Ensure a local copy of ``source/filename`` exists; return its path.

    Source interpretation order (same as the reference):
    1. existing local directory  -> return ``source/filename`` directly;
    2. ``file://`` URL           -> copy into ``savedir``;
    3. ``http(s)://`` URL        -> download into ``savedir``;
    4. otherwise                 -> treat as a HuggingFace hub repo id
       (requires ``huggingface_hub`` + network; symlinks the cache file).
    """
    if save_filename is None:
        save_filename = filename
    savedir = pathlib.Path(savedir)
    savedir.mkdir(parents=True, exist_ok=True)

    fetch_from = None
    if isinstance(source, FetchSource):
        fetch_from, source = source
    sourcefile = f"{source}/{filename}"

    if pathlib.Path(source).is_dir() and fetch_from not in (
            FetchFrom.HUGGING_FACE, FetchFrom.URI):
        sourcepath = pathlib.Path(sourcefile).absolute()
        if not sourcepath.exists():
            raise ValueError(f"{filename} not found in local source dir "
                             f"{source}")
        logger.info("Fetch %s: local file %s", filename, sourcepath)
        return sourcepath

    destination = savedir / save_filename
    if destination.exists() and not overwrite:
        logger.info("Fetch %s: using existing %s", filename, destination)
        return destination

    src = str(source)
    if src.startswith("file:"):
        local = pathlib.Path(urllib.parse.urlparse(sourcefile).path)
        if not local.exists():
            raise ValueError(f"file URL {sourcefile} does not exist")
        shutil.copy(local, destination)
        return destination

    if src.startswith(("http:", "https:")) or fetch_from is FetchFrom.URI:
        logger.info("Fetch %s: downloading %s", filename, sourcefile)
        try:
            with urllib.request.urlopen(sourcefile,
                                        timeout=timeout) as resp, \
                    open(destination, "wb") as out:
                shutil.copyfileobj(resp, out)
        except (urllib.error.URLError, OSError) as e:
            raise FetchError(
                f"Could not download {sourcefile} (no network egress on "
                f"this host?): {e}") from e
        return destination

    # HuggingFace hub repo id
    logger.info("Fetch %s: delegating to HF hub, source %s", filename, src)
    try:
        import huggingface_hub
    except ImportError as e:  # pragma: no cover
        raise FetchError(
            "huggingface_hub is not installed; place the files in a "
            "local directory and pass its path as `source` instead") from e
    try:
        fetched = huggingface_hub.hf_hub_download(
            repo_id=src, filename=filename, revision=revision,
            cache_dir=cache_dir,
            **({"use_auth_token": use_auth_token} if use_auth_token
               else {}))
    except Exception as e:
        raise FetchError(
            f"HF hub fetch of {src}/{filename} failed (no network egress "
            f"on this host?): {e}") from e
    sourcepath = pathlib.Path(fetched).absolute()
    try:
        destination.unlink()
    except FileNotFoundError:
        pass
    destination.symlink_to(sourcepath)
    return destination
