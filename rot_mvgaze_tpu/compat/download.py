"""One-command pretrained-backbone bootstrap.

The reference downloads ImageNet ResNet weights at model construction
(``model_zoo.load_url``, /root/reference/models/resnet.py:278-283, URL table
:18-28). This restores that one-command start for deploys WITH egress:
``download_pretrained("resnet50")`` fetches into a local cache with sha256
verification (torchvision embeds the checksum's first 8 hex chars in every
filename), and ``--pretrained_backbone auto`` wires it into the CLI. In
zero-egress environments (like this build sandbox) the download fails with a
clear, actionable error instead of a bare socket traceback.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

from rot_mvgaze_tpu.models.resnet import MODEL_URLS

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "rot_mvgaze_tpu", "pretrained"
)


def _arch_name(arch) -> str:
    name = f"resnet{arch}" if isinstance(arch, int) else str(arch)
    if name not in MODEL_URLS:
        raise KeyError(
            f"unknown backbone {arch!r}; known: {sorted(MODEL_URLS)}"
        )
    return name


def _expected_sha_prefix(url: str) -> str:
    """torchvision filenames are ``<arch>-<sha256[:8]>.pth``."""
    fname = url.rsplit("/", 1)[-1]
    return fname.rsplit("-", 1)[-1].split(".")[0]


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_pretrained(
    arch,
    cache_dir: Optional[str] = None,
    progress: bool = True,
) -> str:
    """Fetch the ImageNet checkpoint for ``arch`` (int depth or name) into
    the local cache, verify its sha256 against the filename-embedded prefix,
    and return the file path. Reuses a cached file whose checksum verifies.

    Raises ``RuntimeError`` with remediation instructions when the network
    is unreachable (zero-egress) or the checksum mismatches.
    """
    name = _arch_name(arch)
    url = MODEL_URLS[name]
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    dest = os.path.join(cache_dir, url.rsplit("/", 1)[-1])
    expected = _expected_sha_prefix(url)

    if os.path.exists(dest):
        if _sha256(dest).startswith(expected):
            return dest
        os.unlink(dest)  # corrupt partial download: refetch

    tmp = f"{dest}.tmp.{os.getpid()}"
    try:
        import http.client
        import urllib.error
        import urllib.request

        if progress:
            print(f"downloading {url} -> {dest}")
        try:
            with urllib.request.urlopen(url, timeout=60) as r, open(
                tmp, "wb"
            ) as out:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
        except urllib.error.HTTPError as e:
            # The server answered (404/403/5xx) — the network is fine; the
            # URL or the server is the problem. Don't misdiagnose as
            # missing egress (HTTPError subclasses URLError).
            raise RuntimeError(
                f"could not download pretrained weights for {name} "
                f"({url}): server returned HTTP {e.code} {e.reason}. "
                f"Check the URL / MODEL_URLS entry, or download the file "
                f"elsewhere and pass its path via --pretrained_backbone "
                f"/path/to/{os.path.basename(dest)}."
            ) from e
        except (
            urllib.error.URLError,
            http.client.HTTPException,  # e.g. IncompleteRead mid-download
            OSError,
            TimeoutError,
        ) as e:
            raise RuntimeError(
                f"could not download pretrained weights for {name} "
                f"({url}): {e}. This environment appears to have no "
                f"network egress — download the file on a connected "
                f"machine and pass its path via --pretrained_backbone "
                f"/path/to/{os.path.basename(dest)}."
            ) from e
        got = _sha256(tmp)
        if not got.startswith(expected):
            raise RuntimeError(
                f"checksum mismatch for {dest}: expected sha256 prefix "
                f"{expected}, got {got[:8]} — corrupted download or "
                f"tampered source; not installing."
            )
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return dest


def resolve_pretrained_backbone(value: Optional[str], arch) -> Optional[str]:
    """CLI semantics for ``--pretrained_backbone``: a path is used as-is
    (error if missing); ``auto``/``download`` fetches via
    :func:`download_pretrained` — the reference's bootstrap behavior."""
    if not value:
        return None
    if value.lower() in ("auto", "download"):
        return download_pretrained(arch)
    if not os.path.exists(value):
        raise FileNotFoundError(
            f"--pretrained_backbone {value} does not exist (pass 'auto' to "
            f"download into {DEFAULT_CACHE_DIR})"
        )
    return value
