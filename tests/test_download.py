"""Pretrained-backbone bootstrap: checksum verification + zero-egress error.

The download itself cannot run here (no egress); the logic around it —
filename-embedded checksum parsing, cached-file verification, corrupt-file
refetch, 'auto' CLI semantics, and the actionable no-network error — is
fully testable with a monkeypatched ``urlopen``.
"""

import hashlib
import io
import os
import urllib.error
import urllib.request

import pytest

from rot_mvgaze_tpu.compat.download import (
    _expected_sha_prefix,
    download_pretrained,
    resolve_pretrained_backbone,
)
from rot_mvgaze_tpu.models.resnet import MODEL_URLS


class TestChecksumParsing:
    def test_every_url_has_a_sha_prefix(self):
        """torchvision filenames embed sha256[:8]
        (/root/reference/models/resnet.py:18-28 uses the same URLs)."""
        for name, url in MODEL_URLS.items():
            prefix = _expected_sha_prefix(url)
            assert len(prefix) == 8 and all(
                c in "0123456789abcdef" for c in prefix
            ), (name, prefix)


class TestDownload:
    def _fake_urlopen(self, payload):
        class _Resp(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        return lambda url, timeout=60: _Resp(payload)

    def test_download_verifies_and_caches(self, tmp_path, monkeypatch):
        payload = b"pretend-weights"
        sha = hashlib.sha256(payload).hexdigest()
        url = f"https://example.com/models/resnet18-{sha[:8]}.pth"
        monkeypatch.setitem(MODEL_URLS, "resnet18", url)
        monkeypatch.setattr(
            urllib.request, "urlopen", self._fake_urlopen(payload)
        )
        dest = download_pretrained(18, cache_dir=str(tmp_path),
                                   progress=False)
        assert os.path.exists(dest)
        assert open(dest, "rb").read() == payload
        # second call: cache hit, no network touched
        monkeypatch.setattr(
            urllib.request, "urlopen",
            lambda *a, **k: pytest.fail("network used despite valid cache"),
        )
        assert download_pretrained(18, cache_dir=str(tmp_path),
                                   progress=False) == dest

    def test_checksum_mismatch_rejected(self, tmp_path, monkeypatch):
        url = "https://example.com/models/resnet18-00000000.pth"
        monkeypatch.setitem(MODEL_URLS, "resnet18", url)
        monkeypatch.setattr(
            urllib.request, "urlopen", self._fake_urlopen(b"tampered")
        )
        with pytest.raises(RuntimeError, match="checksum mismatch"):
            download_pretrained(18, cache_dir=str(tmp_path), progress=False)
        assert os.listdir(tmp_path) == []  # nothing installed

    def test_corrupt_cached_file_is_refetched(self, tmp_path, monkeypatch):
        payload = b"good-weights"
        sha = hashlib.sha256(payload).hexdigest()
        url = f"https://example.com/models/resnet18-{sha[:8]}.pth"
        monkeypatch.setitem(MODEL_URLS, "resnet18", url)
        dest = tmp_path / f"resnet18-{sha[:8]}.pth"
        dest.write_bytes(b"truncated")
        monkeypatch.setattr(
            urllib.request, "urlopen", self._fake_urlopen(payload)
        )
        out = download_pretrained(18, cache_dir=str(tmp_path),
                                  progress=False)
        assert open(out, "rb").read() == payload

    def test_zero_egress_error_is_actionable(self, tmp_path, monkeypatch):
        def no_net(url, timeout=60):
            raise urllib.error.URLError("no route to host")

        monkeypatch.setattr(urllib.request, "urlopen", no_net)
        with pytest.raises(RuntimeError, match="--pretrained_backbone"):
            download_pretrained(50, cache_dir=str(tmp_path), progress=False)

    def test_http_error_is_not_misdiagnosed_as_no_egress(
        self, tmp_path, monkeypatch
    ):
        # HTTPError subclasses URLError: a 404 means the server ANSWERED —
        # the remediation must point at the URL, not at network egress
        def not_found(url, timeout=60):
            raise urllib.error.HTTPError(url, 404, "Not Found", None, None)

        monkeypatch.setattr(urllib.request, "urlopen", not_found)
        with pytest.raises(RuntimeError, match="HTTP 404") as ei:
            download_pretrained(50, cache_dir=str(tmp_path), progress=False)
        assert "no network egress" not in str(ei.value)

    def test_mid_download_disconnect_raises_runtime_error(
        self, tmp_path, monkeypatch
    ):
        # http.client.HTTPException (e.g. IncompleteRead) is neither
        # URLError nor OSError — it must still surface as the module's
        # actionable RuntimeError, not a bare traceback
        import http.client

        class Dropping(io.RawIOBase):
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def read(self, n=-1):
                raise http.client.IncompleteRead(b"partial")

        monkeypatch.setattr(
            urllib.request, "urlopen", lambda url, timeout=60: Dropping()
        )
        with pytest.raises(RuntimeError, match="--pretrained_backbone"):
            download_pretrained(50, cache_dir=str(tmp_path), progress=False)

    def test_unknown_arch(self, tmp_path):
        with pytest.raises(KeyError):
            download_pretrained("resnet9000", cache_dir=str(tmp_path))


class TestResolveSemantics:
    def test_none_passthrough(self):
        assert resolve_pretrained_backbone(None, 50) is None
        assert resolve_pretrained_backbone("", 50) is None

    def test_path_used_as_is(self, tmp_path):
        p = tmp_path / "w.pth"
        p.write_bytes(b"x")
        assert resolve_pretrained_backbone(str(p), 50) == str(p)

    def test_missing_path_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="auto"):
            resolve_pretrained_backbone(str(tmp_path / "nope.pth"), 50)

    def test_auto_invokes_download(self, tmp_path, monkeypatch):
        import rot_mvgaze_tpu.compat.download as dl

        monkeypatch.setattr(
            dl, "download_pretrained", lambda arch: f"/cache/{arch}.pth"
        )
        assert resolve_pretrained_backbone("auto", 50) == "/cache/50.pth"
        assert resolve_pretrained_backbone("download", 18) == "/cache/18.pth"
