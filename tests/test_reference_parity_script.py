"""Unit surface of scripts/reference_parity.py (the step-0 harness).

The full four-protocol rehearsal (synthetic corpora + reference training +
both evals) runs via ``python scripts/reference_parity.py --rehearse`` and
is recorded in docs/reference_parity_rehearsal_r05.json — too slow for CI.
These tests pin the cheap invariants: the protocol table matches the CLI's
exp_name mapping (/root/reference/main.py:121-209), subject lists load,
and argument validation fails loudly.
"""

import os
import subprocess
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
sys.path.insert(0, SCRIPTS)

import reference_parity as rp  # noqa: E402


class TestProtocolSpec:
    def test_all_four_protocols(self):
        assert set(rp.PROTOCOLS) == {
            "xgaze2mpiinv_known", "xgaze2mpiinv_novel",
            "mpiinv2xgaze_known", "mpiinv2xgaze_novel",
        }

    @pytest.mark.parametrize("exp", rp.PROTOCOLS)
    def test_matches_cli_mapping(self, exp):
        (tr, te, cam_tr, cam_te) = rp.protocol_spec(exp)
        ds, hp = exp.split("_")
        assert (cam_tr, cam_te) == (
            ("all", "all") if hp == "known"
            else ("novel_train", "novel_test")
        )
        if ds == "xgaze2mpiinv":
            assert tr == ("xgaze", "bgr") and te == ("mpiinv", "rgb")
        else:
            assert tr == ("mpiinv", "rgb") and te == ("xgaze", "bgr")

    def test_subjects_load(self):
        xg = rp.load_subjects("xgaze")
        mp = rp.load_subjects("mpiinv")
        assert len(xg) == 80 and len(mp) == 15
        assert all(s.endswith(".h5") for s in xg + mp)


class TestArgValidation:
    def _run(self, *args):
        return subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, "reference_parity.py"),
             *args],
            capture_output=True, text=True, timeout=120,
        )

    def test_requires_data_dirs(self):
        r = self._run("--ckpt_dir", "/nonexistent")
        assert r.returncode == 2
        assert "--xgaze_dir" in r.stderr

    def test_rejects_unknown_ckpt_protocol(self, tmp_path):
        r = self._run("--xgaze_dir", str(tmp_path), "--mpiinv_dir",
                      str(tmp_path), "--ckpt", "bogus_proto=/x")
        assert r.returncode == 2
        assert "unknown protocol" in r.stderr

    def test_missing_ckpt_fails_loudly(self, tmp_path):
        r = self._run("--xgaze_dir", str(tmp_path), "--mpiinv_dir",
                      str(tmp_path), "--ckpt_dir", str(tmp_path))
        assert r.returncode == 2
        assert "no checkpoint for" in r.stderr
