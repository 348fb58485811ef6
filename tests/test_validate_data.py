"""Corpus pre-flight validator tests (scripts/validate_data.py)."""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)

from validate_data import validate  # noqa: E402

from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset  # noqa: E402

PROJ = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _subjects(name):
    with open(os.path.join(PROJ, "configs", "subject", f"{name}.yaml")) as f:
        return yaml.safe_load(f)["subject"]


def test_valid_corpus_passes(tmp_path, capsys):
    write_synthetic_dataset(str(tmp_path), _subjects("mpiinv"), n_frames=1)
    assert validate(str(tmp_path), "mpiinv") == 0
    out = capsys.readouterr().out
    assert "RESULT: OK" in out


def test_missing_subject_fails(tmp_path, capsys):
    subs = _subjects("mpiinv")
    write_synthetic_dataset(str(tmp_path), subs[:-1], n_frames=1)
    assert validate(str(tmp_path), "mpiinv") == 1
    assert "missing subject archive" in capsys.readouterr().out


def test_bad_row_count_fails(tmp_path, capsys):
    import h5py

    subs = _subjects("mpiinv")
    write_synthetic_dataset(str(tmp_path), subs, n_frames=1)
    # truncate one archive to a non-multiple of 18
    victim = os.path.join(str(tmp_path), subs[0])
    with h5py.File(victim, "r+") as f:
        img = np.asarray(f["face_patch"])[:17]
        gaze = np.asarray(f["face_gaze"])[:17]
        pose = np.asarray(f["face_head_pose"])[:17]
        del f["face_patch"], f["face_gaze"], f["face_head_pose"]
        f["face_patch"], f["face_gaze"], f["face_head_pose"] = img, gaze, pose
    assert validate(str(tmp_path), "mpiinv") == 1
    assert "multiple of 18" in capsys.readouterr().out


def test_non_224_warns_but_passes(tmp_path, capsys):
    write_synthetic_dataset(
        str(tmp_path), _subjects("mpiinv"), n_frames=1, image_size=32
    )
    assert validate(str(tmp_path), "mpiinv") == 0
    assert "not 224x224" in capsys.readouterr().out
    # --strict promotes warnings to failure
    assert validate(str(tmp_path), "mpiinv", strict=True) == 1
