"""Protocol-exact stereo pairing: bit-equality vs the reference oracle.

The reference freezes its stereo pair index at dataset construction using the
globally-seeded stdlib Mersenne Twister (/root/reference/dataset/gaze.py:72,
seeded at main.py:216), building the TRAIN dataset before the TEST dataset
(main.py:224). The released checkpoints' eval numbers are means over THAT
index, so the <=0.1 deg parity target is only meaningful under the identical
pairing. These tests construct the reference ``GazeDataset`` in place over
synthetic corpora and assert our ``pairing="reference"`` mode reproduces its
``idx_to_kv`` bit-for-bit — single-dataset, train-then-test protocol order,
and through the CLI's ``configure_dataset``.
"""

import random

import pytest

from rot_mvgaze_tpu.data import GazeDataset, build_pair_index
from rot_mvgaze_tpu.data.pairing import (
    build_pair_index_reference,
    reference_pair_indices,
)
from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset

from reference_harness import import_reference_dataset, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    """Two synthetic corpora standing in for xgaze (train) and mpiinv (test),
    with different file counts/sizes so index bugs can't cancel out."""
    train_root = str(tmp_path_factory.mktemp("xgaze"))
    test_root = str(tmp_path_factory.mktemp("mpiinv"))
    train_keys = write_synthetic_dataset(
        train_root, ["s00.h5", "s01.h5", "s02.h5"], n_frames=3, image_size=16
    )
    test_keys = write_synthetic_dataset(
        test_root, ["p00.h5", "p01.h5"], n_frames=4, image_size=16
    )
    return train_root, train_keys, test_root, test_keys


def _ref_dataset(ref_gaze, root, keys, camera_tag):
    return ref_gaze.GazeDataset(
        dataset_name="xgaze",
        dataset_path=root,
        color_type="bgr",
        image_transform=None,
        keys_to_use=keys,
        camera_tag=camera_tag,
        stereo=True,
    )


@pytest.mark.parametrize("camera_tag", ["all", "novel_train", "novel_test"])
@pytest.mark.parametrize("seed", [0, 7])
def test_single_dataset_bit_exact(corpora, camera_tag, seed):
    """One dataset, fresh seed: our reference-mode index == the oracle's."""
    ref_gaze = import_reference_dataset()
    root, keys, _, _ = corpora
    random.seed(seed)  # what /root/reference/utils/util.py:8 does
    ref_ds = _ref_dataset(ref_gaze, root, keys, camera_tag)
    sizes = [3 * 18] * len(keys)
    ours = build_pair_index_reference(sizes, camera_tag, seed=seed)
    assert [tuple(t) for t in ref_ds.idx_to_kv] == ours
    assert ours, "index must be non-empty for the comparison to mean anything"


@pytest.mark.parametrize("tags", [("all", "all"), ("novel_train", "novel_test")])
def test_protocol_train_then_test_order(corpora, tags):
    """Full protocol replay: the TEST index depends on the TRAIN dataset's
    draws (same global generator, train constructed first —
    /root/reference/main.py:216,224)."""
    ref_gaze = import_reference_dataset()
    train_root, train_keys, test_root, test_keys = corpora
    cam_train, cam_test = tags
    seed = 0

    random.seed(seed)
    ref_train = _ref_dataset(ref_gaze, train_root, train_keys, cam_train)
    ref_test = _ref_dataset(ref_gaze, test_root, test_keys, cam_test)

    train_sizes = [3 * 18] * len(train_keys)
    test_sizes = [4 * 18] * len(test_keys)
    ours_train, ours_test = reference_pair_indices(
        train_sizes, cam_train, test_sizes, cam_test, seed=seed
    )
    assert [tuple(t) for t in ref_train.idx_to_kv] == ours_train
    assert [tuple(t) for t in ref_test.idx_to_kv] == ours_test

    # A fresh-seeded single-dataset index is NOT the protocol test index —
    # this is exactly the coupling the replay exists to reproduce.
    fresh = build_pair_index_reference(test_sizes, cam_test, seed=seed)
    assert fresh != ours_test


def test_configure_dataset_matches_oracle(corpora, tmp_path):
    """The CLI's default pairing serves the oracle's indices end to end."""
    import yaml

    from rot_mvgaze_tpu.cli.main import configure_dataset

    ref_gaze = import_reference_dataset()
    train_root, train_keys, test_root, test_keys = corpora
    seed = 0

    random.seed(seed)
    ref_train = _ref_dataset(ref_gaze, train_root, train_keys, "all")
    ref_test = _ref_dataset(ref_gaze, test_root, test_keys, "all")

    # configure_dataset reads subject lists from configs/; monkeypatch-free
    # route: call GazeDataset directly with the shared pair_rng as
    # configure_dataset does, asserting the same wiring.
    pair_rng = random.Random(seed)
    ours_train = GazeDataset(
        "xgaze", train_root, "bgr", train_keys, camera_tag="all",
        seed=seed, pairing="reference", pair_rng=pair_rng,
    )
    ours_test = GazeDataset(
        "mpiinv", test_root, "rgb", test_keys, camera_tag="all",
        seed=seed, pairing="reference", pair_rng=pair_rng,
    )
    assert ours_train.idx_to_kv == [tuple(t) for t in ref_train.idx_to_kv]
    assert ours_test.idx_to_kv == [tuple(t) for t in ref_test.idx_to_kv]
    ours_train.close()
    ours_test.close()

    # and configure_dataset itself wires pairing="reference" this way
    data_paths = {"xgaze": train_root, "mpiinv": test_root}
    cfg_dir = tmp_path / "configs" / "subject"
    cfg_dir.mkdir(parents=True)
    (cfg_dir / "xgaze.yaml").write_text(yaml.safe_dump({"subject": train_keys}))
    (cfg_dir / "mpiinv.yaml").write_text(yaml.safe_dump({"subject": test_keys}))
    import importlib

    cli_main = importlib.import_module("rot_mvgaze_tpu.cli.main")
    orig = cli_main.PROJ_DIR
    try:
        cli_main.PROJ_DIR = str(tmp_path)
        tr, te = configure_dataset("xgaze2mpiinv_known", data_paths, seed=seed)
    finally:
        cli_main.PROJ_DIR = orig
    assert tr.idx_to_kv == [tuple(t) for t in ref_train.idx_to_kv]
    assert te.idx_to_kv == [tuple(t) for t in ref_test.idx_to_kv]
    tr.close()
    te.close()


def test_rng_mode_differs_but_same_distributional_shape(corpora):
    """The legacy 'rng' mode keeps its contract (same pair count/frames) but
    is a different index — the reason 'reference' mode exists."""
    _, _, test_root, test_keys = corpora
    sizes = [4 * 18] * len(test_keys)
    ref_mode = build_pair_index_reference(sizes, "all", seed=0)
    rng_mode = build_pair_index([4 * 18] * len(test_keys), "all", seed=0)
    assert len(ref_mode) == len(rng_mode)
    assert [t[:2] for t in ref_mode] == [t[:2] for t in rng_mode]
    assert ref_mode != rng_mode


def test_configure_dataset_rejects_malformed_exp_name():
    """A bare dataset prefix ('xgaze') must fail with NotImplementedError
    like every other malformed exp_name, not an IndexError on the split
    (r4 review batch 4)."""
    from rot_mvgaze_tpu.cli.main import configure_dataset

    for bad in ("xgaze", "", "xgaze_known_extra"):
        with pytest.raises(NotImplementedError):
            configure_dataset(bad, {})
