"""--num_views > 2: CLI wiring + Trainer end-to-end on the 8-device mesh."""

import os

import pytest
import yaml

from rot_mvgaze_tpu.cli.main import build_experiment, get_parser
from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset


def _make_corpus(tmp_path, exps=("mpiinv",), n_frames=1):
    proj = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = {}
    for exp in exps:
        root = tmp_path / exp
        root.mkdir(parents=True)
        with open(
            os.path.join(proj, "configs", "subject", f"{exp}.yaml")
        ) as f:
            subjects = yaml.safe_load(f)["subject"]
        write_synthetic_dataset(
            str(root), subjects, n_frames=n_frames, image_size=32
        )
        paths[exp] = str(root)
    dp = tmp_path / "data_path.yaml"
    with open(dp, "w") as f:
        yaml.safe_dump(paths, f)
    return str(dp)


def _args(tmp_path, data_path, *extra):
    return get_parser().parse_args(
        [
            "--mode", "train", "--exp_name", "mpiinv_known",
            "--data_path", data_path,
            "--output_dir", str(tmp_path / "logs"),
            "--batch_size", "8", "--test_batch_size", "8",
            "--image_size", "32", "--backbone_depth", "18",
            "--num_iter", "1", "--epochs", "1", "--num_workers", "2",
            "--num_views", "3", "--bf16", "false",
            *extra,
        ]
    )


class TestMultiViewCLI:
    def test_train_and_eval_on_mesh(self, tmp_path):
        """One epoch + eval of the V=3 model over the 8-device DP mesh:
        covers dataset wiring, rank-5 batch sharding, trainer step/eval
        selection, checkpointing."""
        data_path = _make_corpus(tmp_path)
        trainer = build_experiment(_args(tmp_path, data_path))
        assert trainer.mesh is not None
        assert type(trainer.model).__name__ == "FeatRotationMultiView"
        # every subject x 1 frame x 18 cameras
        assert len(trainer.train_loader.dataset) % 18 == 0
        assert len(trainer.train_loader.dataset) > 0
        err0 = trainer.test(-1)
        trainer.train_one_epoch(0)
        err1 = trainer.test(0)
        assert err0 > 0 and err1 > 0
        path = trainer.save_checkpoint()
        assert os.path.exists(path)
        # per-camera breakdown groups by view-0 idx (idxs[:, 0])
        breakdown = trainer.test_breakdown()
        assert breakdown["per_camera"], "camera breakdown empty"

    def test_stereo_only_flags_rejected(self, tmp_path):
        data_path = _make_corpus(tmp_path)
        with pytest.raises(SystemExit, match="grad_accum"):
            build_experiment(
                _args(tmp_path, data_path, "--grad_accum", "2")
            )
        with pytest.raises(SystemExit, match="share_feature"):
            build_experiment(
                _args(tmp_path, data_path, "--share_feature", "true")
            )
        # --pairing is stereo-protocol-only: the V-view index is its own
        # seeded draw, so a non-default pairing mode must refuse loudly
        # instead of being silently ignored
        with pytest.raises(SystemExit, match="pairing"):
            build_experiment(_args(tmp_path, data_path, "--pairing", "rng"))

    def test_num_views_below_two_rejected(self, tmp_path):
        data_path = _make_corpus(tmp_path)
        args = _args(tmp_path, data_path)
        args.num_views = 1  # would silently build stereo but log imgs/s /2
        with pytest.raises(SystemExit, match="num_views"):
            build_experiment(args)

    def test_exceeding_split_cameras_rejected(self, tmp_path):
        # novel split: 6 test cameras; V=7 can never be satisfied -> the
        # index builder raises instead of producing an empty test set
        data_path = _make_corpus(tmp_path)
        args = _args(tmp_path, data_path)
        args.exp_name, args.num_views = "mpiinv_novel", 7
        with pytest.raises(ValueError, match="cameras"):
            build_experiment(args)

    def test_native_loader_falls_back_to_h5(self, tmp_path, capsys):
        data_path = _make_corpus(tmp_path)
        trainer = build_experiment(
            _args(tmp_path, data_path, "--native_loader", "true")
        )
        out = capsys.readouterr().out
        assert "packed cache is stereo" in out
        assert type(trainer.train_loader).__name__ == "BatchLoader"
