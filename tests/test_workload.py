"""utils/drivers.Workload — the one owner of stereo-vs-V-view wiring.

bench.py, scripts/bench_eval.py and __graft_entry__.py all build their
model/loss/step/data stacks through this class (r5 review batch collapsed
their copy-pasted if/else blocks); these tests pin its contract cheaply
(no jit, no init — flax module construction only where possible).
"""

import numpy as np
import pytest

from rot_mvgaze_tpu.utils.drivers import Workload


class TestConstruction:
    def test_stereo_default(self):
        wl = Workload(backbone_depth=18, num_iter=1)
        assert not wl.multiview and wl.num_views == 2
        assert type(wl.model).__name__ == "FeatRotationSymm"
        assert wl.images_per_sample() == 2

    def test_multiview(self):
        wl = Workload(num_views=3, backbone_depth=18, num_iter=1)
        assert wl.multiview
        assert type(wl.model).__name__ == "FeatRotationMultiView"
        assert wl.images_per_sample() == 3

    def test_stereo_options_forwarded(self):
        wl = Workload(backbone_depth=18, num_iter=1, fuse_views=True,
                      bn_stat_subsample=2)
        assert wl.model.fuse_views is True
        assert wl.model.bn_stat_subsample == 2

    def test_stereo_options_rejected_at_v3(self):
        with pytest.raises(ValueError, match="use_pallas_fusion"):
            Workload(num_views=3, backbone_depth=18, use_pallas_fusion=True)

    def test_rejects_v_below_2(self):
        with pytest.raises(ValueError, match="num_views"):
            Workload(num_views=1)

    def test_loss_matches_view_arity(self):
        stereo = Workload(backbone_depth=18, num_iter=1)
        mv = Workload(num_views=3, backbone_depth=18, num_iter=1)
        assert type(stereo.metrics.loss).__name__ == "StereoL1Loss"
        assert type(mv.metrics.loss).__name__ == "MultiViewL1Loss"


class TestDataBuilders:
    def test_stereo_shapes(self):
        wl = Workload(backbone_depth=18, num_iter=1)
        b = wl.host_batch(np.random.default_rng(0), 4, 16)
        assert b["img_0"].shape == (4, 16, 16, 3)
        assert set(b) == {"img_0", "img_1", "gt_gaze", "gt_gaze_1",
                          "head_pose_0", "head_pose_1"}
        init = wl.init_data(16)
        assert init["img_0"].shape == (2, 16, 16, 3)
        assert init["rot_0"].shape == (2, 3, 3)

    def test_multiview_shapes(self):
        wl = Workload(num_views=4, backbone_depth=18, num_iter=1)
        b = wl.host_batch(np.random.default_rng(0), 3, 16)
        assert b["imgs"].shape == (3, 4, 16, 16, 3)
        assert b["gt_gazes"].shape == (3, 4, 2)
        init = wl.init_data(16)
        assert init["imgs"].shape == (2, 4, 16, 16, 3)
        assert init["rots"].shape == (2, 4, 3, 3)


class TestStepFactories:
    def test_train_and_eval_steps_build(self):
        import optax

        for v in (2, 3):
            wl = Workload(num_views=v, backbone_depth=18, num_iter=1)
            step = wl.make_train_step(optax.sgd(1e-3), image_size=16)
            assert callable(step)
            assert callable(wl.make_eval_step(image_size=16))
