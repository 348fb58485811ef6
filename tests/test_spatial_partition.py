"""Spatial partitioning (2-D ``(data, spatial)`` mesh).

The reference is strictly single-GPU (/root/reference/main.py:212); plain
data parallelism covers its training regime. Spatial partitioning is the
TPU-native extension for the regimes DP cannot reach — one request served
by N chips (latency), or per-sample activations larger than HBM — by
sharding every NHWC tensor's HEIGHT axis over a second mesh axis and
letting GSPMD insert conv halo exchanges (collective-permute of the
kernel-overlap rows).

Correctness contract verified here, on the 8-virtual-device CPU mesh:

1. training under ``(data=4, spatial=2)`` computes the SAME steps as plain
   ``(data=4,)`` DP on the identical batch/init/keys — including the
   BatchNorm batch statistics, whose (N, H, W) reductions must psum over
   'spatial' (the correctness-critical collective);
2. eval predictions match between the two meshes;
3. the sharding actually PERSISTS into the convs: the compiled SP forward
   contains collective-permute halo ops (a silent all-gather-everything
   fallback would pass 1-2 while burning the memory the feature exists to
   save).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rot_mvgaze_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    dp_size,
    image_sharding,
    leaf_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    spatial_size,
    with_spatial_floor,
)

SIZE, DEPTH, BATCH = 64, 18, 4


# ---------------------------------------------------------------- helpers


def test_make_mesh_shapes():
    dev = jax.devices()
    m1 = make_mesh(dev)
    assert m1.axis_names == (DATA_AXIS,)
    assert dp_size(m1) == len(dev) and spatial_size(m1) == 1
    m2 = make_mesh(dev, spatial=2)
    assert m2.axis_names == (DATA_AXIS, SPATIAL_AXIS)
    assert dp_size(m2) == len(dev) // 2 and spatial_size(m2) == 2
    # halo partners are CONSECUTIVE devices (same-host under multi-process)
    grid = np.asarray(m2.devices)
    assert [d.id for d in grid[0]] == [dev[0].id, dev[1].id]
    assert dp_size(None) == 1 and spatial_size(None) == 1


def test_make_mesh_spatial_must_divide():
    with pytest.raises(ValueError, match="divide the device count"):
        make_mesh(jax.devices(), spatial=3)


def test_leaf_sharding_rank_rule():
    mesh = make_mesh(jax.devices(), spatial=2)
    img = np.zeros((4, 8, 8, 3), np.uint8)
    vec = np.zeros((4, 2), np.float32)
    scalar = np.zeros((), np.float32)
    assert leaf_sharding(mesh, img).spec == P(DATA_AXIS, SPATIAL_AXIS)
    assert leaf_sharding(mesh, vec).spec == P(DATA_AXIS)
    assert leaf_sharding(mesh, scalar).spec == P()
    # 1-D mesh: images fall back to plain batch sharding
    m1 = make_mesh(jax.devices())
    assert leaf_sharding(m1, img).spec == P(DATA_AXIS)
    assert image_sharding(m1).spec == P(DATA_AXIS)


def test_shard_batch_places_images_spatially():
    mesh = make_mesh(jax.devices(), spatial=2)
    batch = {
        "img_0": np.zeros((BATCH, SIZE, SIZE, 3), np.uint8),
        "gt_gaze": np.zeros((BATCH, 2), np.float32),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["img_0"].sharding.spec == P(DATA_AXIS, SPATIAL_AXIS)
    assert sharded["gt_gaze"].sharding.spec == P(DATA_AXIS)
    # per-device image shard: (BATCH/4, SIZE/2, SIZE, 3)
    shard = sharded["img_0"].addressable_shards[0].data
    assert shard.shape == (BATCH // 4, SIZE // 2, SIZE, 3)


# ------------------------------------------------- numerical parity (SP=DP)


def _setup():
    import optax

    from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
    from rot_mvgaze_tpu.models import FeatRotationSymm
    from rot_mvgaze_tpu.train.trainer import TrainState
    from rot_mvgaze_tpu.utils.drivers import make_host_batch, make_init_data

    model = FeatRotationSymm(
        backbone_depth=DEPTH, num_iter=1, dtype=jnp.float32
    )
    metrics = IterationLoss(
        loss=StereoL1Loss(rel_weight=0.01, reference_decay=1.0),
        iter_decay=0.5,
    )
    # SGD, not Adam, for the cross-mesh parity: Adam's first update is
    # ~lr*sign(grad) (v starts at 0), so reduction-order noise in
    # near-zero gradients flips update SIGNS and diverges the runs
    # chaotically. SGD keeps numerical differences proportional, so
    # multi-step parity stays a meaningful reduction-order-level check.
    tx = optax.sgd(5e-2)
    host_batch = make_host_batch(np.random.default_rng(0), BATCH, SIZE)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, make_init_data(SIZE)
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    return model, metrics, tx, host_batch, state


def _run_two_steps(model, metrics, tx, host_batch, state, mesh):
    from rot_mvgaze_tpu.train.steps import make_train_step

    rep = replicated_sharding(mesh)
    state = jax.device_put(state, rep)
    batch = shard_batch(host_batch, mesh)
    fn = make_train_step(
        with_spatial_floor(model, mesh),
        metrics,
        tx,
        image_size=SIZE,
        # re-pin the augmented views on the 2-D mesh (the Trainer does the
        # same): without it GSPMD replicates the spatial axis away
        image_sharding=(
            image_sharding(mesh) if spatial_size(mesh) > 1 else None
        ),
    )
    lowered = jax.jit(fn, out_shardings=(rep, rep)).lower(
        state, batch, jax.random.PRNGKey(1)
    )
    compiled = lowered.compile()
    losses = []
    for _ in range(2):
        state, stats = compiled(state, batch, jax.random.PRNGKey(1))
        losses.append(float(stats["loss_gaze"]))
    return losses, state, compiled.as_text()


@pytest.fixture(scope="module")
def sp_vs_dp():
    model, metrics, tx, host_batch, state = _setup()
    mesh_dp = make_mesh(jax.devices()[:4])  # (data=4,)
    mesh_sp = make_mesh(jax.devices(), spatial=2)  # (data=4, spatial=2)
    dp = _run_two_steps(model, metrics, tx, host_batch, state, mesh_dp)
    sp = _run_two_steps(model, metrics, tx, host_batch, state, mesh_sp)
    return {"model": model, "state": state, "host_batch": host_batch,
            "mesh_dp": mesh_dp, "mesh_sp": mesh_sp, "dp": dp, "sp": sp}


def test_train_steps_match_dp(sp_vs_dp):
    # identical batch, init, and PRNG keys: the only difference is the
    # mesh. Same math modulo reduction order (tree-reduced psums).
    dp_losses, dp_state, _ = sp_vs_dp["dp"]
    sp_losses, sp_state, _ = sp_vs_dp["sp"]
    np.testing.assert_allclose(sp_losses, dp_losses, rtol=1e-4, atol=1e-5)
    # BN batch statistics are the spatial-psum-critical state: compare the
    # running stats (updated from per-step (N, H, W) reductions) leaf-wise.
    dp_stats = jax.tree.leaves(dp_state.batch_stats)
    sp_stats = jax.tree.leaves(sp_state.batch_stats)
    assert dp_stats, "model has no batch_stats?"
    for a, b in zip(dp_stats, sp_stats):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_spatial_sharding_persists_into_convs(sp_vs_dp):
    hlo = sp_vs_dp["sp"][2]
    assert "collective-permute" in hlo, (
        "no halo exchange in the SP training HLO — the spatial sharding "
        "was gathered away instead of partitioning the convs"
    )


def test_eval_predictions_match_dp(sp_vs_dp):
    from rot_mvgaze_tpu.train.steps import make_eval_step

    model, state = sp_vs_dp["model"], sp_vs_dp["state"]
    host_batch = sp_vs_dp["host_batch"]
    preds = {}
    for name in ("mesh_dp", "mesh_sp"):
        mesh = sp_vs_dp[name]
        rep = replicated_sharding(mesh)
        st = jax.device_put(state, rep)
        batch = shard_batch(host_batch, mesh)
        eval_step = jax.jit(
            make_eval_step(
                with_spatial_floor(model, mesh),
                image_size=SIZE,
                image_sharding=(
                    image_sharding(mesh) if spatial_size(mesh) > 1 else None
                ),
            ),
            out_shardings=rep,
        )
        out = eval_step(st.params, st.batch_stats, batch)
        preds[name] = np.asarray(out["pred_gaze"], np.float64)
    assert np.isfinite(preds["mesh_sp"]).all()
    np.testing.assert_allclose(
        preds["mesh_sp"], preds["mesh_dp"], rtol=1e-4, atol=1e-5
    )


def test_spatial_floor_protects_tiny_extents():
    """The backbone's spatial floor (ResNet.spatial_unshard) is a
    CORRECTNESS requirement, not just a perf policy.

    Pure-JAX repro of the upstream defect (XLA SPMD partitioner): take a
    residual block ``relu(conv3x3(relu(conv3x3_s2(x))) + conv1x1_s2(x))``
    with the input height sharded over a 'spatial' mesh axis such that the
    block's conv OUTPUT has exactly 1 row per shard (e.g. H_in=4,
    spatial=2). The forward is exact, but the backward is deterministically
    WRONG (grad maxdiff ~0.5 vs single-device on XLA:CPU, reproduced
    without any framework code). R18 at 64 px hits this regime in layer4
    (H=2 over spatial=2): without the floor, eval-mode grads diverge from
    ground truth by ~0.97 absolute.

    This asserts the protected model computes correct gradients at exactly
    that size, while the early stages STAY sharded (halo collectives in
    the HLO) — i.e. the floor gathers only the tail.
    """
    from rot_mvgaze_tpu.models.resnet import resnet18

    model = resnet18(dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(4, SIZE, SIZE, 3)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, SIZE, SIZE, 3))
    )

    mesh = make_mesh(jax.devices(), spatial=2)
    protected = with_spatial_floor(model, mesh)

    def make_loss(m):
        def loss_fn(params, batch_stats, x):
            out = m.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=False,
            )
            return jnp.mean(out**2)

        return loss_fn

    # single-device ground truth (the plain model; the floor only inserts
    # sharding constraints, a no-op off-mesh)
    g_gt = jax.grad(make_loss(model))(
        variables["params"], variables.get("batch_stats", {}), x
    )

    rep = replicated_sharding(mesh)
    p = jax.device_put(variables["params"], rep)
    bs = jax.device_put(variables.get("batch_stats", {}), rep)
    xs = jax.device_put(x, image_sharding(mesh))
    jitted = jax.jit(jax.grad(make_loss(protected)), out_shardings=rep)
    hlo = jitted.lower(p, bs, xs).compile().as_text()
    g_sp = jax.device_get(jitted(p, bs, xs))

    for a, b in zip(jax.tree.leaves(g_gt), jax.tree.leaves(g_sp)):
        np.testing.assert_allclose(
            np.asarray(b, np.float64),
            np.asarray(a, np.float64),
            rtol=1e-4,
            atol=1e-5,
        )
    assert "collective-permute" in hlo, (
        "the floor must gather only the TAIL — early stages should still "
        "halo-exchange"
    )


def test_min_spatial_shard_rows():
    """GSPMD shards a height-h axis into even ceil(h/n) blocks with END
    padding — the last shard's VALID rows is what the floor must bound."""
    from rot_mvgaze_tpu.models.resnet import min_spatial_shard_rows

    assert min_spatial_shard_rows(16, 4) == 4  # even split
    assert min_spatial_shard_rows(8, 4) == 2  # exactly at the floor
    # the review counterexamples: h >= 2n but the LAST shard has < 2 rows
    assert min_spatial_shard_rows(10, 4) == 1  # shards 3,3,3,1
    assert min_spatial_shard_rows(9, 4) == 0  # shards 3,3,3,0
    assert min_spatial_shard_rows(13, 4) == 1  # shards 4,4,4,1
    assert min_spatial_shard_rows(5, 2) == 2  # shards 3,2 — fine
    assert min_spatial_shard_rows(7, 2) == 3  # shards 4,3 — fine


def test_spatial_floor_handles_uneven_shards():
    """The floor must gather on UNEVEN shards whose smallest piece has < 2
    valid rows even when H_out >= 2n (the h=10/n=4 -> 3,3,3,1 regime):
    gradients at spatial=4, 80 px must match single-device ground truth
    while the stem/stage-1 (min shard rows >= 2) still halo-exchange."""
    from rot_mvgaze_tpu.models.resnet import resnet18

    size = 80  # stem H=20 (shards 5,5,5,5); stage2 H_out=10 -> 3,3,3,1
    model = resnet18(dtype=jnp.float32)
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, size, size, 3)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, size, size, 3))
    )

    mesh = make_mesh(jax.devices(), spatial=4)  # (data=2, spatial=4)
    protected = with_spatial_floor(model, mesh)

    def make_loss(m):
        def loss_fn(params, batch_stats, x):
            out = m.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=False,
            )
            return jnp.mean(out**2)

        return loss_fn

    g_gt = jax.grad(make_loss(model))(
        variables["params"], variables.get("batch_stats", {}), x
    )

    rep = replicated_sharding(mesh)
    p = jax.device_put(variables["params"], rep)
    bs = jax.device_put(variables.get("batch_stats", {}), rep)
    xs = jax.device_put(x, image_sharding(mesh))
    jitted = jax.jit(jax.grad(make_loss(protected)), out_shardings=rep)
    hlo = jitted.lower(p, bs, xs).compile().as_text()
    g_sp = jax.device_get(jitted(p, bs, xs))

    for a, b in zip(jax.tree.leaves(g_gt), jax.tree.leaves(g_sp)):
        np.testing.assert_allclose(
            np.asarray(b, np.float64),
            np.asarray(a, np.float64),
            rtol=1e-4,
            atol=1e-5,
        )
    assert "collective-permute" in hlo, (
        "stages whose smallest shard keeps >= 2 rows must STAY sharded"
    )


def test_with_spatial_floor_rejects_floorless_model():
    """A model without the spatial_unshard field must be REJECTED on a
    spatial mesh (silently training it sharded risks the wrong-gradient
    mis-compile), and passed through untouched on 1-D/absent meshes."""

    class NoFloor:
        pass

    model = NoFloor()
    assert with_spatial_floor(model, None) is model
    assert with_spatial_floor(model, make_mesh(jax.devices())) is model
    with pytest.raises(ValueError, match="spatial_unshard"):
        with_spatial_floor(model, make_mesh(jax.devices(), spatial=2))


def test_custom_axis_name_mesh_rules():
    """make_mesh(axis_name=...) is public API: dp_size and the sharding
    rules must follow the mesh's ACTUAL axis name, not the literal 'data'
    (regression: dp_size() silently returned 1, skipping batch rounding)."""
    from rot_mvgaze_tpu.parallel.mesh import batch_sharding, data_axis

    mesh = make_mesh(jax.devices(), axis_name="batch")
    assert data_axis(mesh) == "batch"
    assert dp_size(mesh) == 8
    img = np.zeros((8, 16, 16, 3), np.uint8)
    assert leaf_sharding(mesh, img).spec == P("batch")
    assert batch_sharding(mesh).spec == P("batch")
    sharded = shard_batch({"img_0": img}, mesh)
    assert sharded["img_0"].addressable_shards[0].data.shape[0] == 1


def test_multiprocess_spatial_group_guard(monkeypatch):
    # a spatial group spanning processes must be rejected (halos on DCN +
    # make_array_from_process_local_data contract violation)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    class FakeDev:
        def __init__(self, i):
            self.id = i
            self.process_index = i % 2  # interleaved: every pair spans both

    with pytest.raises(ValueError, match="spans processes"):
        make_mesh([FakeDev(i) for i in range(8)], spatial=2)


# ----------------------------------------------------------- serving path


def test_serving_spatial_matches_single_device(tmp_path):
    """GazePredictor on the (data=4, spatial=2) mesh: ONE request's forward
    runs over chip groups (height-sharded convs) — outputs must match
    single-device serving, and the micro-batch rounds to the DATA-axis
    degree (4), not the device count (8)."""
    from rot_mvgaze_tpu.models import FeatRotationSymm
    from rot_mvgaze_tpu.serving import GazePredictor
    from rot_mvgaze_tpu.train.checkpoints import save_state

    model = FeatRotationSymm(backbone_depth=DEPTH, num_iter=1)
    data = {
        "img_0": jnp.zeros((1, 32, 32, 3)),
        "img_1": jnp.zeros((1, 32, 32, 3)),
        "rot_0": jnp.eye(3)[None],
        "rot_1": jnp.eye(3)[None],
    }
    ckpt = str(tmp_path / "model.msgpack")
    save_state(ckpt, dict(model.init(jax.random.PRNGKey(0), data)))

    kw = dict(
        backbone_depth=DEPTH, num_iter=1, image_size=32, dtype=jnp.float32
    )
    single = GazePredictor(ckpt, micro_batch=4, **kw)
    spatial = GazePredictor(
        ckpt, micro_batch=3, mesh=make_mesh(jax.devices(), spatial=2), **kw
    )
    assert spatial.micro_batch == 4  # rounded to dp=4, NOT devices=8
    assert spatial.model.spatial_unshard is not None  # backbone floor set
    rng = np.random.default_rng(2)
    n = 5  # one full + one padded micro-batch
    args = (
        rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8),
        rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8),
        rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32),
        rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32),
    )
    out_sp = spatial.predict(*args)
    assert np.all(np.isfinite(out_sp))
    np.testing.assert_allclose(out_sp, single.predict(*args), atol=1e-5)

    # the public constructor must reject uneven height splits itself
    # (stem-level <2-valid-row shards) — not rely on scripts/serve.py
    with pytest.raises(ValueError, match="not divisible"):
        GazePredictor(
            ckpt, micro_batch=4,
            mesh=make_mesh(jax.devices(), spatial=4),
            backbone_depth=DEPTH, num_iter=1, image_size=30,
            dtype=jnp.float32,
        )


# ------------------------------------------------------- user-facing CLI


class TestCLISpatialPartition:
    """--spatial_partition through the real entry points (cli.main), on the
    8-virtual-device CPU mesh — the same surface a user drives."""

    def _corpus(self, tmp_path):
        from test_cli_multichip import _make_corpus

        return _make_corpus(tmp_path)

    def test_build_experiment_constructs_2d_mesh(self, tmp_path):
        from rot_mvgaze_tpu.cli.main import build_experiment, get_parser

        args = get_parser().parse_args(
            [
                "--mode", "train", "--exp_name", "mpiinv_known",
                "--data_path", self._corpus(tmp_path),
                "--output_dir", str(tmp_path / "logs"),
                # batch rounds to the DATA-axis degree (4), not 8
                "--batch_size", "30", "--test_batch_size", "30",
                "--image_size", "32", "--backbone_depth", "18",
                "--num_iter", "1", "--epochs", "1", "--num_workers", "2",
                "--native_loader", "false", "--spatial_partition", "2",
            ]
        )
        trainer = build_experiment(args)
        assert trainer.mesh is not None
        assert trainer.mesh.axis_names == (DATA_AXIS, SPATIAL_AXIS)
        assert dp_size(trainer.mesh) == 4 and spatial_size(trainer.mesh) == 2
        assert args.batch_size == 28  # multiple of dp=4, NOT of 8
        # the trainer must have set the backbone's spatial floor
        assert trainer.model.spatial_unshard is not None

    def test_cli_rejects_bad_spatial_configs(self, tmp_path):
        from rot_mvgaze_tpu.cli.main import build_experiment, get_parser

        corpus = self._corpus(tmp_path)
        base = [
            "--mode", "train", "--exp_name", "mpiinv_known",
            "--data_path", corpus,
            "--output_dir", str(tmp_path / "logs"),
            "--image_size", "32", "--backbone_depth", "18",
            "--native_loader", "false",
        ]
        # spatial partitioning without the mesh path
        args = get_parser().parse_args(
            base + ["--spatial_partition", "2", "--dp", "false"]
        )
        with pytest.raises(SystemExit, match="needs the mesh path"):
            build_experiment(args)
        # spatial must divide the image height
        args = get_parser().parse_args(base + ["--spatial_partition", "3"])
        with pytest.raises(SystemExit, match="must divide"):
            build_experiment(args)

    def test_cli_train_end_to_end_spatial(self, tmp_path):
        """Full `python main.py --mode train --spatial_partition 2` over the
        (data=4, spatial=2) mesh: trains, evals, checkpoints, rc 0."""
        import os

        from rot_mvgaze_tpu.cli.main import main

        out = tmp_path / "logs"
        rc = main(
            [
                "--mode", "train", "--exp_name", "mpiinv_known",
                "--data_path", self._corpus(tmp_path),
                "--output_dir", str(out),
                "--batch_size", "32", "--test_batch_size", "32",
                "--image_size", "32", "--backbone_depth", "18",
                "--num_iter", "1", "--epochs", "1", "--save_epoch", "1",
                "--print_freq", "2", "--num_workers", "2",
                "--spatial_partition", "2",
            ]
        )
        assert rc == 0
        results = [
            os.path.join(r, f)
            for r, _, fs in os.walk(out)
            for f in fs
            if f == "test_results.txt"
        ]
        assert len(results) == 1
        with open(results[0]) as f:
            lines = f.read().strip().splitlines()
        assert len(lines) == 2  # pre-train eval + epoch 1 eval
        assert all(np.isfinite(float(l.rsplit(" ", 1)[-1])) for l in lines)
