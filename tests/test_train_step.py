"""Train/eval step tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.config import default_config
from posetpu.models import MultiViewPose, get_pose_net
from posetpu.parallel.mesh import data_mesh, replicated, shard_batch
from posetpu.train.optim import make_optimizer
from posetpu.train.step import init_train_state, make_eval_step, make_train_step

FLIP_PAIRS = [(0, 5), (1, 4), (2, 3), (10, 15), (11, 14), (12, 13)]


def _tiny_cfg():
    cfg = default_config()
    cfg.NETWORK.IMAGE_SIZE = np.array([64, 64])
    cfg.NETWORK.HEATMAP_SIZE = np.array([16, 16])
    cfg.POSE_RESNET.NUM_LAYERS = 18
    return cfg


def _batch(n, rng, with_fund=False):
    b = {
        "images": rng.randn(n, 4, 64, 64, 3).astype(np.float32),
        "target": rng.rand(n, 4, 16, 16, 16).astype(np.float32) * 0.1,
        "weight": np.ones((n, 4, 16), np.float32),
        "is_h36m": np.ones((n,), np.float32),
        "center": np.full((n, 4, 2), 500.0, np.float32),
        "scale": np.full((n, 4, 2), 2.5, np.float32),
    }
    if with_fund:
        b["fmats"] = rng.randn(n, 12, 3, 3).astype(np.float32) * 1e-3
    return b


def test_train_step_runs_and_decreases_mse(rng):
    cfg = _tiny_cfg()
    cfg.TRAIN.LR = 1e-4  # keep early Adam dynamics stable on random init
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    step = make_train_step(model, cfg, tx)
    batch = jax.tree.map(jnp.asarray, _batch(2, rng))
    state = init_train_state(model, cfg, tx, batch)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_train_step_with_all_deterministic_losses(rng):
    cfg = _tiny_cfg()
    cfg.LOSS.USE_CONSISTENT_LOSS = True
    cfg.LOSS.USE_FUNDAMENTAL_LOSS = True
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    step = make_train_step(model, cfg, tx)
    batch = jax.tree.map(jnp.asarray, _batch(2, rng, with_fund=True))
    state = init_train_state(model, cfg, tx, batch)
    state, metrics = step(state, batch)
    for k in ("loss", "mse_loss", "consistent_loss", "fund_loss", "acc"):
        assert np.isfinite(float(metrics[k])), k


def test_watch_grad_norm_emits_metrics(rng):
    """LOSS.WATCH_GRAD_NORM wires the per-loss grad-norm probe into the
    jitted step (reference: function.py:352-362)."""
    cfg = _tiny_cfg()
    cfg.LOSS.WATCH_GRAD_NORM = True
    cfg.LOSS.USE_CONSISTENT_LOSS = True
    cfg.LOSS.USE_FUNDAMENTAL_LOSS = True
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    step = make_train_step(model, cfg, tx)
    batch = jax.tree.map(jnp.asarray, _batch(2, rng, with_fund=True))
    state = init_train_state(model, cfg, tx, batch)
    _, metrics = step(state, batch)
    for k in ("grad_norm_mse", "grad_norm_consistent", "grad_norm_fund"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert float(metrics["grad_norm_mse"]) > 0


def test_train_step_sharded_matches_single_device(rng):
    """The DP-sharded step computes the same update as the unsharded one —
    the pjit equivalent of DDP allreduce correctness."""
    cfg = _tiny_cfg()
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    step = make_train_step(model, cfg, tx)
    batch = jax.tree.map(jnp.asarray, _batch(8, rng))
    state0 = init_train_state(model, cfg, tx, batch)

    _, m_single = step(state0, batch)

    mesh = data_mesh(8)
    with mesh:
        state_r = jax.device_put(state0, replicated(mesh))
        batch_s = shard_batch(batch, mesh)
        _, m_sharded = step(state_r, batch_s)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m_single["acc"]), float(m_sharded["acc"]), rtol=1e-5
    )


def test_eval_step_with_flip(rng):
    cfg = _tiny_cfg()
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.POST_PROCESS = True
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    x = jnp.asarray(rng.randn(2, 4, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    eval_step = make_eval_step(model, cfg, flip_pairs=FLIP_PAIRS)
    batch = jax.tree.map(jnp.asarray, _batch(2, rng))
    out = eval_step(variables, batch)
    assert out["preds"].shape == (2, 4, 16, 2)
    assert out["heatmaps"].shape == (2, 4, 16, 16, 16)
    assert np.isfinite(float(out["loss"]))


def test_fix_backbone_only_updates_aggregation(rng):
    cfg = _tiny_cfg()
    cfg.TRAIN.FIX_BACKBONE = True
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    step = make_train_step(model, cfg, tx)
    batch = jax.tree.map(jnp.asarray, _batch(2, rng))
    state = init_train_state(model, cfg, tx, batch)
    new_state, _ = step(state, batch)
    conv1_before = state.params["resnet"]["conv1"]["kernel"]
    conv1_after = new_state.params["resnet"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(conv1_before), np.asarray(conv1_after))
    aggre_before = state.params["aggre_layer"]["weight"]
    aggre_after = new_state.params["aggre_layer"]["weight"]
    assert np.abs(np.asarray(aggre_after) - np.asarray(aggre_before)).max() > 0


def test_checkpoint_roundtrip(tmp_path, rng):
    from posetpu.train.checkpoint import CheckpointManager

    cfg = _tiny_cfg()
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch = jax.tree.map(jnp.asarray, _batch(1, rng))
    state = init_train_state(model, cfg, tx, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_epoch(3, {"base_model": state}, perf=0.87, is_best=True)
    assert mgr.exists("checkpoint") and mgr.exists("model_best")

    restored, meta = mgr.restore("checkpoint", {"base_model": state})
    assert meta["epoch"] == 3
    np.testing.assert_allclose(
        np.asarray(restored["base_model"].params["resnet"]["conv1"]["kernel"]),
        np.asarray(state.params["resnet"]["conv1"]["kernel"]),
    )


def test_checkpoint_async_save_roundtrip(tmp_path, rng):
    """async_save overlaps the save with training; results must be
    byte-identical to the synchronous path and errors must surface on join."""
    from posetpu.train.checkpoint import CheckpointManager

    cfg = _tiny_cfg()
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch = jax.tree.map(jnp.asarray, _batch(1, rng))
    state = init_train_state(model, cfg, tx, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    mgr.save_epoch(1, {"base_model": state}, perf=0.5, is_best=True)
    # second save waits for the first (one in flight at a time)
    mgr.save_epoch(2, {"base_model": state}, perf=0.9, is_best=True)
    assert mgr.exists("checkpoint") and mgr.exists("model_best")
    restored, meta = mgr.restore("checkpoint", {"base_model": state})
    assert meta["epoch"] == 2
    np.testing.assert_allclose(
        np.asarray(restored["base_model"].params["resnet"]["conv1"]["kernel"]),
        np.asarray(state.params["resnet"]["conv1"]["kernel"]),
    )
    mgr.save_final({"base_model": state})
    assert mgr.exists("final_state")


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_forward_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    coords, maxv = jax.jit(fn)(*args)
    assert coords.shape == (2, 4, 16, 2)


def test_eval_step_sharded_matches_single_device(rng):
    cfg = _tiny_cfg()
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    x = jnp.asarray(rng.randn(1, 4, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    eval_step = make_eval_step(model, cfg, flip_pairs=FLIP_PAIRS)
    batch = jax.tree.map(jnp.asarray, _batch(8, rng))

    single = eval_step(variables, batch)
    mesh = data_mesh(8)
    with mesh:
        v_r = jax.device_put(variables, replicated(mesh))
        batch_s = shard_batch(batch, mesh)
        sharded = eval_step(v_r, batch_s)
    np.testing.assert_allclose(
        np.asarray(single["preds"]), np.asarray(sharded["preds"]), atol=1e-4
    )
    np.testing.assert_allclose(
        float(single["loss"]), float(sharded["loss"]), rtol=1e-4
    )


def test_eval_step_extra_loss_terms(rng):
    cfg = _tiny_cfg()
    cfg.LOSS.USE_CONSISTENT_LOSS = True
    cfg.DATASET.PSEUDO_LABEL_PATH = "some.h5"  # enables the pseudo MSE term
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    x = jnp.asarray(rng.randn(1, 4, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    eval_step = make_eval_step(model, cfg, flip_pairs=FLIP_PAIRS)
    batch = jax.tree.map(jnp.asarray, _batch(2, rng))
    out = eval_step(variables, batch)
    cfg2 = _tiny_cfg()
    base = make_eval_step(MultiViewPose(resnet=get_pose_net(cfg2), aggre=True),
                          cfg2, flip_pairs=FLIP_PAIRS)(variables, batch)
    # extra terms add to the loss
    assert float(out["loss"]) > float(base["loss"])


def test_checkpoint_restore_model_only(tmp_path):
    """restore_model reads only params/batch_stats and survives a CHANGED
    optimizer tree structure between save and restore (ADVICE r3: the
    reference's RESUME_PATH warm start is model-only)."""
    import numpy as np

    from posetpu.train.checkpoint import CheckpointManager
    from posetpu.train.state import TrainState

    state = TrainState(
        params={"w": np.full((2, 2), 3.0, np.float32)},
        batch_stats={"m": np.zeros(3, np.float32)},
        opt_state={"mu": np.ones(5, np.float32), "nu": np.ones(5, np.float32)},
        step=7,
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_final({"base_model": state})

    restored = mgr.restore_model("final_state")["base_model"]
    assert set(restored) == {"params", "batch_stats"}
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state.params["w"])
    np.testing.assert_array_equal(restored["batch_stats"]["m"],
                                  state.batch_stats["m"])
