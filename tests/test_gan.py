"""Adversarial (MI/GAN) loss family + alternating train step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetpu.config import default_config
from posetpu.core import mi
from posetpu.models import MultiViewPose, get_pose_net
from posetpu.models.discriminators import build_discriminators
from posetpu.train.gan import (
    init_discriminator_states,
    make_adversarial_train_step,
)
from posetpu.train.optim import make_optimizer
from posetpu.train.step import init_train_state


def _cfg():
    cfg = default_config()
    cfg.NETWORK.IMAGE_SIZE = np.array([64, 64])
    cfg.NETWORK.HEATMAP_SIZE = np.array([16, 16])
    cfg.POSE_RESNET.NUM_LAYERS = 18
    cfg.TRAIN.LR = 1e-4
    cfg.LOSS.SPECIFIC = "joint"
    cfg.LOSS.MI_MEASURE = "JSD"
    cfg.LOSS.USE_LOCAL_MI_LOSS = True
    cfg.LOSS.USE_DOMAIN_TRANSFER_LOSS = True
    cfg.LOSS.USE_VIEW_MI_LOSS = True
    cfg.LOSS.USE_JOINTS_MI_LOSS = True
    cfg.LOSS.USE_HEATMAP_MI_LOSS = True
    cfg.LOSS.USE_CONSISTENT_LOSS = True
    return cfg


def _batch(n, rng):
    return {
        "images": jnp.asarray(rng.randn(n, 4, 64, 64, 3).astype(np.float32)),
        "target": jnp.asarray(rng.rand(n, 4, 16, 16, 16).astype(np.float32) * 0.1),
        "weight": jnp.ones((n, 4, 16), jnp.float32),
        "is_h36m": jnp.asarray((np.arange(n) % 2).astype(np.float32)),
        "center": jnp.full((n, 4, 2), 32.0),
        "scale": jnp.full((n, 4, 2), 0.32),
        "joints_crop": jnp.asarray(rng.uniform(5, 60, (n, 4, 16, 2)).astype(np.float32)),
        "joints_vis": jnp.ones((n, 4, 16), jnp.float32),
    }


# ------------------------------------------------------------ sampler units


def test_categorical_rows_respects_mask(rng):
    logw = jnp.zeros((3, 10)).at[:, :5].set(-jnp.inf)
    idx = mi.categorical_rows(jax.random.PRNGKey(0), logw, 64)
    assert int(idx.min()) >= 5


def test_gumbel_topk_without_replacement(rng):
    logw = jnp.zeros((2, 20))
    idx = np.asarray(mi.gumbel_topk_rows(jax.random.PRNGKey(1), logw, 10))
    for row in idx:
        assert len(set(row.tolist())) == 10  # no repeats


def test_unfold_matches_torch(rng):
    import torch

    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    got = np.asarray(mi._unfold_3x3(jnp.asarray(x)))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    patches = t.unfold(2, 3, 1).unfold(3, 3, 1)  # [N, C, 6, 6, 3, 3]
    exp = patches.permute(0, 2, 3, 4, 5, 1).contiguous().view(2, 36, -1).numpy()
    np.testing.assert_allclose(got, exp)


def test_local_pairs_org_shapes(rng):
    low = jnp.asarray(rng.randn(4, 8, 8, 32).astype(np.float32))
    high = jnp.asarray(rng.randn(4, 64, 64, 16).astype(np.float32))
    joints = jnp.asarray(rng.uniform(0, 250, (4, 16, 2)).astype(np.float32))
    stride = jnp.array([4.0, 4.0])
    lp, hp, ln, hn = mi.extract_local_pairs_org(
        jax.random.PRNGKey(0), low, high, joints, stride, 16, 2, cross_image=True
    )
    assert lp.shape == (4, 32, 9 * 32)
    assert hp.shape == (4, 32, 16)
    assert ln.shape == (4, 64, 9 * 32)
    assert hn.shape == (4, 64, 16)
    lp2, hp2, ln2, hn2 = mi.extract_local_pairs_org(
        jax.random.PRNGKey(0), low, high, joints, stride, 16, 2, cross_image=False
    )
    assert ln2.shape == (4, 64, 9 * 32)


def test_heatmap_mi_runs_and_finite(rng):
    cfg = _cfg()
    from posetpu.models.discriminators import HeatmapDiscriminator

    d = HeatmapDiscriminator()
    feats = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    hm = jnp.asarray(rng.rand(2, 16, 16, 16).astype(np.float32))
    joints = jnp.asarray(rng.uniform(0, 60, (2, 16, 2)).astype(np.float32))
    vis = jnp.ones((2, 16))
    variables = d.init(jax.random.PRNGKey(0), jnp.zeros((4, 9)), train=False)

    def d_apply(pairs):
        return d.apply(variables, pairs, train=True, mutable=["batch_stats"])[0]

    cfg.HEATMAP_DISCRIMINATOR.INPUT_CHANNELS = 9
    loss = mi.heatmap_mi_loss(
        jax.random.PRNGKey(1), d_apply, feats, hm, joints, vis, cfg, 0
    )
    assert np.isfinite(float(loss))


def test_adversarial_step_both_parities(rng):
    cfg = _cfg()
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    discs = build_discriminators(cfg)
    assert set(discs) == {
        "local_discriminator", "domain_discriminator", "view_discriminator",
        "joints_discriminator", "heatmap_discriminator",
    }
    tx_base = make_optimizer(cfg, 10)
    tx_disc = {n: make_optimizer(cfg, 10, discriminator=True) for n in discs}
    batch = _batch(4, rng)

    base = init_train_state(model, cfg, tx_base, batch)
    d_states = init_discriminator_states(
        cfg, discs, tx_disc, batch, model, base.variables
    )
    states = {"base_model": base, **d_states}
    step = make_adversarial_train_step(model, discs, cfg, tx_base, tx_disc)

    key = jax.random.PRNGKey(0)
    states0, m0 = step(states, batch, key, epoch_parity=0)
    for k in ("loss", "mse_loss", "local_mi_g", "domain_g", "domain_d",
              "hmi_d", "vmi_d", "jmi_d", "consistent_loss", "acc"):
        assert np.isfinite(float(m0[k])), k
    assert "hmi_g" not in m0  # G-side MI only on odd epochs

    states1, m1 = step(states0, batch, key, epoch_parity=1)
    for k in ("hmi_g", "vmi_g", "jmi_g"):
        assert np.isfinite(float(m1[k])), k
    assert "hmi_d" not in m1

    # base model updated both parities; view D updated only on parity 0
    assert int(states1["base_model"].step) == 2
    p0 = np.asarray(states["view_discriminator"].params["view1_net"]["fc1"]["kernel"])
    p1 = np.asarray(states0["view_discriminator"].params["view1_net"]["fc1"]["kernel"])
    assert np.abs(p1 - p0).max() > 0


def test_adversarial_step_watch_grad_norm(rng):
    """WATCH_GRAD_NORM on the adversarial step emits per-loss grad norms for
    mse + the parity-gated MI generator terms (function.py:352-362)."""
    cfg = _cfg()
    cfg.LOSS.WATCH_GRAD_NORM = True
    model = MultiViewPose(resnet=get_pose_net(cfg), aggre=True)
    discs = build_discriminators(cfg)
    tx_base = make_optimizer(cfg, 10)
    tx_disc = {n: make_optimizer(cfg, 10, discriminator=True) for n in discs}
    batch = _batch(4, rng)
    base = init_train_state(model, cfg, tx_base, batch)
    d_states = init_discriminator_states(
        cfg, discs, tx_disc, batch, model, base.variables
    )
    states = {"base_model": base, **d_states}
    step = make_adversarial_train_step(model, discs, cfg, tx_base, tx_disc)

    _, m0 = step(states, batch, jax.random.PRNGKey(0), epoch_parity=0)
    assert np.isfinite(float(m0["grad_norm_mse"])) and float(m0["grad_norm_mse"]) > 0
    assert "grad_norm_hmi_g" not in m0  # parity-gated like the loss itself

    _, m1 = step(states, batch, jax.random.PRNGKey(0), epoch_parity=1)
    for k in ("grad_norm_mse", "grad_norm_hmi_g", "grad_norm_vmi_g",
              "grad_norm_jmi_g"):
        assert k in m1 and np.isfinite(float(m1[k])), k


def test_domain_gan_drives_discriminator_accuracy(rng):
    """Sanity: with fixed separable features, D accuracy rises over steps."""
    cfg = default_config()
    from posetpu.models.discriminators import DomainDiscriminator
    from posetpu.core.mi import domain_d_loss

    d = DomainDiscriminator()
    n, v = 8, 1
    feats = np.zeros((n, v, 8, 8, 16), np.float32)
    feats[: n // 2] += 1.0  # mpii half is offset
    is_mpii = np.array([1.0] * (n // 2) + [0.0] * (n // 2), np.float32)
    variables = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16)), train=False)
    import optax

    tx = optax.adam(1e-3)
    opt = tx.init(variables["params"])

    def apply_fn(params, stats):
        def f(x):
            return d.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )[0]
        return f

    params, stats = variables["params"], variables["batch_stats"]
    accs = []
    for _ in range(30):
        def loss_fn(p):
            l, acc = domain_d_loss(apply_fn(p, stats), jnp.asarray(feats),
                                   jnp.asarray(is_mpii))
            return l, acc
        grads, acc = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        accs.append(float(acc))
    assert accs[-1] >= 0.9, accs[-5:]


def test_view_and_joints_mi_losses(rng):
    from posetpu.models.discriminators import JointsDiscriminator, ViewDiscriminator

    n, j = 4, 16
    j2d = jnp.asarray(rng.uniform(0, 500, (n, 4, j, 2)).astype(np.float32))
    vd = ViewDiscriminator(out_channels=128)
    vvars = vd.init(jax.random.PRNGKey(0), jnp.zeros((n, 1 * j * 2)),
                    jnp.zeros((n, 3 * j * 2)), train=False)

    def vd_apply(a, b):
        return vd.apply(vvars, a, b, train=True, mutable=["batch_stats"])[0]

    for measure in ("NCE", "JSD"):
        l = mi.view_mi_loss(vd_apply, j2d, 1, measure)
        assert np.isfinite(float(l)), measure

    jd = JointsDiscriminator(out_channels=64)
    jvars = jd.init(jax.random.PRNGKey(1), jnp.zeros((n, 4 * 2)),
                    jnp.zeros((n, 12 * 2)), train=False)

    def jd_apply(a, b):
        return jd.apply(jvars, a, b, train=True, mutable=["batch_stats"])[0]

    l = mi.joints_mi_loss(jd_apply, j2d[:, 0], (0, 5, 10, 15), "NCE")
    assert np.isfinite(float(l))
    # var2 stop-gradient path
    l2 = mi.joints_mi_loss(jd_apply, j2d[:, 0], (0, 5, 10, 15), "JSD",
                           var2_stop_gradient=True)
    assert np.isfinite(float(l2))


def test_local_mi_joint_variant(rng):
    from posetpu.config import default_config
    from posetpu.models.discriminators import LocalDiscriminator

    cfg = default_config()
    cfg.LOSS.SPECIFIC = "joint"
    cfg.LOSS.MI_MEASURE = "JSD"
    cfg.NETWORK.IMAGE_SIZE = np.array([64, 64])
    cfg.NETWORK.HEATMAP_SIZE = np.array([16, 16])
    n, c = 3, 8
    feats = jnp.asarray(rng.randn(n, 16, 16, c).astype(np.float32))
    joints = jnp.asarray(rng.uniform(0, 60, (n, 16, 2)).astype(np.float32))
    vis = jnp.ones((n, 16))
    d = LocalDiscriminator(out_channels=16)
    dvars = d.init(jax.random.PRNGKey(0), feats[:, 0], feats[:, 0], train=False)

    def d_apply(a, b):
        return d.apply(dvars, a, b, train=True, mutable=["batch_stats"])[0]

    loss = mi.local_mi_loss(jax.random.PRNGKey(2), d_apply, feats, feats,
                            joints, vis, cfg)
    assert np.isfinite(float(loss))


def test_measures_finite(rng):
    from posetpu.core.losses import fenchel_dual_loss

    pos = jnp.asarray(rng.randn(32).astype(np.float32))
    neg = jnp.asarray(rng.randn(32).astype(np.float32))
    for m in ("GAN", "JSD", "X2", "KL", "RKL", "DV", "H2", "W1"):
        assert np.isfinite(float(fenchel_dual_loss(pos, neg, m))), m
