"""Mutual-information losses (Deep-InfoMax style) — the adversarial loss
family of lib/core/loss.py:136-780.

All sampling is explicit-key jax.random: multinomial-with-replacement becomes
``jax.random.categorical`` over log-weights, without-replacement becomes the
Gumbel top-k trick — both jit-safe with static shapes. The reference's
variable-size index sets (``nonzero()`` in the joint-specific variant) become
dense masked pairs with weighted reductions; expectation-equivalent, shapes
static.

Feature layout is channels-last: low/high features ``[N, H, W, C]``; the
discriminator callables come from posetpu.models.discriminators.

The reference's Global MI variant is an unimplemented stub
(loss.py:392-398, discriminator.py:101-107) and is not replicated.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from posetpu.core.losses import (
    fenchel_dual_loss,
    infonce_paired,
    jsd_paired,
)


# ----------------------------------------------------------------- sampling


def categorical_rows(key, log_weights, n_samples: int):
    """Multinomial with replacement per row: log_weights [R, M] ->
    indices [R, n_samples]."""
    r, m = log_weights.shape
    logits = jnp.broadcast_to(log_weights[:, None, :], (r, n_samples, m))
    return jax.random.categorical(key, logits, axis=-1)


def gumbel_topk_rows(key, log_weights, k: int):
    """Without-replacement sampling per row via Gumbel top-k:
    log_weights [R, M] -> indices [R, k]."""
    g = jax.random.gumbel(key, log_weights.shape, log_weights.dtype)
    _, idx = jax.lax.top_k(log_weights + g, k)
    return idx


# ----------------------------------------------------- local MI (DIM-style)


def _unfold_3x3(x):
    """[N, H, W, C] -> [N, (H-2)*(W-2), 9*C] patches, ordered (kh, kw, C) to
    match torch unfold+permute (loss.py:206-209)."""
    n, h, w, c = x.shape
    taps = [x[:, dy:h - 2 + dy, dx:w - 2 + dx, :] for dy in range(3) for dx in range(3)]
    patches = jnp.stack(taps, axis=3)  # [N, H-2, W-2, 9, C]
    return patches.reshape(n, (h - 2) * (w - 2), 9 * c)


def _gt_heatmap_cells(joints_crop, feat_stride, grid: int):
    """joints_2d_transformed -> integer heatmap cells (w, h), clamped
    (loss.py:213-214)."""
    cells = (joints_crop / feat_stride + 0.5).astype(jnp.int32)
    return jnp.clip(cells, 0, grid - 1)


def extract_local_pairs_org(
    key, low, high, joints_crop, feat_stride,
    positive_num: int, neg_per_pos: int, cross_image: bool = True,
):
    """The 'org' / 'one_image' pair extraction (loss.py:191-302).

    low: [N, 8, 8, C_low]; high: [N, 64, 64, C_high]; joints_crop:
    [N, J, 2] input-image coords.
    Returns (low_pos, high_pos, low_neg, high_neg) with layout [N, L, C]
    (positions-last-but-one), L_pos = positive_num + J, L_neg = Q * L_pos.
    """
    n, hl, wl, cl = low.shape
    _, hh, wh, ch = high.shape
    assert hl == 8 and hh == 64, "reference supports 8->64 only"
    factor = hh // hl
    j = joints_crop.shape[1]

    k1, k2, k3 = jax.random.split(key, 3)
    low_patches = _unfold_3x3(low)  # [N, 36, 9*C_low]
    n_patch_side = hl - 2  # 6

    # positives: random cells + GT joint cells
    rand_cells = jax.random.randint(
        k1, (n, positive_num, 2), 0, hh
    )  # (w, h) pairs, uniform == multinomial(ones)
    gt_cells = _gt_heatmap_cells(joints_crop, feat_stride, hh)
    cells = jnp.concatenate([rand_cells, gt_cells], axis=1)  # [N, K+J, 2]
    flat_high = cells[:, :, 1] * wh + cells[:, :, 0]
    cells_low = jnp.clip(cells // factor - 1, 0, n_patch_side - 1)
    flat_low = cells_low[:, :, 1] * n_patch_side + cells_low[:, :, 0]

    high_flat = high.reshape(n, hh * wh, ch)
    high_pos = jnp.take_along_axis(high_flat, flat_high[..., None], axis=1)
    low_pos = jnp.take_along_axis(low_patches, flat_low[..., None], axis=1)

    npos = positive_num + j
    nneg = neg_per_pos * npos
    # negatives: same high anchor repeated, low patches from elsewhere
    high_neg = jnp.repeat(high_pos, neg_per_pos, axis=1)  # [N, Q*(K+J), ch]

    if cross_image:
        # low patches of OTHER batch elements (loss.py:228-235)
        other = jnp.stack(
            [jnp.roll(jnp.arange(n), -(s + 1)) for s in range(n - 1)], axis=1
        )  # [N, N-1] indices != row
        pool = low_patches[other.reshape(-1)].reshape(
            n, (n - 1) * low_patches.shape[1], -1
        )
        idx = jax.random.randint(k2, (n, nneg), 0, pool.shape[1])
        low_neg = jnp.take_along_axis(pool, idx[..., None], axis=1)
    else:
        # 'one_image': same image, patches other than the positive cell
        # (loss.py:285-292); sample 0..34 and shift past the excluded index
        base = jnp.repeat(flat_low, neg_per_pos, axis=1)  # [N, Q*(K+J)]
        raw = jax.random.randint(k3, (n, nneg), 0, low_patches.shape[1] - 1)
        idx = raw + (raw >= base)
        low_neg = jnp.take_along_axis(low_patches, idx[..., None], axis=1)

    return low_pos, high_pos, low_neg, high_neg


def extract_local_pairs_joint(
    key, features, joints_crop, joints_vis, feat_stride,
    positive_num: int, neg_per_pos: int, sigma: int,
):
    """The 'joint' (joints-specific) variant (loss.py:330-390), with the
    reference's data-dependent ``nonzero`` pair list replaced by dense masked
    pairs.

    features: [N, 64, 64, C] (low == high == 256-ch image features);
    Returns (low_pos [P, C], high_pos [P, C], pos_mask [P],
             low_neg [Nn, C], high_neg [Nn, C], neg_mask [Nn]).
    """
    n, h, w, c = features.shape
    j = joints_crop.shape[1]
    k1, k2 = jax.random.split(key)

    flat = features.reshape(n, h * w, c)
    cells = _gt_heatmap_cells(joints_crop, feat_stride, h)
    gt_idx = cells[:, :, 1] * w + cells[:, :, 0]  # [N, J]
    gt_feats = jnp.take_along_axis(flat, gt_idx[..., None], axis=1)  # [N, J, C]

    # dense cross-batch positive pairs per joint: (j, a, b), a != b, both vis
    vis = joints_vis  # [N, J]
    pair_mask = (
        vis.T[:, :, None] * vis.T[:, None, :]
        * (1 - jnp.eye(n))[None, :, :]
    )  # [J, N, N]
    ga = jnp.broadcast_to(gt_feats.transpose(1, 0, 2)[:, :, None, :], (j, n, n, c))
    gb = jnp.broadcast_to(gt_feats.transpose(1, 0, 2)[:, None, :, :], (j, n, n, c))
    low_pos_gt = ga.reshape(-1, c)
    high_pos_gt = gb.reshape(-1, c)
    pos_gt_mask = pair_mask.reshape(-1)

    # background positive pairs: random non-GT cells paired together
    logw = jnp.zeros((1, n * h * w), jnp.float32)
    flat_gt_global = (gt_idx + jnp.arange(n)[:, None] * h * w).reshape(-1)
    logw = logw.at[0, flat_gt_global].set(-jnp.inf)
    bg = categorical_rows(k1, logw, positive_num * 2)[0]  # [2T]
    all_feats = flat.reshape(-1, c)
    low_pos_bg = all_feats[bg[:positive_num]]
    high_pos_bg = all_feats[bg[positive_num:]]

    low_pos = jnp.concatenate([low_pos_gt, low_pos_bg], axis=0)
    high_pos = jnp.concatenate([high_pos_gt, high_pos_bg], axis=0)
    pos_mask = jnp.concatenate(
        [pos_gt_mask, jnp.ones(positive_num, jnp.float32)], axis=0
    )

    # negatives: GT anchor vs far-away cells (exclusion radius 3*sigma around
    # every sample's GT of that joint, loss.py:304-328)
    radius = sigma * 3
    offs = jnp.arange(-radius, radius + 1)
    grid = (offs[:, None] * w + offs[None, :]).reshape(-1)
    masked = jnp.clip(gt_idx.reshape(-1)[:, None] + grid[None, :], 0, h * w - 1)
    masked = masked.reshape(n, j, -1) + (jnp.arange(n) * h * w)[:, None, None]
    neg_logw = jnp.zeros((j, n * h * w), jnp.float32)
    # exclude the union over batch of each joint's neighbourhoods
    excl = masked.transpose(1, 0, 2).reshape(j, -1)  # [J, N*(2r+1)^2]
    neg_logw = jax.vmap(lambda lw, e: lw.at[e].set(-jnp.inf))(neg_logw, excl)
    # rows ordered (n-major, j-minor) like the reference's [N*16, ...] layout;
    # every sample shares the joint's union-over-batch exclusion mask
    neg_logw = jnp.tile(neg_logw, (n, 1))
    neg_idx = categorical_rows(k2, neg_logw, neg_per_pos)
    low_neg = all_feats[neg_idx.reshape(-1)]  # [N*J*Q, C]
    high_neg = jnp.repeat(gt_feats.reshape(n * j, c), neg_per_pos, axis=0)
    neg_mask = jnp.repeat(vis.reshape(-1), neg_per_pos)

    return low_pos, high_pos, pos_mask, low_neg, high_neg, neg_mask


def masked_jsd_loss(pos_scores, pos_mask, neg_scores, neg_mask):
    """JSD measure with sample masks (for the dense joint-specific variant)."""
    log2 = jnp.log(2.0)
    e_pos = log2 - jax.nn.softplus(-pos_scores)
    e_neg = jax.nn.softplus(-neg_scores) + neg_scores - log2
    ep = jnp.sum(e_pos * pos_mask) / jnp.maximum(jnp.sum(pos_mask), 1.0)
    en = jnp.sum(e_neg * neg_mask) / jnp.maximum(jnp.sum(neg_mask), 1.0)
    return en - ep


def local_infonce_loss(pos_scores, neg_scores, neg_per_pos: int):
    """MILoss.get_infonce_loss (loss.py:476-486): pos [N, P], neg [N, Q*P]."""
    n, p = pos_scores.shape
    neg = neg_scores.reshape(n, neg_per_pos, p)
    scores = jnp.concatenate([pos_scores[:, None, :], neg], axis=1)  # [N, 1+Q, P]
    return -jnp.mean(jax.nn.log_softmax(scores, axis=1)[:, 0, :])


def contrastive_gradient_penalty(score_fn: Callable, inputs, amount: float = 1.0):
    """Mescheder-style gradient penalty (loss.py:488-522): squared grad norm
    of the critic output w.r.t. (stopped) inputs."""
    inputs = [jax.lax.stop_gradient(x) for x in inputs]

    def total_score(*xs):
        return jnp.sum(score_fn(*xs))

    grads = jax.grad(total_score, argnums=tuple(range(len(inputs))))(*inputs)
    g = grads[0]
    penalty = jnp.mean(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1))
    return penalty * amount


def local_mi_loss(
    key,
    local_d_apply: Callable,
    low,
    high,
    joints_crop,
    joints_vis,
    cfg,
):
    """Full local-MI loss for one view (MILoss.__call__, loss.py:525-561):
    pair extraction + critic scores + measure + gradient penalty.

    ``local_d_apply(low_feats, high_feats)`` scores [.., L] position pairs.
    """
    measure = cfg.LOSS.MI_MEASURE
    specific = cfg.LOSS.SPECIFIC
    positive_num = int(cfg.LOSS.MI_POSITIVE_NUM)
    neg_per_pos = int(cfg.LOSS.MI_NEG_POS_RATIO)
    feat_stride = jnp.asarray(
        cfg.NETWORK.IMAGE_SIZE / cfg.NETWORK.HEATMAP_SIZE, jnp.float32
    )

    if specific in ("org", "one_image"):
        low_pos, high_pos, low_neg, high_neg = extract_local_pairs_org(
            key, low, high, joints_crop, feat_stride,
            positive_num, neg_per_pos, cross_image=(specific == "org"),
        )
        pos_scores = local_d_apply(low_pos, high_pos)  # [N, P]
        neg_scores = local_d_apply(low_neg, high_neg)  # [N, Q*P]
        gp = 0.5 * (
            contrastive_gradient_penalty(local_d_apply, [low_pos, high_pos])
            + contrastive_gradient_penalty(local_d_apply, [low_neg, high_neg])
        )
        if measure == "NCE":
            loss = local_infonce_loss(pos_scores, neg_scores, neg_per_pos)
        else:
            loss = fenchel_dual_loss(pos_scores, neg_scores, measure)
        return loss + gp

    if specific == "joint":
        sigma = int(cfg.NETWORK.SIGMA)
        low_pos, high_pos, pos_mask, low_neg, high_neg, neg_mask = (
            extract_local_pairs_joint(
                key, high, joints_crop, joints_vis, feat_stride,
                positive_num, neg_per_pos, sigma,
            )
        )
        # critic on [L, C] pair lists: add a batch axis of 1
        pos_scores = local_d_apply(low_pos[None], high_pos[None])[0]
        neg_scores = local_d_apply(low_neg[None], high_neg[None])[0]
        gp = 0.5 * (
            contrastive_gradient_penalty(
                lambda a, b: local_d_apply(a, b), [low_pos[None], high_pos[None]]
            )
            + contrastive_gradient_penalty(
                lambda a, b: local_d_apply(a, b), [low_neg[None], high_neg[None]]
            )
        )
        return masked_jsd_loss(pos_scores, pos_mask, neg_scores, neg_mask) + gp

    raise ValueError(f"unknown LOSS.SPECIFIC {specific}")


# ------------------------------------------------------------ view/joints MI


def view_mi_loss(view_d_apply: Callable, joints_2d, view1_num: int, measure: str):
    """MI between view subsets of 2D joints (ViewMILoss, loss.py:564-594).
    joints_2d: [N, V, J, 2] image coords."""
    v1 = joints_2d[:, :view1_num]
    v2 = joints_2d[:, view1_num:]
    n = joints_2d.shape[0]
    e1, e2 = view_d_apply(v1.reshape(n, -1), v2.reshape(n, -1))
    return infonce_paired(e1, e2) if measure == "NCE" else jsd_paired(e1, e2)


def joints_mi_loss(joints_d_apply: Callable, joints_2d, var1_idx, measure: str,
                   var2_stop_gradient: bool = False):
    """MI between joint subsets of one view's 2D coords (JointsMILoss,
    loss.py:597-633). joints_2d: [N, J, 2]."""
    j = joints_2d.shape[1]
    var1_idx = jnp.asarray(var1_idx)
    mask = jnp.zeros(j, bool).at[var1_idx].set(True)
    var2_idx = jnp.where(~mask, size=j - var1_idx.shape[0])[0]
    x1 = joints_2d[:, var1_idx]
    x2 = joints_2d[:, var2_idx]
    if var2_stop_gradient:
        x2 = jax.lax.stop_gradient(x2)
    n = joints_2d.shape[0]
    e1, e2 = joints_d_apply(x1.reshape(n, -1), x2.reshape(n, -1))
    return infonce_paired(e1, e2) if measure == "NCE" else jsd_paired(e1, e2)


# --------------------------------------------------------------- heatmap MI


def _sample_heatmap_indices(key, loc, sigma: int, max_len: int):
    """HeatmapMILoss._sample_some_indices (loss.py:646-672): around each
    location, sample half the (2r+1)^2 window (without replacement) as
    high-response cells plus window_size/4 far-away cells.

    loc: [N] flat cell indices -> [N, Q] with Q = w2//2 + w2//4.
    """
    radius = sigma * 3 + 2
    offs = jnp.arange(-radius, radius + 1)
    grid = (offs[:, None] * max_len + offs[None, :]).reshape(-1)
    w2 = grid.shape[0]
    masked = jnp.clip(loc[:, None] + grid[None, :], 0, max_len * max_len - 1)

    k1, k2 = jax.random.split(key)
    pick = gumbel_topk_rows(k1, jnp.zeros_like(masked, jnp.float32), w2 // 2)
    high_resp = jnp.take_along_axis(masked, pick, axis=1)  # [N, w2//2]

    neg_logw = jnp.zeros((loc.shape[0], max_len * max_len), jnp.float32)
    neg_logw = jax.vmap(lambda lw, m: lw.at[m].set(-jnp.inf))(neg_logw, masked)
    low_resp = gumbel_topk_rows(k2, neg_logw, w2 // 4)
    return jnp.concatenate([high_resp, low_resp], axis=1)


def heatmap_mi_loss(
    key,
    heatmap_d_apply: Callable,
    features,
    heatmaps,
    joints_crop,
    joints_vis,
    cfg,
    joint_idx: int,
):
    """MI between the heatmap probability at a cell and the image feature
    there (HeatmapMILoss, loss.py:636-780).

    features: [N, 64, 64, C]; heatmaps: [N, 64, 64, J]; one view.
    """
    measure = cfg.LOSS.HEATMAP_MI_MEASURE
    sigma = int(cfg.NETWORK.SIGMA)
    feat_stride = jnp.asarray(
        cfg.NETWORK.IMAGE_SIZE / cfg.NETWORK.HEATMAP_SIZE, jnp.float32
    )
    n, h, w, c = features.shape
    k1, k2 = jax.random.split(key)

    cells = _gt_heatmap_cells(joints_crop, feat_stride, h)
    gt_idx = (cells[:, :, 1] * w + cells[:, :, 0])[:, joint_idx]  # [N]
    vis = joints_vis[:, joint_idx]
    rand_idx = jax.random.randint(k1, (n,), 0, h * w)
    # invisible joints fall back to random cells (loss.py:696-699)
    loc = jnp.where(vis > 0, gt_idx, rand_idx)

    idx = _sample_heatmap_indices(k2, loc, sigma, h)  # [N, Q]
    q = idx.shape[1]
    flat_feats = features.reshape(n, h * w, c)
    flat_hm = heatmaps[..., joint_idx].reshape(n, h * w)
    sampled_low = jnp.take_along_axis(flat_feats, idx[..., None], axis=1)  # [N, Q, C]
    sampled_hm = jnp.take_along_axis(flat_hm, idx, axis=1)  # [N, Q]

    # all-pairs (heatmap_i, feature_j) -> [N, Q, Q, 1+C]
    hm_grid = jnp.broadcast_to(sampled_hm[:, None, :, None], (n, q, q, 1))
    ft_grid = jnp.broadcast_to(sampled_low[:, :, None, :], (n, q, q, c))
    pairs = jnp.concatenate([hm_grid, ft_grid], axis=-1).reshape(n * q * q, 1 + c)

    scores = heatmap_d_apply(pairs).reshape(n, q, q)
    if measure == "NCE":
        diag = jnp.einsum("nqq->nq", scores)
        eye = jnp.eye(q)
        off = scores * (1 - eye) - 10.0 * eye
        logits = jnp.concatenate([diag[..., None], off], axis=2)  # [N, Q, Q+1]
        return -jnp.mean(jax.nn.log_softmax(logits, axis=2)[:, :, 0])
    # JSD (loss.py:738-757)
    eye = jnp.eye(q)[None]
    log2 = jnp.log(2.0)
    e_pos = log2 - jax.nn.softplus(-scores)
    e_neg = jax.nn.softplus(-scores) + scores - log2
    ep = jnp.sum(e_pos * eye) / (eye.sum() * n)
    en = jnp.sum(e_neg * (1 - eye)) / ((1 - eye).sum() * n)
    return en - ep


# ------------------------------------------------------------- domain GAN


def domain_d_loss(domain_d_apply: Callable, low_features, is_mpii, smooth: float = 0.1):
    """Discriminator side of the domain-transfer GAN (function.py:233-248):
    labels h36m=0 / mpii=1 with one-sided smoothing to (0.1, 0.9).

    low_features: [N, V, h, w, C]; is_mpii: [N] (source != h36m).
    Returns (bce_loss, accuracy)."""
    from posetpu.core.losses import bce_loss

    n, v = low_features.shape[:2]
    flat = low_features.reshape((n * v,) + low_features.shape[2:])
    label = jnp.repeat(is_mpii, v)
    # the reference computes (0.1, 0.9) smoothing on one line and immediately
    # overwrites it (function.py:237-238); the *effective* labels are
    # mpii -> 1.0, h36m -> 0.1 — replicated as-is
    label_d = label + (1.0 - label) * smooth
    # the critic emits a patch map for non-8x8 features; reduce to one score
    # per sample by spatial mean (PatchGAN reduction — the reference squeezes
    # assuming [N, 1, 1, 1])
    out = domain_d_apply(jax.lax.stop_gradient(flat))
    scores = jnp.mean(out.reshape(out.shape[0], -1), axis=1)
    acc = jnp.mean(((scores >= 0.5) == (label > 0.5)).astype(jnp.float32))
    return bce_loss(scores, label_d), acc


def domain_g_loss(domain_d_apply: Callable, low_features, is_mpii):
    """Generator side: inverted labels (function.py:250-257)."""
    from posetpu.core.losses import bce_loss

    n, v = low_features.shape[:2]
    flat = low_features.reshape((n * v,) + low_features.shape[2:])
    label = 1.0 - jnp.repeat(is_mpii, v)
    out = domain_d_apply(flat)
    scores = jnp.mean(out.reshape(out.shape[0], -1), axis=1)
    return bce_loss(scores, label)
