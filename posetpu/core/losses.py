"""Deterministic training losses, batched over views.

Equivalents of lib/core/loss.py:25-133 plus the inline consistency/domain
losses of lib/core/function.py. The reference evaluates these per view (and,
for the fundamental loss, per sample and per view-pair) in Python loops; here
each is a single einsum/reduction over a ``[N, V, ...]`` batch.

Heatmap layout: NHWC-style ``[..., h, w, J]`` (matching the model); weights
``[..., J]``.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

VIEW_PERMS = tuple(itertools.permutations(range(4), 2))  # 12 ordered pairs,
# itertools order — matches the reference's F-matrix dict keys (loss.py:123)


def joints_mse_loss(output, target, target_weight=None):
    """Weighted per-joint heatmap MSE (JointsMSELoss, loss.py:64-86).

    Reference semantics kept exactly: each joint contributes
    ``mean((w * (pred - gt))^2)`` over (batch, pixels) — the weight multiplies
    the *maps* before the squared difference, so it enters squared — and
    joints are summed. Leading dims of ``output`` are all batch.

    output/target: [..., h, w, J]; target_weight: [..., J] or None.
    """
    diff = output - target
    if target_weight is not None:
        diff = diff * target_weight[..., None, None, :]
    j = output.shape[-1]
    per_joint = jnp.mean(diff * diff, axis=tuple(range(diff.ndim - 1)))  # [J]
    return jnp.sum(per_joint)


def consistency_loss(raw, fused, mask=None):
    """Plain MSE between raw and aggregated heatmaps on h36m samples
    (function.py:291-296). ``mask`` [...] selects contributing samples; the
    mean is over selected elements only (the reference concatenates the
    selected rows first)."""
    se = (raw - fused) ** 2
    if mask is None:
        return jnp.mean(se)
    m = mask.reshape(mask.shape + (1,) * (se.ndim - mask.ndim)).astype(se.dtype)
    denom = jnp.maximum(jnp.sum(m) * se[0].size / max(1, int(m[0].size)), 1.0)
    return jnp.sum(se * m) / denom


def fundamental_loss(joints_2d, target_weight, fmats, sample_mask=None,
                     use_target_weight: bool = True):
    """Epipolar consistency |x2^T F x1| over all 12 ordered view pairs
    (FundamentalLoss, loss.py:89-133) as one einsum.

    joints_2d: [N, V, J, 2] in image coords; target_weight: [N, V, J];
    fmats: [N, 12, 3, 3] per-sample fundamental matrices gathered by subject
    (F[(subj, a, b)] maps view a -> view b constraint, itertools.permutations
    order); sample_mask: [N] 0/1 for non-h36m rows in mixed batches.

    Normalisation matches the reference: sum over (samples, pairs, joints)
    divided by N * 12 * J — with N the *full* batch like the reference's
    ``batch_size`` (masked rows contribute zeros).
    """
    n, v, j, _ = joints_2d.shape
    # precondition: evaluate the bilinear form in *centered* coordinates,
    # conjugating F by the translation (exact algebra: x^T F y is invariant).
    # With raw ~1000 px coords the f32 cancellation floor is ~0.05/joint —
    # the same as the torch reference's — and drowns small epipolar
    # residuals; centering drops the product magnitudes ~10x.
    c = jax.lax.stop_gradient(jnp.mean(joints_2d, axis=(0, 1, 2)))  # [2]
    centered = joints_2d - c
    homo = jnp.concatenate([centered, jnp.ones((n, v, j, 1), joints_2d.dtype)], -1)
    # F' = T^T F T with T = [[1,0,cx],[0,1,cy],[0,0,1]]
    fc = fmats.at[..., :, 2].add(
        fmats[..., :, 0] * c[0] + fmats[..., :, 1] * c[1]
    )
    fc = fc.at[..., 2, :].add(fc[..., 0, :] * c[0] + fc[..., 1, :] * c[1])
    pairs = jnp.asarray(VIEW_PERMS, jnp.int32)
    x1 = homo[:, pairs[:, 0]]  # [N, 12, J, 3]
    x2 = homo[:, pairs[:, 1]]
    # residual_j = x2_j^T F x1_j  (reference: sum((h2 @ F) * h1, dim=1))
    res = jnp.abs(
        jnp.einsum("npja,npab,npjb->npj", x2, fc, x1, precision="highest")
    )
    if use_target_weight:
        w = target_weight[:, pairs[:, 0]] * target_weight[:, pairs[:, 1]]  # [N,12,J]
        res = res * w
    if sample_mask is not None:
        res = res * sample_mask[:, None, None]
    return jnp.sum(res) / (n * len(VIEW_PERMS) * j)


def bce_loss(scores, labels):
    """Binary cross-entropy on probabilities (torch.nn.BCELoss semantics, used
    by the domain-transfer GAN, function.py:241)."""
    eps = 1e-7
    s = jnp.clip(scores, eps, 1.0 - eps)
    return -jnp.mean(labels * jnp.log(s) + (1.0 - labels) * jnp.log(1.0 - s))


# ------------------------------------------------------------------ measures


def infonce_paired(embd1, embd2):
    """InfoNCE over two [N, C] embedding batches: diagonal pairs positive,
    off-diagonal negative (module-level get_infonce_loss, loss.py:25-41)."""
    n = embd1.shape[0]
    u_p = jnp.sum(embd1 * embd2, axis=1, keepdims=True)  # [N, 1]
    u_n = embd1 @ embd2.T  # [N, N]
    eye = jnp.eye(n, dtype=embd1.dtype)
    u_n = u_n * (1 - eye) - 10.0 * eye
    logits = jnp.concatenate([u_p, u_n], axis=1)
    return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])


def jsd_paired(embd1, embd2):
    """Jensen-Shannon MI bound over two [N, C] embedding batches
    (get_jsd_loss, loss.py:43-62)."""
    n = embd1.shape[0]
    u = embd1 @ embd2.T
    eye = jnp.eye(n, dtype=u.dtype)
    log2 = jnp.log(2.0)
    e_pos = log2 - jax.nn.softplus(-u)
    e_neg = jax.nn.softplus(-u) + u - log2
    e_pos = jnp.sum(e_pos * eye) / jnp.sum(eye)
    e_neg = jnp.sum(e_neg * (1 - eye)) / jnp.sum(1 - eye)
    return e_neg - e_pos


def positive_expectation(p_samples, measure: str, average: bool = True):
    """f-divergence positive terms (MILoss.get_positive_expectation,
    loss.py:400-436)."""
    log2 = jnp.log(2.0)
    if measure == "GAN":
        ep = -jax.nn.softplus(-p_samples)
    elif measure == "JSD":
        ep = log2 - jax.nn.softplus(-p_samples)
    elif measure == "X2":
        ep = p_samples**2
    elif measure in ("KL", "DV", "W1"):
        ep = p_samples
    elif measure == "RKL":
        ep = -jnp.exp(-p_samples)
    elif measure == "H2":
        ep = 1.0 - jnp.exp(-p_samples)
    else:
        raise ValueError(f"unknown measure {measure}")
    return jnp.mean(ep) if average else ep


def negative_expectation(q_samples, measure: str, average: bool = True):
    """f-divergence negative terms (loss.py:438-474)."""
    log2 = jnp.log(2.0)
    if measure == "GAN":
        eq = jax.nn.softplus(-q_samples) + q_samples
    elif measure == "JSD":
        eq = jax.nn.softplus(-q_samples) + q_samples - log2
    elif measure == "X2":
        eq = -0.5 * (jnp.abs(q_samples) + 1.0) ** 2
    elif measure == "KL":
        eq = jnp.exp(q_samples - 1.0)
    elif measure == "RKL":
        eq = q_samples - 1.0
    elif measure == "DV":
        eq = jax.nn.logsumexp(q_samples, axis=0) - jnp.log(q_samples.shape[0])
    elif measure == "H2":
        eq = jnp.exp(q_samples) - 1.0
    elif measure == "W1":
        eq = q_samples
    else:
        raise ValueError(f"unknown measure {measure}")
    return jnp.mean(eq) if average else eq


def fenchel_dual_loss(pos_scores, neg_scores, measure: str):
    """E_neg - E_pos for the non-NCE measures (MILoss.__call__ path)."""
    return negative_expectation(neg_scores, measure) - positive_expectation(
        pos_scores, measure
    )
