"""Loss/eval/inference semantics vs numpy oracles of the reference."""

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.core.evaluate import pck_accuracy
from posetpu.core.inference import final_preds, flip_test_merge, fuse_routing
from posetpu.core.losses import (
    VIEW_PERMS,
    bce_loss,
    consistency_loss,
    fundamental_loss,
    infonce_paired,
    jsd_paired,
    joints_mse_loss,
)
from posetpu.data.synthetic import make_camera_ring, make_poses3d, tile_cameras
from posetpu.geometry.cameras import project_pose
from posetpu.geometry.fundamental import (
    bank_to_batch,
    build_fundamental_bank,
    eight_point,
    fundamental_from_cameras,
)


def test_joints_mse_matches_reference_semantics(rng):
    n, h, w, j = 4, 8, 8, 16
    out = rng.randn(n, h, w, j).astype(np.float32)
    tgt = rng.randn(n, h, w, j).astype(np.float32)
    wt = (rng.uniform(size=(n, j)) > 0.3).astype(np.float32)
    got = float(joints_mse_loss(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(wt)))
    # oracle: sum_j mean_{n, hw}((w_nj * (p - g))^2)   (loss.py:77-84)
    exp = 0.0
    for jj in range(j):
        d = (out[..., jj] - tgt[..., jj]) * wt[:, jj][:, None, None]
        exp += (d**2).mean()
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_consistency_loss_masked(rng):
    raw = rng.randn(4, 2, 8, 8, 3).astype(np.float32)
    fused = rng.randn(4, 2, 8, 8, 3).astype(np.float32)
    mask = np.array([1, 0, 1, 0], np.float32)
    got = float(consistency_loss(jnp.asarray(raw), jnp.asarray(fused), jnp.asarray(mask)))
    exp = ((raw[mask > 0] - fused[mask > 0]) ** 2).mean()
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_fundamental_loss_matches_oracle(rng):
    n, v, j = 3, 4, 16
    pts = rng.uniform(0, 500, size=(n, v, j, 2)).astype(np.float32)
    wt = (rng.uniform(size=(n, v, j)) > 0.2).astype(np.float32)
    fmats = rng.randn(n, 12, 3, 3).astype(np.float32)
    got = float(
        fundamental_loss(jnp.asarray(pts), jnp.asarray(wt), jnp.asarray(fmats))
    )
    # oracle: reference double loop (loss.py:122-132)
    homo = np.concatenate([pts, np.ones((n, v, j, 1))], -1)
    total = 0.0
    for idx in range(n):
        for p, (a, b) in enumerate(VIEW_PERMS):
            F = fmats[idx, p]
            res = np.abs(np.sum((homo[idx, b] @ F) * homo[idx, a], axis=1))
            res *= wt[idx, b] * wt[idx, a]
            total += res.sum()
    exp = total / (n * 12 * j)
    np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_fundamental_from_cameras_annihilates_gt():
    cams = make_camera_ring(distortion=False)
    gt3d = make_poses3d(2).reshape(-1, 3)
    pix = jax.vmap(lambda cv: project_pose(jnp.asarray(gt3d), cv))(cams)  # [V,N,2]
    bank = build_fundamental_bank({1: cams})
    homo = np.concatenate([np.asarray(pix), np.ones((4, gt3d.shape[0], 1))], -1)
    for (_, a, b), F in bank.items():
        res = np.abs(np.einsum("nj,jk,nk->n", homo[b], F, homo[a]))
        assert res.max() < 0.2, ((a, b), res.max())  # floor set by f32 projection noise


def test_bank_to_batch_gather():
    cams = make_camera_ring(distortion=False)
    bank = build_fundamental_bank({1: cams, 5: cams})
    out = np.asarray(bank_to_batch(bank, [5, 1, 1]))
    assert out.shape == (3, 12, 3, 3)
    np.testing.assert_allclose(out[1, 0], bank[(1, 0, 1)])


def test_eight_point_matches_analytic():
    cams = make_camera_ring(distortion=False)
    c0 = jax.tree.map(lambda x: x[0], cams)
    c1 = jax.tree.map(lambda x: x[1], cams)
    pts3d = make_poses3d(8).reshape(-1, 3)
    p0 = np.asarray(project_pose(jnp.asarray(pts3d), c0))
    p1 = np.asarray(project_pose(jnp.asarray(pts3d), c1))
    F = np.asarray(eight_point(jnp.asarray(p0), jnp.asarray(p1)))
    homo0 = np.concatenate([p0, np.ones((len(p0), 1))], 1)
    homo1 = np.concatenate([p1, np.ones((len(p1), 1))], 1)
    res = np.abs(np.einsum("nj,jk,nk->n", homo1, F, homo0))
    assert res.max() < 0.05, res.max()


def test_infonce_jsd_oracles(rng):
    import torch
    import torch.nn.functional as TF

    e1 = rng.randn(6, 8).astype(np.float32)
    e2 = rng.randn(6, 8).astype(np.float32)
    got = float(infonce_paired(jnp.asarray(e1), jnp.asarray(e2)))
    # oracle (loss.py:25-41)
    t1, t2 = torch.tensor(e1), torch.tensor(e2)
    u_p = torch.sum(t1 * t2, dim=1).unsqueeze(1)
    u_n = torch.mm(t1, t2.t())
    mask = torch.eye(6)
    u_n = (1 - mask) * u_n - 10.0 * mask
    logits = torch.cat([u_p, u_n], dim=1)
    exp = -TF.log_softmax(logits, dim=1)[:, 0].mean()
    np.testing.assert_allclose(got, float(exp), rtol=1e-5)

    got_j = float(jsd_paired(jnp.asarray(e1), jnp.asarray(e2)))
    u = torch.mm(t1, t2.t())
    log2 = np.log(2.0)
    e_pos = log2 - TF.softplus(-u)
    e_neg = TF.softplus(-u) + u - log2
    e_pos = (e_pos * mask).sum() / mask.sum()
    e_neg = (e_neg * (1 - mask)).sum() / (1 - mask).sum()
    np.testing.assert_allclose(got_j, float(e_neg - e_pos), rtol=1e-5)


def test_bce_matches_torch(rng):
    import torch

    s = rng.uniform(0.01, 0.99, size=20).astype(np.float32)
    y = (rng.uniform(size=20) > 0.5).astype(np.float32)
    got = float(bce_loss(jnp.asarray(s), jnp.asarray(y)))
    exp = torch.nn.functional.binary_cross_entropy(torch.tensor(s), torch.tensor(y))
    np.testing.assert_allclose(got, float(exp), rtol=1e-5)


def test_pck_accuracy_matches_oracle(rng):
    from posetpu.ops.heatmap import render_gaussian_heatmaps

    n, j = 6, 16
    gt = rng.uniform(10, 240, size=(n, j, 2)).astype(np.float32)
    noise = rng.uniform(-20, 20, size=(n, j, 2)).astype(np.float32)
    t_gt, _ = render_gaussian_heatmaps(gt, np.ones((n, j)), (64, 64), (256, 256), 2)
    t_pr, _ = render_gaussian_heatmaps(gt + noise, np.ones((n, j)), (64, 64), (256, 256), 2)
    hm_gt = np.moveaxis(np.asarray(t_gt), 1, 1)  # already [N, J, h, w]
    hm_pr = np.asarray(t_pr)
    per_joint, avg, cnt, pred = pck_accuracy(jnp.asarray(hm_pr), jnp.asarray(hm_gt))

    # numpy oracle (evaluate.py:17-72)
    from posetpu.ops.heatmap import max_preds

    p = np.asarray(max_preds(jnp.asarray(hm_pr))[0])
    g = np.asarray(max_preds(jnp.asarray(hm_gt))[0])
    norm = np.array([6.4, 6.4])
    accs = []
    for jj in range(j):
        ds = []
        for nn in range(n):
            if g[nn, jj, 0] > 1 and g[nn, jj, 1] > 1:
                ds.append(np.linalg.norm((p[nn, jj] - g[nn, jj]) / norm))
        accs.append(np.mean(np.array(ds) < 0.5) if ds else -1)
    exp_valid = [a for a in accs if a >= 0]
    np.testing.assert_allclose(np.asarray(per_joint), accs, rtol=1e-5)
    np.testing.assert_allclose(float(avg), np.mean(exp_valid), rtol=1e-5)


def test_fuse_routing():
    raw = np.ones((3, 4, 2, 2, 1), np.float32)
    fused = np.full((3, 4, 2, 2, 1), 2.0, np.float32)
    mask = np.array([1, 0, 1], np.float32)
    out = np.asarray(fuse_routing(jnp.asarray(raw), jnp.asarray(fused), jnp.asarray(mask)))
    np.testing.assert_allclose(out[0], 0.6 * 2 + 0.4 * 1)
    np.testing.assert_allclose(out[1], 1.0)
    assert np.array_equal(
        np.asarray(fuse_routing(jnp.asarray(raw), None, jnp.asarray(mask))), raw
    )


def test_flip_test_merge_identity_on_symmetric(rng):
    """A symmetric heatmap with symmetric joint pairs is a fixed point."""
    pairs = [(0, 1)]
    hm = rng.uniform(size=(2, 8, 8, 2)).astype(np.float32)
    sym = 0.5 * (hm + np.flip(hm[..., ::-1], axis=2))  # symmetrize W + channel swap
    out = np.asarray(flip_test_merge(jnp.asarray(sym), jnp.asarray(sym), pairs))
    np.testing.assert_allclose(out, sym, atol=1e-6)


def test_final_preds_roundtrip(rng):
    """Render at known image coords -> final_preds returns original coords."""
    from posetpu.ops.heatmap import render_gaussian_heatmaps

    n, j = 3, 16
    center = rng.uniform(200, 400, size=(n, 2)).astype(np.float32)
    scale = np.full((n, 2), 1.28, np.float32)  # box=256 -> 1:1 px mapping
    joints_img = rng.uniform(60, 200, size=(n, j, 2)).astype(np.float32)
    t, _ = render_gaussian_heatmaps(joints_img, np.ones((n, j)), (64, 64), (256, 256), 2)
    hm = np.moveaxis(np.asarray(t), 1, -1)  # [N, h, w, J]
    preds, maxv = final_preds(jnp.asarray(hm), jnp.asarray(center), jnp.asarray(scale))
    # expected source coords: crop coords through the 256-frame inverse affine
    from posetpu.ops.affine import affine_transform_points, get_affine_transform

    inv256 = get_affine_transform(center, scale, 0.0, (256, 256), inv=True)
    exp = np.asarray(affine_transform_points(jnp.asarray(joints_img), inv256))
    # decode quantises to heatmap bins: tolerance ~ 1 bin * stride * box scale
    assert np.abs(np.asarray(preds) - exp).max() < 8.0
    assert float(maxv.min()) > 0.5
