"""Heatmap render/decode parity vs numpy oracles of the reference semantics."""

import numpy as np

from posetpu.ops.heatmap import (
    decode_heatmaps,
    flip_back,
    max_preds,
    render_gaussian_heatmaps,
    shift_heatmap_right,
    soft_argmax_2d,
)

FLIP_PAIRS = [(0, 5), (1, 4), (2, 3), (10, 15), (11, 14), (12, 13)]


def _oracle_heatmap(joints, joints_vis, heatmap_size, image_size, sigma):
    """Numpy oracle of generate_heatmap (joints_dataset_compatible.py:207-253)."""
    num_joints = joints.shape[0]
    W, H = heatmap_size
    target = np.zeros((num_joints, H, W), np.float32)
    weight = np.ones((num_joints, 1), np.float32)
    weight[:, 0] = joints_vis
    tmp_size = sigma * 3
    for jid in range(num_joints):
        stride = np.array(image_size, float) / np.array(heatmap_size, float)
        mu_x = int(joints[jid][0] / stride[0] + 0.5)
        mu_y = int(joints[jid][1] / stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= W or ul[1] >= H or br[0] < 0 or br[1] < 0:
            weight[jid] = 0
            continue
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, None]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))
        g_x = max(0, -ul[0]), min(br[0], W) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], H) - ul[1]
        img_x = max(0, ul[0]), min(br[0], W)
        img_y = max(0, ul[1]), min(br[1], H)
        if weight[jid] > 0.5:
            target[jid][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return target, weight[:, 0]


def test_gaussian_render_matches_oracle(rng):
    joints = rng.uniform(-30, 290, size=(16, 2)).astype(np.float32)
    vis = (rng.uniform(size=16) > 0.2).astype(np.float32)
    got_t, got_w = render_gaussian_heatmaps(joints, vis, (64, 64), (256, 256), 2)
    exp_t, exp_w = _oracle_heatmap(joints, vis, (64, 64), (256, 256), 2)
    np.testing.assert_allclose(np.asarray(got_w), exp_w)
    np.testing.assert_allclose(np.asarray(got_t), exp_t, rtol=1e-5, atol=1e-6)


def test_gaussian_render_offmap_zeroes_weight():
    joints = np.array([[-1000.0, -1000.0], [128.0, 128.0]], np.float32)
    vis = np.ones(2, np.float32)
    t, w = render_gaussian_heatmaps(joints, vis, (64, 64), (256, 256), 2)
    assert np.asarray(w).tolist() == [0.0, 1.0]
    assert float(np.asarray(t)[0].sum()) == 0.0


def _oracle_decode(hm, post_process=True):
    """Numpy oracle of get_max_preds + post-process (inference.py:19-66)."""
    n, j, h, w = hm.shape
    flat = hm.reshape(n, j, -1)
    idx = np.argmax(flat, 2)
    maxv = np.max(flat, 2)
    coords = np.stack([(idx % w).astype(np.float32), (idx // w).astype(np.float32)], -1)
    coords *= (maxv > 0)[..., None]
    if post_process:
        for a in range(n):
            for b in range(j):
                px, py = int(coords[a, b, 0] + 0.5), int(coords[a, b, 1] + 0.5)
                if 1 < px < w - 1 and 1 < py < h - 1:
                    diff = np.array(
                        [hm[a, b, py, px + 1] - hm[a, b, py, px - 1],
                         hm[a, b, py + 1, px] - hm[a, b, py - 1, px]]
                    )
                    coords[a, b] += np.sign(diff) * 0.25
    return coords, maxv


def test_decode_matches_oracle(rng):
    hm = rng.uniform(-0.2, 1.0, size=(4, 16, 64, 64)).astype(np.float32)
    got_c, got_v = decode_heatmaps(hm)
    exp_c, exp_v = _oracle_decode(hm)
    np.testing.assert_allclose(np.asarray(got_v), exp_v, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), exp_c, rtol=1e-6)


def test_decode_no_postprocess(rng):
    hm = rng.uniform(0, 1, size=(2, 3, 32, 32)).astype(np.float32)
    got_c, _ = decode_heatmaps(hm, post_process=False)
    exp_c, _ = _oracle_decode(hm, post_process=False)
    np.testing.assert_allclose(np.asarray(got_c), exp_c)


def test_flip_back_involution(rng):
    hm = rng.uniform(size=(2, 16, 8, 8)).astype(np.float32)
    out = flip_back(flip_back(hm, FLIP_PAIRS), FLIP_PAIRS)
    np.testing.assert_allclose(np.asarray(out), hm)


def test_flip_back_semantics(rng):
    """flip_back(W-flip, swap) == numpy oracle from transforms.py:16-30."""
    hm = rng.uniform(size=(2, 16, 8, 8)).astype(np.float32)
    exp = hm[:, :, :, ::-1].copy()
    for a, b in FLIP_PAIRS:
        exp[:, [a, b]] = exp[:, [b, a]]
    np.testing.assert_allclose(np.asarray(flip_back(hm, FLIP_PAIRS)), exp)


def test_shift_heatmap_right(rng):
    hm = rng.uniform(size=(1, 2, 4, 4)).astype(np.float32)
    out = np.asarray(shift_heatmap_right(hm))
    np.testing.assert_allclose(out[..., 1:], hm[..., :-1])
    np.testing.assert_allclose(out[..., 0], hm[..., 0])


def test_soft_argmax_peaks_at_gaussian_center():
    t, _ = render_gaussian_heatmaps(
        np.array([[128.0, 64.0]], np.float32), np.ones(1, np.float32),
        (64, 64), (256, 256), 2,
    )
    pred = np.asarray(soft_argmax_2d(t))
    np.testing.assert_allclose(pred[0], [32.0, 16.0], atol=0.1)


def test_max_preds_zero_map_masked():
    hm = np.zeros((1, 1, 8, 8), np.float32)
    c, v = max_preds(hm)
    assert float(np.asarray(v)[0, 0]) == 0.0
    np.testing.assert_allclose(np.asarray(c)[0, 0], [0.0, 0.0])


def test_decode_hwj_matches_jhw():
    """Channels-last decode == transpose + channels-first decode."""
    import jax.numpy as jnp

    from posetpu.ops.heatmap import decode_heatmaps, decode_heatmaps_hwj

    rng = np.random.default_rng(3)
    hm = jnp.asarray(rng.normal(0, 1, (2, 3, 16, 16, 5)).astype(np.float32))
    for pp in (False, True):
        c1, m1 = decode_heatmaps(jnp.moveaxis(hm, -1, -3), post_process=pp)
        c2, m2 = decode_heatmaps_hwj(hm, post_process=pp)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
