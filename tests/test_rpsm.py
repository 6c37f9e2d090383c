"""RPSM tests on the synthetic rig: rendered GT heatmaps must be refined to
near-GT 3D poses."""

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.config import default_config
from posetpu.data.synthetic import make_camera_ring, tile_cameras
from posetpu.geometry.body import CHILDREN, ROOT_IDX, HumanBody, edges
from posetpu.geometry.cameras import project_pose
from posetpu.geometry.pictorial import (
    compute_grid,
    compute_unary,
    infer_max_product,
    limb_lengths_from_pose,
    pairwise_constraints,
    rpsm,
)
from posetpu.ops.affine import get_affine_transform, affine_transform_points
from posetpu.ops.heatmap import render_gaussian_heatmaps


def _human_pose(seed=0):
    """A plausible 16-joint skeleton (mm) near the origin."""
    rs = np.random.RandomState(seed)
    pose = np.array(
        [
            [150, 0, 50], [150, 30, 480], [120, 0, 900], [-120, 0, 900],
            [-150, 30, 480], [-150, 0, 50], [0, 0, 1000], [0, 20, 1450],
            [0, 30, 1550], [0, 40, 1700], [260, 40, 950], [250, 30, 1180],
            [180, 20, 1400], [-180, 20, 1400], [-250, 30, 1180], [-260, 40, 950],
        ],
        np.float32,
    )
    return pose + rs.uniform(-20, 20, pose.shape).astype(np.float32)


def test_compute_grid_matches_numpy_meshgrid():
    got = np.asarray(compute_grid(100.0, jnp.array([1.0, 2.0, 3.0]), 4))
    g1 = np.linspace(-50, 50, 4)
    gx, gy, gz = np.meshgrid(g1 + 1, g1 + 2, g1 + 3)
    exp = np.concatenate(
        [gx.reshape(-1, 1), gy.reshape(-1, 1), gz.reshape(-1, 1)], axis=1
    )
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_human_body_levels():
    hb = HumanBody()
    assert hb.root_idx == ROOT_IDX
    order = [n["idx"] for n in hb.skeleton_sorted_by_level]
    # children always appear before their parents
    pos = {n: i for i, n in enumerate(order)}
    for parent, child in edges():
        assert pos[child] < pos[parent]


def test_infer_recovers_planted_maximum():
    """Unary peaked at GT bins + permissive pairwise -> infer picks GT."""
    j, nb = 16, 27
    gt_bins = np.random.RandomState(0).randint(0, nb, j)
    unary = np.full((j, nb), 0.1, np.float32)
    unary[np.arange(j), gt_bins] = 5.0
    pairwise = {e: jnp.ones((nb, nb), jnp.float32) for e in range(len(edges()))}
    sel = np.asarray(infer_max_product(jnp.asarray(unary), pairwise))
    np.testing.assert_array_equal(sel, gt_bins)


def test_infer_respects_pairwise_constraint():
    """A high unary bin forbidden by the pairwise mask must be rejected."""
    j, nb = 16, 8
    unary = np.full((j, nb), 1.0, np.float32)
    unary[0, 3] = 10.0  # joint 0 (child of 1) wants bin 3
    pairwise = {e: jnp.ones((nb, nb), jnp.float32) for e in range(len(edges()))}
    # forbid (parent=1 anything, child bin 3)
    e01 = edges().index((1, 0))
    mask = np.ones((nb, nb), np.float32)
    mask[:, 3] = 0.0
    pairwise[e01] = jnp.asarray(mask)
    sel = np.asarray(infer_max_product(jnp.asarray(unary), pairwise))
    assert sel[0] != 3


def _render_rig(pose3d, cams, image_size, heatmap_size, sigma=2):
    """Project a pose into each view and render GT heatmaps for it."""
    v = 4
    hms, centers, scales = [], [], []
    for view in range(v):
        cam = jax.tree.map(lambda x, view=view: x[view], cams)
        pix = project_pose(jnp.asarray(pose3d), cam)
        center = jnp.array([500.0, 500.0])
        scale = jnp.array([5.0, 5.0])
        trans = get_affine_transform(center, scale, 0.0, image_size)
        crop = affine_transform_points(pix, trans)
        t, _ = render_gaussian_heatmaps(
            crop, jnp.ones(pose3d.shape[0]), heatmap_size, image_size, sigma
        )
        hms.append(t)
        centers.append(center)
        scales.append(scale)
    return (
        jnp.stack(hms),
        jnp.stack(centers),
        jnp.stack(scales),
    )


def test_rpsm_refines_to_gt():
    cfg = default_config()
    cfg.NETWORK.IMAGE_SIZE = np.array([256, 256])
    cfg.NETWORK.HEATMAP_SIZE = np.array([64, 64])
    cfg.PICT_STRUCT.FIRST_NBINS = 8
    cfg.PICT_STRUCT.RECUR_DEPTH = 6
    cfg.PICT_STRUCT.GRID_SIZE = 1600.0

    pose = _human_pose()
    cams = make_camera_ring()
    limb = limb_lengths_from_pose(jnp.asarray(pose))
    hms, centers, scales = _render_rig(pose, cams, (256, 256), (64, 64))

    g_cams = tile_cameras(cams, 1)
    out = rpsm(
        hms[None],
        g_cams,
        centers[None],
        scales[None],
        jnp.asarray(pose[ROOT_IDX])[None],
        limb,
        cfg,
    )
    err = np.linalg.norm(np.asarray(out)[0] - pose, axis=-1)
    # 64x64 heatmaps over a 1000px box quantize hard; RPSM should still get
    # within a few cm per joint (reference reports ~30mm on real mixed data)
    assert err.mean() < 60.0, err
    assert err.max() < 150.0, err


def test_limb_lengths_from_pose():
    pose = _human_pose()
    ll = np.asarray(limb_lengths_from_pose(jnp.asarray(pose)))
    assert ll.shape == (len(edges()),)
    assert (ll > 0).all()
