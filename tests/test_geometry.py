"""Camera projection + triangulation + RANSAC invariants on synthetic rigs."""

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.data.synthetic import make_camera_ring, make_poses3d, tile_cameras
from posetpu.geometry.cameras import (
    CameraParams,
    camera_to_world_frame,
    distort_opencv,
    pixels_to_normalized,
    project_points,
    project_pose,
    undistort_opencv,
    world_to_camera_frame,
)
from posetpu.geometry.triangulate import (
    ransac_filter,
    reproject_poses,
    triangulate_points,
    triangulate_poses,
)


def _oracle_project_pose(x, R, T, f, c, k, p):
    """Numpy oracle of project_point_radial (lib/multiviews/cameras.py:25-49)."""
    n = x.shape[0]
    xcam = R.dot(x.T - T.reshape(3, 1))
    y = xcam[:2] / xcam[2]
    r2 = np.sum(y**2, axis=0)
    radial = 1 + np.einsum(
        "ij,ij->j", np.tile(k.reshape(3, 1), (1, n)), np.array([r2, r2**2, r2**3])
    )
    tan = p[0] * y[1] + p[1] * y[0]
    y = y * np.tile(radial + tan, (2, 1)) + np.outer(
        np.array([p[1], p[0]]).reshape(-1), r2
    )
    favg = 0.5 * (f[0] + f[1])
    ypixel = favg * y + c.reshape(2, 1)
    return ypixel.T


def test_project_pose_matches_reference_formula(rng):
    cams = make_camera_ring()
    cam0 = jax.tree.map(lambda x: x[0], cams)
    pts = make_poses3d(1)[0]
    got = np.asarray(project_pose(pts, cam0))
    exp = _oracle_project_pose(
        pts.astype(np.float64),
        np.asarray(cam0.R, np.float64),
        np.asarray(cam0.T, np.float64),
        np.asarray(cam0.f, np.float64),
        np.asarray(cam0.c, np.float64),
        np.asarray(cam0.k, np.float64),
        np.asarray(cam0.p, np.float64),
    )
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=2e-2)


def test_world_camera_roundtrip(rng):
    cams = make_camera_ring()
    cam0 = jax.tree.map(lambda x: x[0], cams)
    pts = jnp.asarray(make_poses3d(1)[0])
    xc = world_to_camera_frame(pts, cam0.R, cam0.T)
    back = camera_to_world_frame(xc, cam0.R, cam0.T)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-2)


def test_undistort_inverts_distort(rng):
    k = jnp.array([-0.2, 0.24, -0.002])
    p = jnp.array([-0.001, -0.0008])
    y = jnp.asarray(rng.uniform(-0.4, 0.4, size=(50, 2)).astype(np.float32))
    yd = distort_opencv(y, k, p)
    yu = undistort_opencv(yd, k, p)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(y), atol=1e-5)


def test_pixels_to_normalized_roundtrip(rng):
    cams = make_camera_ring()
    cam0 = jax.tree.map(lambda x: x[0], cams)
    pts = jnp.asarray(make_poses3d(1)[0])
    pix = project_points(pts, cam0)
    yn = pixels_to_normalized(pix, cam0)
    xc = world_to_camera_frame(pts, cam0.R, cam0.T)
    expected = np.asarray(xc[..., :2] / xc[..., 2:3])
    np.testing.assert_allclose(np.asarray(yn), expected, atol=1e-5)


def test_triangulate_gt_is_exact():
    """The reference's built-in oracle: triangulating GT 2D projections must
    give ~0 MPJPE (SURVEY.md §4, test_triangulate.py GT path)."""
    G, J = 6, 16
    cams = tile_cameras(make_camera_ring(), G)
    gt3d = make_poses3d(G)
    pix = jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv))(c))(
        cams, jnp.asarray(gt3d)
    )  # [G, V, J, 2]
    rec = triangulate_points(pix, cams)
    err = np.linalg.norm(np.asarray(rec) - gt3d, axis=-1)
    assert err.mean() < 1.0, f"mean err {err.mean()} mm"


def test_triangulate_no_distortion_flag():
    G = 3
    cams = tile_cameras(make_camera_ring(distortion=False), G)
    gt3d = make_poses3d(G)
    pix = jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv, True))(c))(
        cams, jnp.asarray(gt3d)
    )
    rec = triangulate_points(pix, cams, no_distortion=True)
    err = np.linalg.norm(np.asarray(rec) - gt3d, axis=-1)
    assert err.mean() < 1.0


def test_triangulate_under_two_views_zero():
    G, J = 2, 16
    cams = tile_cameras(make_camera_ring(), G)
    gt3d = make_poses3d(G)
    pix = jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv))(c))(
        cams, jnp.asarray(gt3d)
    )
    vis = np.ones((G, 4, J), np.float32)
    vis[0, 1:, 0] = 0  # joint 0 of group 0: single visible view
    rec = np.asarray(triangulate_points(pix, cams, jnp.asarray(vis)))
    np.testing.assert_allclose(rec[0, 0], 0.0)
    assert np.linalg.norm(rec[1, 0] - gt3d[1, 0]) < 1.0


def test_triangulate_flat_wrapper_matches_grouped():
    G, J = 4, 16
    cams = tile_cameras(make_camera_ring(), G)
    gt3d = make_poses3d(G)
    pix = jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv))(c))(
        cams, jnp.asarray(gt3d)
    )
    flat_pix = np.asarray(pix).reshape(G * 4, J, 2)
    flat_cams = jax.tree.map(lambda x: x.reshape((G * 4,) + x.shape[2:]), cams)
    out = triangulate_poses(jnp.asarray(flat_pix), flat_cams)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(triangulate_points(pix, cams)), atol=1e-3
    )


def test_ransac_accepts_clean_rejects_outlier():
    G, J = 2, 16
    cams = tile_cameras(make_camera_ring(), G)
    gt3d = make_poses3d(G)
    pix = np.asarray(
        jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv))(c))(
            cams, jnp.asarray(gt3d)
        )
    )
    # corrupt view 2 of group 0, joint 3 by 300 px
    pix_bad = np.array(pix)
    pix_bad[0, 2, 3] += 300.0
    vis = np.ones((G, 4, J), np.float32)
    res = np.asarray(
        ransac_filter(jnp.asarray(pix_bad), cams, jnp.asarray(vis), 10.0, 3)
    )
    # clean joints keep all 4 views
    assert res[1].min() == 1.0
    # corrupted view is dropped, others kept
    assert res[0, 2, 3] == 0.0
    assert res[0, [0, 1, 3], 3].min() == 1.0


def test_ransac_quota_not_met_gives_zero():
    G, J = 1, 4
    cams = tile_cameras(make_camera_ring(), G)
    gt3d = make_poses3d(G, n_joints=J)
    pix = np.array(
        jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv))(c))(
            cams, jnp.asarray(gt3d)
        )
    )
    pix[0, 2, 0] += 300.0
    pix[0, 3, 0] += 280.0  # only 2 consistent views remain for joint 0
    vis = np.ones((G, 4, J), np.float32)
    res = np.asarray(ransac_filter(jnp.asarray(pix), cams, jnp.asarray(vis), 10.0, 3))
    assert res[0, :, 0].sum() == 0.0
    assert res[0, :, 1].sum() == 4.0


def test_reproject_poses_fills_all_views():
    G, J = 2, 16
    cams = tile_cameras(make_camera_ring(), G)
    gt3d = make_poses3d(G)
    pix = np.asarray(
        jax.vmap(lambda c, x: jax.vmap(lambda cv: project_points(x, cv))(c))(
            cams, jnp.asarray(gt3d)
        )
    )
    vis = np.ones((G, 4, J), np.float32)
    vis[:, 0, :] = 0  # view 0 unobserved
    proj, res_vis = reproject_poses(jnp.asarray(pix), cams, jnp.asarray(vis))
    np.testing.assert_allclose(np.asarray(res_vis), 1.0)
    err = np.linalg.norm(np.asarray(proj) - pix, axis=-1)
    assert err.max() < 0.5  # reprojection recovers even the unobserved view
