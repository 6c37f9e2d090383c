"""Batched multi-view triangulation, RANSAC filtering and reprojection.

The reference triangulates one point at a time through pymvg's per-point SVD
inside three nested Python loops (lib/multiviews/triangulate.py:57-213); the
RANSAC filter re-triangulates every view pair per joint the same way
(triangulate.py:102-166). Here the whole thing is one fused batched program:

* pixels -> undistorted normalised coords (fixed-iteration Newton/fixed-point,
  matching pymvg/cv2 semantics) for all groups/views/joints at once;
* DLT as a 4x4 symmetric eigenproblem on the normal matrix A^T A, built in
  *metre-scaled* normalised camera coordinates so float32 stays
  well-conditioned — no per-point SVD, just one batched ``eigh``;
* RANSAC as a dense evaluation of all C(4,2)=6 pair hypotheses with validity
  masks (static shapes — data-dependent inlier sets become masks), preserving
  the reference's first-wins tie-breaking.

Group layout: ``[G, V, ...]`` with V=4 camera views per sample group; flat
``[G*V, ...]`` wrappers mirror the reference's call signatures.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

from posetpu.geometry.cameras import (
    CameraParams,
    extrinsic_matrix,
    pixels_to_normalized,
    project_points,
)

# World-unit rescale for DLT conditioning; H36M worlds are in mm.
_T_SCALE = 1000.0

VIEW_PAIRS = tuple(itertools.combinations(range(4), 2))  # lexicographic, like
# the reference's itertools.combinations over visible views (triangulate.py:142)


def _solve3(G, r):
    """Closed-form 3x3 symmetric solve G x = r via the adjugate — pure
    arithmetic the VPU eats; batched LAPACK-style eigh/solve on tiny matrices
    is catastrophically slow on TPU (measured 13x pipeline slowdown)."""
    a, b, c = G[..., 0, 0], G[..., 0, 1], G[..., 0, 2]
    d, e, f = G[..., 1, 1], G[..., 1, 2], G[..., 2, 2]
    # cofactors of the symmetric matrix [[a, b, c], [b, d, e], [c, e, f]]
    ca = d * f - e * e
    cb = c * e - b * f
    cc = b * e - c * d
    cd = a * f - c * c
    ce = b * c - a * e
    cf = a * d - b * b
    det = a * ca + b * cb + c * cc
    inv_det = jnp.where(jnp.abs(det) > 1e-20, 1.0 / det, 0.0)
    x0 = ca * r[..., 0] + cb * r[..., 1] + cc * r[..., 2]
    x1 = cb * r[..., 0] + cd * r[..., 1] + ce * r[..., 2]
    x2 = cc * r[..., 0] + ce * r[..., 1] + cf * r[..., 2]
    return jnp.stack([x0, x1, x2], axis=-1) * inv_det[..., None]


def _dlt_solve(yn, P, w):
    """Inhomogeneous DLT: rows  x*P[2]-P[0], y*P[2]-P[1]  give A [X; 1] = 0;
    fixing the homogeneous coordinate to 1 (points at infinity cannot occur
    for triangulated joints) turns it into the 3x3 weighted least squares
    M X = -b with M = A[:, :3], b = A[:, 3].

    yn: [V, 2] normalised coords; P: [V, 3, 4]; w: [V] weights (0/1).
    Returns [3] metre-scaled point.
    """
    r0 = yn[:, 0:1] * P[:, 2, :] - P[:, 0, :]  # [V, 4]
    r1 = yn[:, 1:2] * P[:, 2, :] - P[:, 1, :]  # [V, 4]
    rows = jnp.concatenate([r0, r1], axis=0)  # [2V, 4]
    ww = jnp.concatenate([w, w], axis=0)  # [2V]
    m = rows[:, :3]
    b = rows[:, 3]
    G = jnp.einsum("ri,rj,r->ij", m, m, ww, precision="highest")
    r = -jnp.einsum("ri,r,r->i", m, b, ww, precision="highest")
    return _solve3(G, r)


def triangulate_points(poses2d, cams: CameraParams, joints_vis=None, no_distortion=False):
    """Triangulate [G, V, J, 2] pixel observations to [G, J, 3] world points.

    Joints with fewer than two visible views return zeros, matching
    triangulate_poses (triangulate.py:95-97).
    """
    g, v, j, _ = poses2d.shape
    if joints_vis is None:
        joints_vis = jnp.ones((g, v, j), jnp.float32)
    joints_vis = joints_vis.astype(jnp.float32)

    yn = pixels_to_normalized(
        poses2d.reshape(g * v, j, 2),
        jax.tree.map(lambda x: x.reshape((g * v,) + x.shape[2:]), cams),
        no_distortion=no_distortion,
    ).reshape(g, v, j, 2)
    P = extrinsic_matrix(cams, t_scale=_T_SCALE)  # [G, V, 3, 4]

    def per_group(yn_g, w_g, P_g):
        return jax.vmap(_dlt_solve, in_axes=(1, None, 1))(yn_g, P_g, w_g)

    pts = jax.vmap(per_group)(yn, joints_vis, P) * _T_SCALE  # [G, J, 3]
    enough = jnp.sum(joints_vis, axis=1) >= 2  # [G, J]
    return pts * enough[..., None].astype(pts.dtype)


def triangulate_poses(poses2d, cams: CameraParams, joints_vis=None, no_distortion=False):
    """Flat-layout wrapper matching the reference signature
    (triangulate_poses, triangulate.py:57-99): poses2d [N, J, 2] with N = G*4
    view-major interleaved groups -> [G, J, 3]."""
    n, j, _ = poses2d.shape
    g = n // 4
    grouped = poses2d.reshape(g, 4, j, 2)
    cams_g = jax.tree.map(lambda x: x.reshape((g, 4) + x.shape[1:]), cams)
    vis_g = None if joints_vis is None else joints_vis.reshape(g, 4, j)
    return triangulate_points(grouped, cams_g, vis_g, no_distortion)


def ransac_filter(
    poses2d,
    cams: CameraParams,
    joints_vis,
    reproj_thre: float,
    num_inliers: int,
    no_distortion: bool = False,
):
    """Dense-hypothesis RANSAC pseudo-label filter (triangulate.py:102-166).

    For every (group, joint): triangulate each of the 6 view pairs whose both
    views are visible, reproject to all 4 views, count inliers
    (error < ``reproj_thre``, visibility NOT required on the reprojection
    side — the reference checks all views), keep the best pair's inlier set
    if it has >= ``num_inliers`` members. Ties break toward the earlier pair
    then the smaller mean error, exactly like the reference's sequential scan.

    poses2d: [G, V, J, 2]; joints_vis: [G, V, J] -> res_vis [G, V, J] float32.
    """
    g, v, j, _ = poses2d.shape
    vis = joints_vis.astype(jnp.float32)
    pairs = jnp.asarray(VIEW_PAIRS, jnp.int32)  # [6, 2]
    npairs = pairs.shape[0]

    # Triangulate all 6 pair hypotheses for all joints: build per-pair vis
    # masks [G, 6, V, J] keeping only the two pair views.
    pair_mask = jnp.zeros((npairs, v), jnp.float32)
    pair_mask = pair_mask.at[jnp.arange(npairs), pairs[:, 0]].set(1.0)
    pair_mask = pair_mask.at[jnp.arange(npairs), pairs[:, 1]].set(1.0)
    hyp_vis = vis[:, None, :, :] * pair_mask[None, :, :, None]  # [G, 6, V, J]

    def tri_one_pair(pv):
        return triangulate_points(poses2d, cams, pv, no_distortion)  # [G, J, 3]

    pts = jax.vmap(tri_one_pair, in_axes=1, out_axes=1)(hyp_vis)  # [G, 6, J, 3]

    # Reproject every hypothesis point to every view.
    proj = jax.vmap(
        lambda cv: project_points(pts.reshape(g, npairs * j, 3), cv, no_distortion),
        in_axes=1,
        out_axes=1,
    )(cams)  # [G, V, 6*J, 2]
    proj = proj.reshape(g, v, npairs, j, 2)

    err = jnp.linalg.norm(proj - poses2d[:, :, None, :, :], axis=-1)  # [G, V, 6, J]
    err = jnp.moveaxis(err, 1, 2)  # [G, 6, V, J]
    inlier = (err < reproj_thre).astype(jnp.float32)
    n_in = jnp.sum(inlier, axis=2)  # [G, 6, J]
    mean_err = jnp.sum(err * inlier, axis=2) / jnp.maximum(n_in, 1.0)

    # A pair hypothesis is admissible iff both its views are visible AND it
    # reaches the inlier quota.
    both_vis = vis[:, pairs[:, 0], :] * vis[:, pairs[:, 1], :]  # [G, 6, J]
    valid = both_vis * (n_in >= num_inliers)

    # Lexicographic (n_in, -mean_err) argmax with first-wins tie-breaking.
    score = jnp.where(valid > 0, n_in * 1e6 - mean_err, -jnp.inf)  # [G, 6, J]
    best = jnp.argmax(score, axis=1)  # [G, J]
    any_valid = jnp.any(valid > 0, axis=1)  # [G, J]

    best_inlier = jnp.take_along_axis(
        inlier, best[:, None, None, :], axis=1
    )[:, 0]  # [G, V, J]
    return best_inlier * any_valid[:, None, :].astype(jnp.float32)


def reproject_poses(poses2d, cams: CameraParams, joints_vis, no_distortion=False):
    """Triangulate from visible views and write the reprojection back into all
    views (reproject_poses, triangulate.py:169-213).

    poses2d: [G, V, J, 2]; joints_vis: [G, V, J].
    Returns (proj_2d [G, V, J, 2], res_vis [G, V, J]).
    """
    g, v, j, _ = poses2d.shape
    vis = joints_vis.astype(jnp.float32)
    pts = triangulate_points(poses2d, cams, vis, no_distortion)  # [G, J, 3]
    proj = jax.vmap(
        lambda cv: project_points(pts, cv, no_distortion), in_axes=1, out_axes=1
    )(cams)  # [G, V, J, 2]
    enough = (jnp.sum(vis, axis=1) >= 2).astype(jnp.float32)  # [G, J]
    res_vis = jnp.broadcast_to(enough[:, None, :], (g, v, j))
    return proj * res_vis[..., None], res_vis
