"""Recursive Pictorial Structure Model (RPSM) — 3D pose refinement.

Equivalent of lib/multiviews/pictorial.py:19-250, redesigned for XLA:

* the unary term (project every grid bin into every view and bilinearly
  sample the heatmap — the reference's triple host loop over joints/views
  with scipy interpolators, pictorial.py:146-190) is one batched
  project + gather;
* the pairwise limb-length indicator is a dense [nbins, nbins] distance
  test computed on device (the reference precomputes scipy.sparse pickles);
* max-product inference unrolls the static 16-node tree (leaves -> root with
  per-edge argmax tables, then backtracking) inside jit;
* the x10 recursive refinement with per-joint 2^3 local grids is a
  ``lax.fori_loop``-free static Python loop of jitted stages (depth is a
  config constant).

Whole-group batching is a ``jax.vmap`` over the group axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from posetpu.geometry.body import CHILDREN, ROOT_IDX, edges, nodes_by_level_desc
from posetpu.geometry.cameras import CameraParams, project_pose
from posetpu.ops.affine import get_affine_transform, affine_transform_points

EDGES = edges()
ORDER = nodes_by_level_desc()


def compute_grid(box_size, box_center, n_bins: int):
    """Cubic grid of n_bins^3 points around box_center, with the reference's
    meshgrid-xy flattening order (pictorial.py:108-119). Returns [nbins^3, 3]."""
    g1d = jnp.linspace(-box_size / 2.0, box_size / 2.0, n_bins)
    gx, gy, gz = jnp.meshgrid(
        g1d + box_center[0], g1d + box_center[1], g1d + box_center[2]
    )
    return jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], axis=1)


def pairwise_constraints(grid_parent, grid_child, limb_length, tolerance):
    """Limb-length indicator [nb_parent, nb_child]
    (compute_pairwise_constrain, pictorial.py:122-143)."""
    d = jnp.linalg.norm(
        grid_parent[:, None, :] - grid_child[None, :, :], axis=-1
    )
    return (jnp.abs(d - limb_length) <= tolerance).astype(jnp.float32)


def _sample_heatmap_bilinear(hmap, xy, h, w):
    """RegularGridInterpolator-equivalent bilinear sample with zero fill
    outside the [0, w-1] x [0, h-1] domain (pictorial.py:178-187).
    hmap: [h, w]; xy: [N, 2] (x, y) heatmap coords."""
    x, y = xy[:, 0], xy[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    v00 = hmap[y0i, x0i]
    v01 = hmap[y0i, x1i]
    v10 = hmap[y1i, x0i]
    v11 = hmap[y1i, x1i]
    val = (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy
    inside = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    return val * inside.astype(val.dtype)


def compute_unary(heatmaps, grids, cams: CameraParams, centers, scales,
                  image_size, heatmap_size):
    """Sum over views of bilinear heatmap samples at projected grid points
    (compute_unary_term, pictorial.py:146-190).

    heatmaps: [V, J, h, w]; grids: [J, nbins, 3] (or [1, nbins, 3] shared);
    cams: leading [V]; centers/scales: [V, 2].
    Returns [J, nbins].
    """
    v, j = heatmaps.shape[0], heatmaps.shape[1]
    h, w = heatmaps.shape[2], heatmaps.shape[3]
    nbins = grids.shape[1]
    shared = grids.shape[0] == 1
    scale_hm = jnp.asarray(
        [w / float(image_size[0]), h / float(image_size[1])], jnp.float32
    )

    def one_view(cam_v, center_v, scale_v, hm_v):
        pts = grids.reshape(-1, 3)  # [J*nbins or nbins, 3]
        xy = project_pose(pts, cam_v)  # image pixels
        trans = get_affine_transform(center_v, scale_v, 0.0, image_size)
        xy = affine_transform_points(xy, trans) * scale_hm  # heatmap coords
        xy = xy.reshape(grids.shape[0], nbins, 2)

        def per_joint(jj):
            g = 0 if shared else jj
            return _sample_heatmap_bilinear(hm_v[jj], xy[g], h, w)

        return jnp.stack([per_joint(jj) for jj in range(j)])  # [J, nbins]

    scores = jax.vmap(one_view)(cams, centers, scales, heatmaps)  # [V, J, nbins]
    return jnp.sum(scores, axis=0)


def infer_max_product(unary, pairwise_list):
    """Max-product inference over the 16-joint tree (infer,
    pictorial.py:19-86).

    unary: [J, nbins] (single shared grid) or list-like of per-joint bins of
    equal size; pairwise_list: {edge_index: [nb_parent, nb_child]} aligned
    with EDGES. Returns [J] selected bin indices.
    """
    j = unary.shape[0]
    energy = {i: unary[i] for i in range(j)}
    argmax_tables = {}

    for node in ORDER:
        for child in CHILDREN[node]:
            e_idx = EDGES.index((node, child))
            pw = pairwise_list[e_idx]  # [nb_node, nb_child]
            scored = pw * energy[child][None, :]
            argmax_tables[(node, child)] = jnp.argmax(scored, axis=1)
            energy[node] = energy[node] * jnp.max(scored, axis=1)

    selected = [None] * j
    root_bin = jnp.argmax(energy[ROOT_IDX])
    selected[ROOT_IDX] = root_bin
    # breadth-first backtrack (static tree)
    queue = [ROOT_IDX]
    while queue:
        node = queue.pop(0)
        for child in CHILDREN[node]:
            selected[child] = argmax_tables[(node, child)][selected[node]]
            queue.append(child)
    return jnp.stack(selected)


def _limb_length_array(limb_length: dict) -> jnp.ndarray:
    return jnp.asarray([float(limb_length[e]) for e in EDGES], jnp.float32)


def rpsm_one_group(
    heatmaps,
    cams: CameraParams,
    centers,
    scales,
    grid_center,
    limb_lengths,  # [n_edges] template lengths, EDGES order
    image_size,
    heatmap_size,
    first_nbins: int = 16,
    recur_nbins: int = 2,
    recur_depth: int = 10,
    grid_size: float = 2000.0,
    tolerance: float = 150.0,
    pairwise0=None,
):
    """Full RPSM for one 4-view group (rpsm, pictorial.py:214-250).

    heatmaps: [V, J, h, w]; cams leading [V]; returns [J, 3] world pose (mm).
    ``pairwise0`` optionally injects the reference's precomputed
    iteration-1 constraint tables ({edge_idx: [nb, nb]}).
    """
    j = heatmaps.shape[1]

    # ---- iteration 1: global 16^3 grid shared by all joints
    grid = compute_grid(grid_size, grid_center, first_nbins)  # [nb, 3]
    unary = compute_unary(
        heatmaps, grid[None], cams, centers, scales, image_size, heatmap_size
    )
    if pairwise0 is None:
        pairwise0 = [
            pairwise_constraints(grid, grid, limb_lengths[e], tolerance)
            for e in range(len(EDGES))
        ]
    bins = infer_max_product(unary, pairwise0)
    pose = grid[bins]  # [J, 3]

    # ---- recursive refinement with per-joint local grids
    cur_size = grid_size / first_nbins
    for _ in range(recur_depth):
        grids = jax.vmap(lambda c: compute_grid(cur_size, c, recur_nbins))(pose)
        unary = compute_unary(
            heatmaps, grids, cams, centers, scales, image_size, heatmap_size
        )
        pairwise = [
            pairwise_constraints(
                grids[EDGES[e][0]], grids[EDGES[e][1]], limb_lengths[e], tolerance
            )
            for e in range(len(EDGES))
        ]
        bins = infer_max_product(unary, pairwise)
        pose = jnp.take_along_axis(grids, bins[:, None, None], axis=1)[:, 0]
        cur_size = cur_size / recur_nbins

    return pose


def rpsm(heatmaps, cams, centers, scales, grid_centers, limb_lengths, cfg,
         pairwise0=None):
    """Batched RPSM over groups.

    heatmaps: [G, V, J, h, w]; cams leading [G, V]; centers/scales [G, V, 2];
    grid_centers [G, 3]; limb_lengths [n_edges]. Returns [G, J, 3].
    """
    image_size = (int(cfg.NETWORK.IMAGE_SIZE[0]), int(cfg.NETWORK.IMAGE_SIZE[1]))
    heatmap_size = (int(cfg.NETWORK.HEATMAP_SIZE[0]), int(cfg.NETWORK.HEATMAP_SIZE[1]))

    fn = partial(
        rpsm_one_group,
        image_size=image_size,
        heatmap_size=heatmap_size,
        first_nbins=int(cfg.PICT_STRUCT.FIRST_NBINS),
        recur_nbins=int(cfg.PICT_STRUCT.RECUR_NBINS),
        recur_depth=int(cfg.PICT_STRUCT.RECUR_DEPTH),
        grid_size=float(cfg.PICT_STRUCT.GRID_SIZE),
        tolerance=float(cfg.PICT_STRUCT.LIMB_LENGTH_TOLERANCE),
        pairwise0=pairwise0,
    )
    return jax.vmap(
        lambda hm, c, ce, sc, gc: fn(hm, c, ce, sc, gc, limb_lengths)
    )(heatmaps, cams, centers, scales, grid_centers)


def limb_lengths_from_pose(pose3d) -> jnp.ndarray:
    """Template limb lengths from a 3D pose ([J, 3]) in EDGES order — the
    in-framework analogue of run/test/generate_pairwise_constraints.py's
    limb-length stage."""
    e = jnp.asarray(EDGES)
    return jnp.linalg.norm(pose3d[e[:, 0]] - pose3d[e[:, 1]], axis=-1)
