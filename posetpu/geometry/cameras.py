"""Batched camera models.

Two distortion conventions coexist in the reference and both are preserved:

* the H36M convention used by ``project_point_radial``
  (lib/multiviews/cameras.py:25-49): averaged focal length and a scalar
  ``tan = p0*y1 + p1*y0`` term applied multiplicatively — used for GT
  projection, RPSM unary terms and fundamental-matrix generation;
* the OpenCV convention used by pymvg inside the triangulation stack
  (lib/multiviews/triangulate.py:17-40): per-axis focals and the standard
  ``[k1, k2, p1, p2, k3]`` model — used by find2d/find3d.

Cameras are stored as a pytree-of-arrays (struct-of-arrays) so every op
vmaps/shards over an arbitrary leading batch of cameras.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CameraParams(NamedTuple):
    """Pytree of camera parameters; every leaf has matching leading batch dims.

    R: [..., 3, 3] world->camera rotation
    T: [..., 3]    camera centre in world coords (H36M convention: x_cam = R @ (x - T))
    f: [..., 2]    (fx, fy)
    c: [..., 2]    principal point
    k: [..., 3]    radial distortion (k1, k2, k3)
    p: [..., 2]    tangential distortion (p1, p2)
    """

    R: jnp.ndarray
    T: jnp.ndarray
    f: jnp.ndarray
    c: jnp.ndarray
    k: jnp.ndarray
    p: jnp.ndarray

    @staticmethod
    def from_dict(cam: dict) -> "CameraParams":
        """Build from the reference's per-view camera dict
        ({R, T, fx, fy, cx, cy, k, p}, multiview_h36m annot format)."""
        return CameraParams(
            R=jnp.asarray(np.asarray(cam["R"], np.float64), jnp.float32),
            T=jnp.asarray(np.asarray(cam["T"], np.float64).reshape(3), jnp.float32),
            f=jnp.asarray(
                np.array([np.squeeze(cam["fx"]), np.squeeze(cam["fy"])], np.float64),
                jnp.float32,
            ),
            c=jnp.asarray(
                np.array([np.squeeze(cam["cx"]), np.squeeze(cam["cy"])], np.float64),
                jnp.float32,
            ),
            k=jnp.asarray(np.asarray(cam["k"], np.float64).reshape(3), jnp.float32),
            p=jnp.asarray(np.asarray(cam["p"], np.float64).reshape(2), jnp.float32),
        )

    def stack(cams: list["CameraParams"]) -> "CameraParams":
        return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def world_to_camera_frame(x, R, T):
    """[..., N, 3] world points -> camera frame (cameras.py:57-68)."""
    return jnp.einsum("...ij,...nj->...ni", R, x - T[..., None, :], precision="highest")


def camera_to_world_frame(x, R, T):
    """[..., N, 3] camera points -> world frame (cameras.py:71-82)."""
    return jnp.einsum("...ji,...nj->...ni", R, x, precision="highest") + T[..., None, :]


def project_pose(x, cam: CameraParams):
    """H36M-convention projection (project_point_radial, cameras.py:25-49).

    x: [..., N, 3] world points; cam leaves broadcast against x's batch dims.
    Returns [..., N, 2] pixels. Uses the averaged focal 0.5*(fx+fy) and the
    scalar multiplicative tangential term, exactly like the reference.
    """
    xc = world_to_camera_frame(x, cam.R, cam.T)
    y = xc[..., :2] / xc[..., 2:3]
    r2 = jnp.sum(y * y, axis=-1)
    k1, k2, k3 = cam.k[..., 0:1], cam.k[..., 1:2], cam.k[..., 2:3]
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    tan = cam.p[..., 0:1] * y[..., 1] + cam.p[..., 1:2] * y[..., 0]
    pq = jnp.stack([cam.p[..., 1], cam.p[..., 0]], axis=-1)
    y = y * (radial + tan)[..., None] + pq[..., None, :] * r2[..., None]
    favg = 0.5 * (cam.f[..., 0] + cam.f[..., 1])
    return favg[..., None, None] * y + cam.c[..., None, :]


def project_points(x, cam: CameraParams, no_distortion: bool = False):
    """OpenCV-convention projection (pymvg find2d equivalent,
    triangulate.py:29-38): per-axis focals, distortion [k1, k2, p1, p2, k3].

    x: [..., N, 3] world points -> [..., N, 2] pixels.
    """
    xc = world_to_camera_frame(x, cam.R, cam.T)
    y = xc[..., :2] / xc[..., 2:3]
    if not no_distortion:
        y = distort_opencv(y, cam.k, cam.p)
    return y * cam.f[..., None, :] + cam.c[..., None, :]


def distort_opencv(y, k, p):
    """Apply OpenCV radial+tangential distortion to normalised coords
    y: [..., N, 2]; k: [..., 3]; p: [..., 2]."""
    yx, yy = y[..., 0], y[..., 1]
    r2 = yx * yx + yy * yy
    k1, k2, k3 = k[..., 0:1], k[..., 1:2], k[..., 2:3]
    p1, p2 = p[..., 0:1], p[..., 1:2]
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    dx = 2.0 * p1 * yx * yy + p2 * (r2 + 2.0 * yx * yx)
    dy = p1 * (r2 + 2.0 * yy * yy) + 2.0 * p2 * yx * yy
    return jnp.stack([yx * radial + dx, yy * radial + dy], axis=-1)


def undistort_opencv(yd, k, p, iters: int = 10):
    """Invert OpenCV distortion by fixed-point iteration (the cv2/pymvg
    ``undistortPoints`` scheme — no closed form exists). Static ``iters``
    keeps it jit-friendly; 10 matches cv2's default accuracy regime.

    yd: [..., N, 2] distorted normalised coords -> undistorted.
    """
    k1, k2, k3 = k[..., 0:1], k[..., 1:2], k[..., 2:3]
    p1, p2 = p[..., 0:1], p[..., 1:2]

    def body(_, y):
        yx, yy = y[..., 0], y[..., 1]
        r2 = yx * yx + yy * yy
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        dx = 2.0 * p1 * yx * yy + p2 * (r2 + 2.0 * yx * yx)
        dy = p1 * (r2 + 2.0 * yy * yy) + 2.0 * p2 * yx * yy
        nx = (yd[..., 0] - dx) / radial
        ny = (yd[..., 1] - dy) / radial
        return jnp.stack([nx, ny], axis=-1)

    return jax.lax.fori_loop(0, iters, body, yd)


def pixels_to_normalized(pix, cam: CameraParams, no_distortion: bool = False, iters: int = 10):
    """Pixels -> undistorted normalised camera coords (the per-camera front
    half of pymvg's find3d)."""
    y = (pix - cam.c[..., None, :]) / cam.f[..., None, :]
    if no_distortion:
        return y
    return undistort_opencv(y, cam.k, cam.p, iters=iters)


def extrinsic_matrix(cam: CameraParams, t_scale: float = 1.0):
    """[..., 3, 4] matrix P = [R | -R T / t_scale]: x_cam = P @ [x/t_scale; 1].

    ``t_scale`` rescales world units (H36M is millimetres; triangulating in
    metres keeps the DLT normal matrix well-conditioned in float32).
    """
    t = -jnp.einsum("...ij,...j->...i", cam.R, cam.T, precision="highest") / t_scale
    return jnp.concatenate([cam.R, t[..., None]], axis=-1)
