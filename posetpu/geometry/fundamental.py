"""Fundamental matrices for the epipolar loss.

The reference mints per-(subject, view-pair) F matrices offline by running
``cv2.findFundamentalMat`` (LMEDS) on ground-truth 2D joints
(run/test/generate_fundamental_matirx.py:33-103) and pickles a dict keyed
``(subject, view_a, view_b)``. Here we provide:

* :func:`fundamental_from_cameras` — the exact F from calibration
  (F = K2^-T [t]x R K1^-1), no data needed;
* :func:`eight_point` — Hartley-normalised 8-point estimation from point
  correspondences, the in-framework equivalent of the cv2 generator;
* :func:`build_fundamental_bank` — per-subject [12, 3, 3] banks in the
  itertools.permutations pair order the loss consumes;
* :func:`load_reference_bank` — reads the reference's pickle format.

Convention: with x1 in view a and x2 in view b (homogeneous pixels),
``x2^T F x1 = 0`` — matching FundamentalLoss's ``(h2 @ F) . h1`` residual
(lib/core/loss.py:128) with F = dict[(subj, a, b)].
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.geometry.cameras import CameraParams
from posetpu.core.losses import VIEW_PERMS


def fundamental_from_cameras(cam1: CameraParams, cam2: CameraParams):
    """Exact F for the pinhole parts of two cameras (distortion ignored, as
    in the reference's fitted F). Host-side float64 — the bank is built once
    offline and the residual x2^T F x1 cancels ~1e6-magnitude products, so
    f32 here would leave O(0.05 px) noise floors. Returns a [3, 3] numpy
    array normalised so the largest |entry| is 1."""
    R1 = np.asarray(cam1.R, np.float64)
    R2 = np.asarray(cam2.R, np.float64)
    T1 = np.asarray(cam1.T, np.float64)
    T2 = np.asarray(cam2.T, np.float64)

    def kmat(cam):
        f = np.asarray(cam.f, np.float64)
        c = np.asarray(cam.c, np.float64)
        return np.array([[f[0], 0, c[0]], [0, f[1], c[1]], [0, 0, 1]])

    r_rel = R2 @ R1.T
    t_rel = R2 @ (T1 - T2)
    tx = np.array(
        [
            [0, -t_rel[2], t_rel[1]],
            [t_rel[2], 0, -t_rel[0]],
            [-t_rel[1], t_rel[0], 0],
        ]
    )
    e = tx @ r_rel
    f = np.linalg.inv(kmat(cam2)).T @ e @ np.linalg.inv(kmat(cam1))
    return (f / np.maximum(np.abs(f).max(), 1e-12)).astype(np.float64)


def eight_point(pts1, pts2):
    """Hartley-normalised 8-point fundamental estimation.

    pts1/pts2: [N, 2] corresponding pixels (N >= 8). Returns [3, 3] F with
    rank-2 enforcement, scaled to max |entry| = 1.
    """
    def normalise(p):
        mean = jnp.mean(p, axis=0)
        d = jnp.sqrt(jnp.sum((p - mean) ** 2, axis=1)).mean()
        s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-12)
        t = jnp.array(
            [[s, 0, -s * mean[0]], [0, s, -s * mean[1]], [0, 0, 1]], p.dtype
        )
        ph = jnp.concatenate([p, jnp.ones((p.shape[0], 1), p.dtype)], 1)
        return ph @ t.T, t

    p1, t1 = normalise(pts1)
    p2, t2 = normalise(pts2)
    # rows: x2 x1 F — with x2^T F x1 = 0, A_i = kron(x2_i, x1_i)
    a = jnp.einsum("ni,nj->nij", p2, p1).reshape(-1, 9)
    g = a.T @ a
    _, vecs = jnp.linalg.eigh(g)
    f = vecs[:, 0].reshape(3, 3)
    # rank-2 projection
    u, s, vt = jnp.linalg.svd(f)
    f = (u * s.at[2].set(0.0)[None, :]) @ vt
    f = t2.T @ f @ t1
    return f / jnp.maximum(jnp.max(jnp.abs(f)), 1e-12)


def build_fundamental_bank(cams_by_subject: dict) -> dict:
    """{subject: CameraParams with leading [V]} -> {(subj, a, b): np.ndarray F}
    over all 12 ordered pairs — the dict shape FundamentalLoss consumes
    (loss.py:92-99)."""
    bank = {}
    for subj, cams in cams_by_subject.items():
        for a, b in VIEW_PERMS:
            ca = jax.tree.map(lambda x, a=a: x[a], cams)
            cb = jax.tree.map(lambda x, b=b: x[b], cams)
            bank[(subj, a, b)] = fundamental_from_cameras(ca, cb).astype(np.float32)
    return bank


def bank_to_batch(bank: dict, subjects) -> jnp.ndarray:
    """Gather per-sample [N, 12, 3, 3] F stacks from a bank by subject id —
    the batched replacement for the reference's per-sample dict lookup
    (loss.py:125-128)."""
    out = np.empty((len(subjects), len(VIEW_PERMS), 3, 3), np.float32)
    for i, s in enumerate(np.asarray(subjects)):
        for p, (a, b) in enumerate(VIEW_PERMS):
            out[i, p] = bank[(int(s), a, b)]
    return jnp.asarray(out)


def load_reference_bank(path: str) -> dict:
    """Read the reference's fundamental_matrix.pkl ({(subj, a, b): 3x3})."""
    with open(path, "rb") as f:
        raw = pickle.load(f)
    return {k: np.asarray(v, np.float32) for k, v in raw.items()}
