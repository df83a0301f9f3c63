"""Shared test helpers: synthetic calibrated camera rigs and skeletons."""
from __future__ import annotations

import numpy as np


def look_at_rt(eye, target, up=(0.0, 0.0, 1.0)):
    """Camera extrinsics [R | t] looking from `eye` toward `target`.

    Camera convention: +z forward, +x right, +y down (standard CV).
    """
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])  # world -> camera rotation
    t = -R @ eye
    return np.concatenate([R, t[:, None]], axis=1)


def make_rig(num_cameras=4, radius=6.0, height=2.0, f=800.0, w=1280, h=720,
             target=(0.0, 0.0, 1.0)):
    """A ring of cameras looking at the origin area. Returns (P, K, RT)."""
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float64)
    Ks, RTs, Ps = [], [], []
    for i in range(num_cameras):
        ang = 2 * np.pi * i / num_cameras + 0.37
        eye = (radius * np.cos(ang), radius * np.sin(ang), height + 0.3 * i)
        RT = look_at_rt(eye, target)
        Ks.append(K)
        RTs.append(RT)
        Ps.append(K @ RT)
    return (
        np.stack(Ps).astype(np.float32),
        np.stack(Ks).astype(np.float32),
        np.stack(RTs).astype(np.float32),
    )


def random_skeletons(rng, n_people=2, n_joints=17, center_box=2.0):
    """Random 3D 'skeletons': clustered point clouds per person, (P, J, 3)."""
    centers = rng.uniform(-center_box, center_box, size=(n_people, 3))
    centers[:, 2] = rng.uniform(0.5, 1.7, size=n_people)
    offsets = rng.normal(scale=0.35, size=(n_people, n_joints, 3))
    return (centers[:, None, :] + offsets).astype(np.float32)


def project_np(P, pts3d):
    """Numpy projection to (x, y) for building GT detections."""
    hom = np.concatenate([pts3d, np.ones_like(pts3d[..., :1])], axis=-1)
    proj = hom @ P.T
    return proj[..., :2] / proj[..., 2:3]
