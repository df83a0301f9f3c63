"""Temporal filters: One-Euro and constant-acceleration Kalman.

Ports of `src/tracking/OneEuroFilter.py` (Casiez 1-euro filter; the reference
instantiates one per joint per track, `IterativeTracker.py:231-237`, though
its application is commented out in the shipped smoothing path) and
`src/tracking/KalmanFilter.py` (9-state position/velocity/acceleration
filter at 25 Hz, also disabled in the shipped path). Both are provided as
functional, jit/vmap-friendly state pytrees so they can smooth whole
(tracks, joints) batches at once — plus scalar wrappers matching the
reference call shape.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class OneEuroState(NamedTuple):
    """State for a batch of 1-euro filters over arbitrarily shaped signals."""

    x_prev: jnp.ndarray      # filtered value
    dx_prev: jnp.ndarray     # filtered derivative
    t_prev: jnp.ndarray      # previous timestamp
    initialized: jnp.ndarray  # bool


def one_euro_init(shape, dtype=jnp.float32) -> OneEuroState:
    z = jnp.zeros(shape, dtype)
    return OneEuroState(z, z, z, jnp.zeros(shape, bool))


def _alpha(cutoff, dt):
    tau = 1.0 / (2.0 * math.pi) / cutoff
    return 1.0 / (1.0 + tau / dt)


def one_euro_apply(state: OneEuroState, x, t, freq=25.0, mincutoff=0.8,
                   beta=0.4, dcutoff=0.4):
    """One filtering step (vectorized over the state shape).

    Matches the reference configuration for 3D joints
    (`IterativeTracker.py:225-230`): freq 25, mincutoff 0.8, beta 0.4,
    dcutoff 0.4.
    """
    dt = jnp.where(state.initialized, t - state.t_prev, 1.0 / freq)
    dt = jnp.where(dt > 0, dt, 1.0 / freq)
    dx = jnp.where(state.initialized, (x - state.x_prev) / dt, 0.0)
    a_d = 1.0 / (1.0 + (1.0 / (2.0 * math.pi * dcutoff)) / dt)
    dx_hat = jnp.where(
        state.initialized, a_d * dx + (1 - a_d) * state.dx_prev, dx
    )
    cutoff = mincutoff + beta * jnp.abs(dx_hat)
    a = 1.0 / (1.0 + (1.0 / (2.0 * math.pi * cutoff)) / dt)
    x_hat = jnp.where(state.initialized, a * x + (1 - a) * state.x_prev, x)
    new_state = OneEuroState(
        x_prev=x_hat, dx_prev=dx_hat, t_prev=jnp.asarray(t, x_hat.dtype)
        * jnp.ones_like(x_hat), initialized=jnp.ones_like(state.initialized),
    )
    return new_state, x_hat


class OneEuroFilter:
    """Scalar convenience wrapper with the reference's call shape
    (`f(value, timestamp)`)."""

    def __init__(self, freq=25.0, mincutoff=1.0, beta=0.0, dcutoff=1.0):
        if freq <= 0 or mincutoff <= 0 or dcutoff <= 0:
            raise ValueError("freq, mincutoff, dcutoff must be > 0")
        self.freq = freq
        self.mincutoff = mincutoff
        self.beta = beta
        self.dcutoff = dcutoff
        self._x = None
        self._dx = 0.0
        self._t = None

    def __call__(self, x, timestamp=None):
        if x is None:
            return x
        if self._t is not None and timestamp is not None and timestamp > self._t:
            dt = timestamp - self._t
        else:
            dt = 1.0 / self.freq
        self._t = timestamp
        if self._x is None:
            self._x = x
            self._dx = 0.0
            return x
        dx = (x - self._x) / dt
        a_d = _alpha(self.dcutoff, dt)
        self._dx = a_d * dx + (1 - a_d) * self._dx
        cutoff = self.mincutoff + self.beta * abs(self._dx)
        a = _alpha(cutoff, dt)
        self._x = a * x + (1 - a) * self._x
        return self._x


class KalmanState(NamedTuple):
    """Constant-acceleration Kalman filter state for batched 3D points.

    State vector per point: [x y z vx vy vz ax ay az] (the reference's
    9-state cv2.KalmanFilter layout, `src/tracking/KalmanFilter.py:13-52`).
    """

    x: jnp.ndarray  # (..., 9)
    P: jnp.ndarray  # (..., 9, 9)


def kalman_matrices(hz=25.0, process_noise=0.007, measurement_noise=0.1):
    dt = 1.0 / hz
    v, a = dt, 0.5 * dt * dt
    F = np.eye(9, dtype=np.float32)
    for i in range(3):
        F[i, i + 3] = v
        F[i, i + 6] = a
        F[i + 3, i + 6] = v
    H = np.zeros((3, 9), np.float32)
    for i in range(3):
        H[i, i] = 1.0
        H[i, i + 3] = v
        H[i, i + 6] = a
    Q = np.eye(9, dtype=np.float32) * process_noise
    R = np.eye(3, dtype=np.float32) * measurement_noise
    return jnp.asarray(F), jnp.asarray(H), jnp.asarray(Q), jnp.asarray(R)


def kalman_init(pt3d) -> KalmanState:
    pt3d = jnp.asarray(pt3d, jnp.float32)
    x = jnp.concatenate([pt3d, jnp.zeros(pt3d.shape[:-1] + (6,))], axis=-1)
    P = jnp.broadcast_to(jnp.eye(9, dtype=jnp.float32), pt3d.shape[:-1] + (9, 9))
    return KalmanState(x=x, P=P)


def kalman_predict(state: KalmanState, mats=None):
    F, H, Q, R = mats if mats is not None else kalman_matrices()
    x = jnp.einsum("ij,...j->...i", F, state.x)
    P = jnp.einsum("ij,...jk,lk->...il", F, state.P, F) + Q
    return KalmanState(x=x, P=P), jnp.einsum("ij,...j->...i", H, x)


def kalman_correct(state: KalmanState, measurement, mats=None):
    F, H, Q, R = mats if mats is not None else kalman_matrices()
    z = jnp.asarray(measurement, jnp.float32)
    y = z - jnp.einsum("ij,...j->...i", H, state.x)
    S = jnp.einsum("ij,...jk,lk->...il", H, state.P, H) + R
    K = jnp.einsum("...ij,jk,...kl->...il", state.P, H.T, jnp.linalg.inv(S))
    x = state.x + jnp.einsum("...ij,...j->...i", K, y)
    P = state.P - jnp.einsum("...ij,jk,...kl->...il", K, H, state.P)
    return KalmanState(x=x, P=P)
