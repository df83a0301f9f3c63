"""Temporal Gaussian smoothing of pose history.

The reference smooths each new 3D pose with
`scipy.ndimage.gaussian_filter1d(history, sigma, mode='reflect')` over the
track's stored pose history and keeps only the last (current) element
(`src/tracking/IterativeTracker.py:371-383`), with sigma 0.3-0.6 for the body
and 0.8 for arm joints (9, 10).

This module reproduces that *exactly* for a variable-length history under
jit: scipy's kernel has radius = int(4 * sigma + 0.5) (truncate=4.0), and the
'reflect' boundary (a b c d | d c b a) maps index i outside [0, n) to
n - 1 - (i mod 2n) folding — implemented below as a masked gather, so no
dynamic shapes are needed.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma: float):
    """scipy.ndimage._gaussian_kernel1d with order=0, truncate=4.0."""
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32), radius


def _reflect_index(idx, n):
    """scipy 'reflect' (a b c d | d c b a) index folding, n >= 1."""
    period = 2 * n
    m = jnp.mod(idx, period)
    return jnp.where(m >= n, period - 1 - m, m)


def smooth_last(history, count, sigma: float):
    """Gaussian-smoothed value of the last valid element of a history buffer.

    Args:
      history: (H, ...) array, chronologically ordered, `count` valid entries
               at the front (the current value at index count-1).
      count: scalar int >= 1 (traced ok).
      sigma: static Gaussian sigma.

    Returns:
      Smoothed value with shape history.shape[1:], equal to
      `gaussian_filter1d(history[:count], sigma, axis=0, mode='reflect')[-1]`.
    """
    kernel, radius = gaussian_kernel1d(sigma)
    taps = jnp.arange(-radius, radius + 1)
    idx = _reflect_index(count - 1 + taps, count)
    vals = jnp.take(history, idx, axis=0)  # (2r+1, ...)
    w = jnp.asarray(kernel).reshape((-1,) + (1,) * (history.ndim - 1))
    return jnp.sum(vals * w, axis=0)


def smooth_last_pose(history, count, sigma: float, arm_sigma: float,
                     arm_joints=(9, 10)):
    """Per-joint-group smoothing of the newest pose in a history buffer.

    Matches `IterTrack.smooth_3dpose` (`src/tracking/IterativeTracker.py:
    378-383`): non-arm joints use `sigma`, wrist joints 9/10 use `arm_sigma`.

    Args:
      history: (H, J, 3) chronological pose history (current at count-1).
      count: valid length (>=1).
    Returns:
      (J, 3) smoothed current pose.
    """
    body = smooth_last(history, count, sigma)
    arms = smooth_last(history, count, arm_sigma)
    j = history.shape[1]
    is_arm = jnp.zeros(j, bool).at[jnp.asarray(arm_joints)].set(True)
    return jnp.where(is_arm[:, None], arms, body)
