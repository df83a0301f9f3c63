"""Appearance / geometry affinity utilities (CSA matcher building blocks).

Working versions of the reference's partially-broken ReID affinity helpers
(`src/utils/matching.py:153-231`): normalized geometry affinity over epiline
distances and embedding affinities for appearance features. These back the
config's CSA_* matcher options (`configs/CampusSeq1/model_configs.yaml:67-69`)
which the reference never wires up.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalized_geometry_affinity(distance_matrix, eps=1e-5):
    """Z-score + sigmoid mapping of a distance matrix to (0, 1) affinities
    (the reference's `geometry_affinity` tail, `src/utils/matching.py:182-183`).
    """
    d = jnp.asarray(distance_matrix, jnp.float32)
    z = -(d - jnp.mean(d)) / (jnp.std(d) + eps)
    return 1.0 / (1.0 + jnp.exp(-5.0 * z))


def pairwise_sq_distances(x, y):
    """Squared euclidean distances between feature rows, (N, M)."""
    x = jnp.asarray(x, jnp.float32).reshape(len(x), -1)
    y = jnp.asarray(y, jnp.float32).reshape(len(y), -1)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    y2 = jnp.sum(y * y, axis=1, keepdims=True)
    return x2 + y2.T - 2.0 * (x @ y.T)


def embedding_affinity(query, gallery, metric="cosine"):
    """Appearance affinity in [0, 1] (fixed version of the reference's
    `embedding_affinity`, which referenced an undefined `cdist` —
    `src/utils/matching.py:216-231`)."""
    q = jnp.asarray(query, jnp.float32).reshape(len(query), -1)
    g = jnp.asarray(gallery, jnp.float32).reshape(len(gallery), -1)
    if metric == "cosine":
        qn = q / jnp.linalg.norm(q, axis=1, keepdims=True).clip(1e-12)
        gn = g / jnp.linalg.norm(g, axis=1, keepdims=True).clip(1e-12)
        cost = 1.0 - qn @ gn.T
    else:
        cost = jnp.sqrt(jnp.maximum(pairwise_sq_distances(q, g), 0.0))
    return 1.0 - jnp.maximum(cost, 0.0)


def pairwise_affinity(query, gallery, scale=5.0, eps=1e-5):
    """Z-scored sigmoid affinity over squared distances (the reference's
    torch `pairwise_affinity`, `src/utils/matching.py:198-214`)."""
    d = pairwise_sq_distances(query, gallery)
    z = -(d - jnp.mean(d)) / (jnp.std(d) + eps)
    return 1.0 / (1.0 + jnp.exp(-scale * z))
