"""Orbax checkpoint save/restore for param trees and train state.

The reference has no checkpointing of its own (SURVEY.md §5 — it only
consumes pretrained torch/darknet files); here converted weights and
fine-tuning state persist via orbax so long runs resume.
"""
from __future__ import annotations

import os

import jax


def save_params(path: str, params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def restore_params(path: str, like=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like
        )
        return ckptr.restore(path, target)
    return ckptr.restore(path)
