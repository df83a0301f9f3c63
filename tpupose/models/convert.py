"""Checkpoint converters: torch .pth / darknet .weights -> JAX param trees.

The reference consumes pretrained CUDA checkpoints directly
(`pose_hrnet_w48_384x288.pth`, `yolov3.weights` —
`src/configs/*/model_configs.yaml:38-57`); this module converts them once
into this framework's param pytrees (save/restore via orbax in
`tpupose.models.checkpoint`).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def torch_state_dict_to_tree(state_dict, prefix_strip=("module.",)):
    """Flat torch state_dict -> nested param tree.

    Works for any model whose JAX param nesting mirrors the torch module
    paths (HRNet here): splits names on '.', transposes 4D conv kernels
    OIHW -> HWIO, drops `num_batches_tracked`.
    """
    tree = {}
    for name, value in state_dict.items():
        for p in prefix_strip:
            if name.startswith(p):
                name = name[len(p):]
        if name.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        if arr.ndim == 4 and name.endswith("weight"):
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        parts = name.split(".")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def tree_to_torch_state_dict(tree, prefix=""):
    """Inverse of `torch_state_dict_to_tree` (used in round-trip tests)."""
    out = {}
    for key, value in tree.items():
        name = f"{prefix}.{key}" if prefix else key
        if isinstance(value, dict):
            out.update(tree_to_torch_state_dict(value, name))
        else:
            arr = np.asarray(value)
            if arr.ndim == 4 and name.endswith("weight"):
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            out[name] = arr
    return out


def load_hrnet_torch_checkpoint(path):
    """Load a pose_hrnet .pth checkpoint into a param tree (CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return torch_state_dict_to_tree(sd)


# -- darknet -----------------------------------------------------------------

def read_darknet_file(path):
    """Read a darknet `.weights` binary header + float payload.

    The header is 3x int32 (major, minor, revision) followed by the image
    counter `seen`, whose width depends on the format version: int64 when
    major*10 + minor >= 2 (yolov3.weights ships as version 0.2), int32 for
    older files. Reading 5 int32 unconditionally would misalign every weight
    of an old-format file by 4 bytes.

    Returns:
      (header dict with major/minor/revision/seen, float32 weight array)
    """
    with open(path, "rb") as f:
        version = np.fromfile(f, dtype=np.int32, count=3)
        if version.size != 3:
            raise ValueError(f"not a darknet weights file: {path}")
        major, minor, revision = (int(v) for v in version)
        seen_dtype = np.int64 if major * 10 + minor >= 2 else np.int32
        seen = np.fromfile(f, dtype=seen_dtype, count=1)
        data = np.fromfile(f, dtype=np.float32)
    header = {
        "major": major,
        "minor": minor,
        "revision": revision,
        "seen": int(seen[0]) if seen.size else 0,
    }
    return header, data


def write_darknet_file(path, header, data):
    """Inverse of `read_darknet_file` (fixture/round-trip use)."""
    major, minor = header["major"], header["minor"]
    seen_dtype = np.int64 if major * 10 + minor >= 2 else np.int32
    with open(path, "wb") as f:
        np.asarray(
            [major, minor, header.get("revision", 0)], np.int32
        ).tofile(f)
        np.asarray([header.get("seen", 0)], seen_dtype).tofile(f)
        np.asarray(data, np.float32).tofile(f)


def load_darknet_weights(path, cfg):
    """Parse a darknet `.weights` binary into YOLOv3 params.

    Layout (per conv section, file order == `YoloConfig.conv_specs` order):
    version-dependent header (`read_darknet_file`), then for each conv:
      with BN:   bn_bias, bn_scale, bn_mean, bn_var, conv_weights(OIHW)
      without:   conv_bias, conv_weights(OIHW)
    """
    header, data = read_darknet_file(path)
    return darknet_array_to_params(data, cfg), header


def params_to_darknet_array(params, cfg):
    """Serialize YOLOv3 params back into darknet file order (inverse of
    `darknet_array_to_params`; used to fabricate .weights fixtures and for
    round-trip testing)."""
    specs = cfg.conv_specs
    chunks = []
    for i, (cout, k, s, bn) in enumerate(specs):
        p = params[f"conv{i}"]
        if bn:
            b = p["bn"]
            chunks += [
                np.asarray(b["bias"]), np.asarray(b["weight"]),
                np.asarray(b["running_mean"]), np.asarray(b["running_var"]),
            ]
        else:
            chunks.append(np.asarray(p["conv"]["bias"]))
        w = np.asarray(p["conv"]["weight"]).transpose(3, 2, 0, 1)  # HWIO->OIHW
        chunks.append(w.ravel())
    return np.concatenate([c.ravel() for c in chunks]).astype(np.float32)


def darknet_array_to_params(data, cfg):
    from tpupose.models.yolov3 import conv_in_channels

    specs = cfg.conv_specs
    cins = conv_in_channels(cfg)
    params = {}
    ptr = 0

    def take(n):
        nonlocal ptr
        out = data[ptr:ptr + n]
        assert len(out) == n, f"weights file exhausted at ptr={ptr}, need {n}"
        ptr += n
        return out

    for i, ((cout, k, s, bn), cin) in enumerate(zip(specs, cins)):
        p = {}
        if bn:
            bn_bias = take(cout)
            bn_scale = take(cout)
            bn_mean = take(cout)
            bn_var = take(cout)
            p["bn"] = {
                "weight": jnp.asarray(bn_scale),
                "bias": jnp.asarray(bn_bias),
                "running_mean": jnp.asarray(bn_mean),
                "running_var": jnp.asarray(bn_var),
            }
            conv = {"weight": None}
        else:
            conv = {"bias": jnp.asarray(take(cout)), "weight": None}
        w = take(cout * cin * k * k).reshape(cout, cin, k, k)
        conv["weight"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        p["conv"] = conv
        params[f"conv{i}"] = p
    assert ptr == len(data), f"trailing weights: consumed {ptr} of {len(data)}"
    return params
