"""Independent derivation of the OFFICIAL pose_hrnet state_dict schemas.

This module encodes the module structure of the public `pose_hrnet` network
(leoxiaobin/deep-high-resolution-net.pytorch `lib/models/pose_hrnet.py`, the
model class behind the reference's `pose_hrnet_w48_384x288.pth` checkpoint —
`/root/reference/src/configs/CampusSeq1/model_configs.yaml:50-57`,
`/root/reference/README.md:78-80`) **without importing any tpupose model
code**: the expected key list is written out rule-by-rule from the official
torch module tree (Sequential/ModuleList index nesting included). The frozen
fixtures `fixtures/pose_hrnet_w48_384x288.keys.txt` and
`fixtures/pose_hrnet_w32.keys.txt` (the key set is input-size-independent;
w32_256x192 and w32_384x288 share it) are generated from this and compared
in tests against `tree_to_torch_state_dict(hrnet_init(...))` so the two
derivations pin each other: a first real-weights load can only fail on
numerics, never on key layout.

Official architecture facts encoded here (pose_hrnet.py; W32 differs from
W48 ONLY in the branch width table 32/64/128/256 vs 48/96/192/384):
  * stem: conv1/bn1 (3->64, 3x3 s2), conv2/bn2 (64->64, 3x3 s2), no biases;
  * layer1: 4 Bottlenecks (planes 64, expansion 4), block 0 has a
    downsample Sequential(Conv 1x1 256, BN);
  * transition1: ModuleList[ Sequential(Conv3x3 256->48, BN, ReLU),
    Sequential(Sequential(Conv3x3 s2 256->96, BN, ReLU)) ];
  * transitionK (K=2,3): ModuleList with None entries for existing branches
    (None emits NO keys) and one Sequential(Sequential(conv,BN,ReLU)) making
    the new branch from the previous last branch (96->192, 192->384);
  * stages: stage2 1 module / 2 branches, stage3 4 modules / 3 branches,
    stage4 3 modules / 4 branches, each branch 4 BasicBlocks (two 3x3 convs,
    in==out so never a downsample);
  * fuse_layers inside each module: row i, entry j: for j>i a
    Sequential(Conv1x1 Cj->Ci, BN, Upsample); for j<i a Sequential of (i-j)
    Sequential(Conv3x3 s2, BN)
    whose first (i-j-1) convs keep Cj channels and whose last outputs Ci;
    j==i is None. The LAST stage4 module is built with
    multi_scale_output=False, so only fuse row 0 exists;
  * final_layer: Conv1x1 48->17 WITH bias;
  * every BatchNorm2d contributes weight/bias/running_mean/running_var/
    num_batches_tracked; conv biases exist only on final_layer.
"""
from __future__ import annotations

NUM_JOINTS = 17
STAGE_MODULES = {2: 1, 3: 4, 4: 3}
BLOCKS_PER_BRANCH = 4
STEM = 64
L1_PLANES, L1_EXPANSION, L1_BLOCKS = 64, 4, 4


def _conv(name, cout, cin, k, bias=False):
    out = [(f"{name}.weight", (cout, cin, k, k))]
    if bias:
        out.append((f"{name}.bias", (cout,)))
    return out


def _bn(name, c):
    return [
        (f"{name}.weight", (c,)),
        (f"{name}.bias", (c,)),
        (f"{name}.running_mean", (c,)),
        (f"{name}.running_var", (c,)),
        (f"{name}.num_batches_tracked", ()),
    ]


def _basic_block(name, c):
    return (
        _conv(f"{name}.conv1", c, c, 3)
        + _bn(f"{name}.bn1", c)
        + _conv(f"{name}.conv2", c, c, 3)
        + _bn(f"{name}.bn2", c)
    )


def _bottleneck(name, cin, planes, expansion):
    cout = planes * expansion
    keys = (
        _conv(f"{name}.conv1", planes, cin, 1)
        + _bn(f"{name}.bn1", planes)
        + _conv(f"{name}.conv2", planes, planes, 3)
        + _bn(f"{name}.bn2", planes)
        + _conv(f"{name}.conv3", cout, planes, 1)
        + _bn(f"{name}.bn3", cout)
    )
    if cin != cout:
        keys += _conv(f"{name}.downsample.0", cout, cin, 1)
        keys += _bn(f"{name}.downsample.1", cout)
    return keys


def _fuse_layers(name, channels, out_branches):
    keys = []
    n = len(channels)
    for i in range(out_branches):
        for j in range(n):
            if j == i:
                continue  # None entry: no parameters, no keys
            if j > i:
                keys += _conv(f"{name}.{i}.{j}.0", channels[i], channels[j], 1)
                keys += _bn(f"{name}.{i}.{j}.1", channels[i])
            else:
                for k in range(i - j):
                    cout = channels[i] if k == i - j - 1 else channels[j]
                    cin = channels[j]
                    keys += _conv(f"{name}.{i}.{j}.{k}.0", cout, cin, 3)
                    keys += _bn(f"{name}.{i}.{j}.{k}.1", cout)
    return keys


def official_pose_hrnet_manifest(width=48):
    """Full official state_dict schema: ordered list of (key, shape).

    `width` selects the family member: 48 -> pose_hrnet_w48 (the reference's
    checkpoint), 32 -> pose_hrnet_w32 (the other official release)."""
    CHANNELS = (width, 2 * width, 4 * width, 8 * width)
    keys = []
    # stem
    keys += _conv("conv1", STEM, 3, 3)
    keys += _bn("bn1", STEM)
    keys += _conv("conv2", STEM, STEM, 3)
    keys += _bn("bn2", STEM)
    # layer1 bottlenecks
    cin = STEM
    for b in range(L1_BLOCKS):
        keys += _bottleneck(f"layer1.{b}", cin, L1_PLANES, L1_EXPANSION)
        cin = L1_PLANES * L1_EXPANSION
    c_l1 = L1_PLANES * L1_EXPANSION
    # transition1 (both entries non-None)
    keys += _conv("transition1.0.0", CHANNELS[0], c_l1, 3)
    keys += _bn("transition1.0.1", CHANNELS[0])
    keys += _conv("transition1.1.0.0", CHANNELS[1], c_l1, 3)
    keys += _bn("transition1.1.0.1", CHANNELS[1])
    # stages 2..4 with their leading transitions
    for stage in (2, 3, 4):
        n_br = stage  # stage2: 2 branches, stage3: 3, stage4: 4
        if stage > 2:
            # transitionK: None for branches that already exist, one nested
            # Sequential for the new branch (index n_br - 1)
            new = n_br - 1
            keys += _conv(
                f"transition{stage - 1}.{new}.0.0",
                CHANNELS[new], CHANNELS[new - 1], 3,
            )
            keys += _bn(f"transition{stage - 1}.{new}.0.1", CHANNELS[new])
        for m in range(STAGE_MODULES[stage]):
            base = f"stage{stage}.{m}"
            for br in range(n_br):
                for blk in range(BLOCKS_PER_BRANCH):
                    keys += _basic_block(
                        f"{base}.branches.{br}.{blk}", CHANNELS[br]
                    )
            last_module = (
                stage == 4 and m == STAGE_MODULES[stage] - 1
            )
            out_b = 1 if last_module else n_br
            keys += _fuse_layers(
                f"{base}.fuse_layers", CHANNELS[:n_br], out_b
            )
    keys += _conv("final_layer", NUM_JOINTS, CHANNELS[0], 1, bias=True)
    return keys


def official_pose_hrnet_w48_manifest():
    return official_pose_hrnet_manifest(48)


def official_pose_hrnet_w32_manifest():
    return official_pose_hrnet_manifest(32)


def manifest_lines(manifest):
    return [
        "{} {}".format(k, "x".join(str(d) for d in s) if s else "scalar")
        for k, s in manifest
    ]


if __name__ == "__main__":
    import math
    import sys

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    m = official_pose_hrnet_manifest(width)
    print("\n".join(manifest_lines(m)))
    trainable = sum(
        math.prod(s) for k, s in m
        if not k.endswith(("running_mean", "running_var", "num_batches_tracked"))
    )
    total = sum(math.prod(s) for k, s in m)
    print(f"# width={width} keys: {len(m)}  trainable: {trainable}  "
          f"total: {total}", file=sys.stderr)
