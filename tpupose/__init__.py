"""tpupose — TPU-native multi-view multi-human 3D pose estimation and tracking.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
B10532021/Part-Aware_Measurement_for_3D_Pose_Estimation_and_Tracking
(Chu et al., "Part-Aware Measurement for Robust Multi-View Multi-Human 3D Pose
Estimation and Tracking", CVPR 2021 B-AMFG Workshop).

Layers (bottom-up):
  geometry/  camera pytrees, projection, epipolar geometry, DLT triangulation
  ops/       jittable numerical kernels (LAP assignment, temporal smoothing, NMS, heatmap decode)
  models/    YOLOv3 + HRNet-W48 in JAX, weight converters
  tracking/  fixed-capacity functional multi-view tracker (jit/scan-able) + numpy oracle
  parallel/  device mesh, sharding plans, multi-stream throughput mode
  pipeline/  detect -> pose -> track facade
  eval/      PCP / Panoptic AP scorers, joint-order transforms, result writers
  data/      config loading, dataset manifests, synthetic scene generator
  cli/       testmodel / evalmodel entry points (same YAML schema as the reference)
"""

__version__ = "0.1.0"
