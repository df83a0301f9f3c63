"""Neural backends: HRNet + YOLOv3 in JAX, converters, training,
checkpointing."""
from tpupose.models.hrnet import (
    HRNetConfig,
    hrnet_apply,
    hrnet_init,
    hrnet_w32_config,
    hrnet_w48_config,
    normalize_image,
)
from tpupose.models.layers import cast_params, fold_batchnorm
from tpupose.models.quantize import (
    calibrate,
    quantize_convs,
    quantize_hrnet,
    quantize_yolo,
)
from tpupose.models.yolov3 import (
    YoloConfig,
    decode_detections,
    detect_people,
    yolov3_apply,
    yolov3_init,
)

__all__ = [
    "HRNetConfig",
    "hrnet_apply",
    "hrnet_init",
    "hrnet_w32_config",
    "hrnet_w48_config",
    "normalize_image",
    "cast_params",
    "fold_batchnorm",
    "calibrate",
    "quantize_convs",
    "quantize_hrnet",
    "quantize_yolo",
    "YoloConfig",
    "decode_detections",
    "detect_people",
    "yolov3_apply",
    "yolov3_init",
]
