from vis_tpu.models.qwen2_5_vl.config import Qwen25VisionConfig, Qwen25VLConfig
from vis_tpu.models.qwen2_5_vl.model import convert_hf_state_dict, init_params
from vis_tpu.models.qwen2_5_vl.vision import (
    WindowLayout,
    init_vision_params,
    vision_forward_25,
    window_layout,
)

__all__ = [
    "Qwen25VisionConfig",
    "Qwen25VLConfig",
    "convert_hf_state_dict",
    "init_params",
    "init_vision_params",
    "vision_forward_25",
    "window_layout",
    "WindowLayout",
]
