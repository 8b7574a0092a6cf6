from vis_tpu.models.llama4.config import Llama4Config, Llama4TextConfig, Llama4VisionConfig  # noqa: F401
