from deeplip_tpu.core.config import Config, load_config, load_audio_config, load_video_config, load_fusion_config
from deeplip_tpu.core.mesh import make_mesh, data_sharding, replicated_sharding

__all__ = [
    "Config",
    "load_config",
    "load_audio_config",
    "load_video_config",
    "load_fusion_config",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
]
