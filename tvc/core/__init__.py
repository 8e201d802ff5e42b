from tvc.core.config import (
    Config,
    CodecConfig,
    DataConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    SamplingConfig,
    apply_overrides,
    config_from_dict,
    config_to_dict,
    load_config,
    save_config,
)

__all__ = [
    "Config",
    "CodecConfig",
    "DataConfig",
    "MeshConfig",
    "ModelConfig",
    "OptimConfig",
    "SamplingConfig",
    "apply_overrides",
    "config_from_dict",
    "config_to_dict",
    "load_config",
    "save_config",
]
