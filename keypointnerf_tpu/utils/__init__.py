from .config import DataConfig, ExperimentConfig, git_head_hash, load_config, save_config
from .checkpoints import CheckpointManager
from .metrics_writer import MetricsWriter

__all__ = [
    "DataConfig",
    "ExperimentConfig",
    "git_head_hash",
    "load_config",
    "save_config",
    "CheckpointManager",
    "MetricsWriter",
]
