from .config import DataConfig, ExperimentConfig, git_head_hash, load_config, save_config
from .checkpoints import CheckpointManager
from .metrics_writer import MetricsWriter
from .profiling import StepTimer, annotate, check_finite, enable_nan_checks, trace

__all__ = [
    "DataConfig",
    "ExperimentConfig",
    "git_head_hash",
    "load_config",
    "save_config",
    "CheckpointManager",
    "MetricsWriter",
    "StepTimer",
    "annotate",
    "check_finite",
    "enable_nan_checks",
    "trace",
]
