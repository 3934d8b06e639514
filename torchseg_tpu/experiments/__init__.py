from .registry import (
    ExperimentConfig,
    EXPERIMENTS,
    get_experiment,
    build_model,
    build_loss_fn,
    build_preprocess,
)
