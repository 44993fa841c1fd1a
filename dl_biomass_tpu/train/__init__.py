from dl_biomass_tpu.train.loss import COMPONENT_WEIGHTS, weighted_component_mse
from dl_biomass_tpu.train.trainer import TrainState, Trainer, make_optimizer

__all__ = [
    "COMPONENT_WEIGHTS",
    "weighted_component_mse",
    "TrainState",
    "Trainer",
    "make_optimizer",
]
