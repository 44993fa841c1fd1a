from dl_biomass_tpu.core.cloud import CloudBatch, pad_points_axis, round_up
from dl_biomass_tpu.core.config import HyperParams, TrainConfig

__all__ = ["CloudBatch", "pad_points_axis", "round_up", "HyperParams", "TrainConfig"]
