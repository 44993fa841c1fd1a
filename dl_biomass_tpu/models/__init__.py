from dl_biomass_tpu.models.layers import MLP, MaskedBatchNorm, resolve_activation
from dl_biomass_tpu.models.pointnet2 import (
    GlobalSAModule,
    PointNet2Regressor,
    SAModule,
)

__all__ = [
    "MLP",
    "MaskedBatchNorm",
    "resolve_activation",
    "SAModule",
    "GlobalSAModule",
    "PointNet2Regressor",
]
