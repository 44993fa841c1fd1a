from dl_biomass_tpu.ops.fps import farthest_point_sample
from dl_biomass_tpu.ops.ballquery import ball_query
from dl_biomass_tpu.ops.grouping import gather_points, group_neighborhoods
from dl_biomass_tpu.ops.pooling import masked_max

__all__ = [
    "farthest_point_sample",
    "ball_query",
    "gather_points",
    "group_neighborhoods",
    "masked_max",
]
