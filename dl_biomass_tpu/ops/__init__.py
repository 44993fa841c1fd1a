from dl_biomass_tpu.ops.fps import farthest_point_sample
from dl_biomass_tpu.ops.ballquery import ball_query
from dl_biomass_tpu.ops.grouping import gather_points, group_neighborhoods
from dl_biomass_tpu.ops.pooling import masked_max, masked_mean

__all__ = [
    "farthest_point_sample",
    "ball_query",
    "gather_points",
    "group_neighborhoods",
    "masked_max",
    "masked_mean",
    # Pallas kernel entry points (imported lazily by their users; listed here
    # for discoverability):
    #   ops.pallas_fps.fps_pallas
    #   ops.pallas_group.ball_group_pallas
    #   ops.pallas_mxu_gather.mxu_gather
    #   ops.pallas_ballquery.ball_query_pallas
    #   ops.pallas_sa_train.fused_sa_mlp
]
