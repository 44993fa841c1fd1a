from dl_biomass_tpu.utils.tboard import SummaryWriter

__all__ = ["SummaryWriter"]
