from dl_biomass_tpu.native import pointops

__all__ = ["pointops"]
