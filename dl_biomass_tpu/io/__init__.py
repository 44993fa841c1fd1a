from dl_biomass_tpu.io.device_data import DeviceDataset

__all__ = ["DeviceDataset"]
