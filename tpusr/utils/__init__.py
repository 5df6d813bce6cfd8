from tpusr.utils.convert import chw_to_hwc, hwc_to_chw, np_to_device, device_to_np

__all__ = ["chw_to_hwc", "hwc_to_chw", "np_to_device", "device_to_np"]
