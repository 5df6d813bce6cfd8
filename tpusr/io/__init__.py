from tpusr.io.images import save_image
from tpusr.io.logs import save_log
from tpusr.io.checkpoint import load_checkpoint, save_checkpoint

__all__ = ["save_image", "save_log", "load_checkpoint", "save_checkpoint"]
