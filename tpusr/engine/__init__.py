from tpusr.engine.metrics import psnr, ssim
from tpusr.engine.dip import DIPConfig, dip_superresolve
from tpusr.engine.gan import GANTrainConfig, GANTrainState, create_gan_state, gan_train_step

__all__ = [
    "psnr",
    "ssim",
    "DIPConfig",
    "dip_superresolve",
    "GANTrainConfig",
    "GANTrainState",
    "create_gan_state",
    "gan_train_step",
]
