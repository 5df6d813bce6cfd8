"""tpusr — TPU-native single-image super-resolution framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of the
reference repo LewisClifton/Deep-Super-Resolution (PyTorch):

  * DIP  — Deep Image Prior per-image optimization            (ref: DIP.py)
  * SRGAN — generator/discriminator training + evaluation     (ref: train_GAN.py, eval_GAN.py)
  * DIV2K degradation data pipeline                            (ref: dataset.py)
  * Lanczos/Gauss/Box antialiased downsampling                 (ref: utils/downsampler.py)
  * PSNR / SSIM / LPIPS metrics                                (ref: torchmetrics imports)

Design stance (TPU-first, not a port):
  - NHWC layout everywhere on device (TPU conv-native); NCHW only at the
    PNG / .pth interop boundary.
  - Models are pure functions over parameter pytrees (flax.linen).
  - The DIP inner loop is a single jitted ``lax.scan`` — thousands of Adam
    iterations never leave the chip.
  - Scaling is expressed with ``jax.sharding.Mesh`` + ``shard_map``:
    data-parallel GAN training, vmap-batched DIP, and spatial halo-sharded
    full-image inference.
"""

__version__ = "0.1.0"
