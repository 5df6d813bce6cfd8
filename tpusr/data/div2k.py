"""DIV2K dataset pipeline — pairing, resize rules, degradation, patches.

Capability parity with ``dataset.py`` (get_image_pair :9-62, DIV2KDataset
:69-95, GANDIV2KDataset :98-177) including its exact semantics:

  * HR `<name>.png` pairs with LR `<name>x8.png` (dataset.py:18).
  * BOTH images are mandatorily bicubic-shrunk by 2 ("images too big",
    dataset.py:21-23); optional extra /2 on the LR (:26-27).
  * HR is resized to exactly scale_factor x LR; if that would exceed the
    original HR in both dims, both are shrunk to the largest multiple
    (:29-46).
  * Optional Gaussian / salt-and-pepper noise on the LR (:52-56).
  * Output float32 [0,1] — but NHWC (TPU layout), not CHW.
  * GAN variant: LR stays [0,1], HR mapped to [-1,1] (:149-159); train mode
    yields aligned random patch pairs (:121-147).

Host/device split (TPU-first): PNG decode and the PIL-exact resizes run on
the host (byte-identical to the reference via Pillow itself); noise is drawn
with explicit numpy Generators seeded per (epoch, index) so runs are
reproducible and shardable. The fused on-device degradation path used by
batched DIP lives in tpusr/ops/degrade.py instead.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
from PIL import Image


@dataclasses.dataclass
class DatasetConfig:
    LR_dir: str
    HR_dir: str
    scale_factor: int
    downsample: bool = False
    noise_type: dict | None = None
    num_images: int = -1
    seed: int = 0


def _pil_shrink(img: Image.Image, factor: int = 2) -> Image.Image:
    """utils/degradation.py:19-20 parity (floor-div size, bicubic)."""
    return img.resize((img.width // factor, img.height // factor),
                      resample=Image.BICUBIC)


def _add_gaussian_noise(rng: np.random.Generator, image: np.ndarray, std: float) -> np.ndarray:
    out = np.clip(image + rng.normal(scale=std * 255, size=image.shape), 0, 255)
    return out.astype(np.uint8)


def _add_salt_pepper_noise(rng: np.random.Generator, image: np.ndarray, s: float, p: float) -> np.ndarray:
    salt = rng.random((image.shape[0], image.shape[1])) < s
    pepper = rng.random((image.shape[0], image.shape[1])) < p
    image = image.copy()
    image[salt] = 255
    image[pepper] = 0
    return image


def get_image_pair(config: DatasetConfig, hr_name: str, rng: np.random.Generator):
    """Load one (LR, HR, name) triple with the reference's exact rules.

    Returns float32 NHWC-single arrays (H, W, 3) in [0,1].

    The decode+resize chain runs through the native C++ loader when built
    (tpusr/native: libpng + Pillow's fixed-point bicubic, byte-identical to
    the PIL path below and GIL-free for thread-parallel prep); PIL otherwise.
    """
    from tpusr import native

    filename, _ = os.path.splitext(hr_name)
    hr_path = os.path.join(config.HR_dir, hr_name)
    lr_path = os.path.join(config.LR_dir, f"{filename}x8.png")

    if native.available():
        lr_np, hr_np = native.load_pair(hr_path, lr_path,
                                        config.scale_factor,
                                        config.downsample)
    else:
        hr = Image.open(hr_path).convert("RGB")
        lr = Image.open(lr_path).convert("RGB")

        lr = _pil_shrink(lr, 2)
        hr = _pil_shrink(hr, 2)
        if config.downsample:
            lr = _pil_shrink(lr, 2)

        w_lr, h_lr = lr.size
        w_hr = config.scale_factor * w_lr
        h_hr = config.scale_factor * h_lr

        if w_hr > hr.size[0] and h_hr > hr.size[1]:
            w_hr = (hr.size[0] // config.scale_factor) * config.scale_factor
            h_hr = (hr.size[1] // config.scale_factor) * config.scale_factor
            w_lr = w_hr // config.scale_factor
            h_lr = h_hr // config.scale_factor
            hr = hr.resize((w_hr, h_hr), Image.BICUBIC)
            lr = lr.resize((w_lr, h_lr), Image.BICUBIC)
        else:
            hr = hr.resize((w_hr, h_hr), Image.BICUBIC)

        lr_np = np.array(lr)
        hr_np = np.array(hr)

    if config.noise_type is not None:
        if config.noise_type["type"] == "SaltAndPepper":
            lr_np = _add_salt_pepper_noise(
                rng, lr_np, s=config.noise_type["s"], p=config.noise_type["p"])
        elif config.noise_type["type"] == "Gaussian":
            lr_np = _add_gaussian_noise(rng, lr_np, std=config.noise_type["std"])

    lr_f = lr_np.astype(np.float32) / 255.0
    hr_f = hr_np.astype(np.float32) / 255.0
    return lr_f, hr_f, filename


class DIV2KDataset:
    """dataset.py:69-95 parity; iterable of (LR, HR, name) NHWC floats."""

    def __init__(self, LR_dir, scale_factor, downsample=False, noise_type=None,
                 num_images=-1, HR_dir=None, seed=0):
        self.config = DatasetConfig(
            LR_dir=LR_dir, HR_dir=HR_dir, scale_factor=scale_factor,
            downsample=downsample, noise_type=noise_type,
            num_images=num_images, seed=seed)
        self.HR_images = sorted(os.listdir(HR_dir))
        if num_images > 0:
            self.HR_images = self.HR_images[:num_images]

    def __len__(self):
        return len(self.HR_images)

    def __getitem__(self, idx):
        rng = np.random.default_rng((self.config.seed, idx))
        return get_image_pair(self.config, self.HR_images[idx], rng)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class GANDIV2KDataset(DIV2KDataset):
    """dataset.py:98-177 parity: SRGAN scaling + aligned train patches."""

    def __init__(self, LR_dir, scale_factor, downsample=False, noise_type=None,
                 num_images=-1, HR_dir=None, LR_patch_size=None, train=False,
                 seed=0, legacy_scale=False):
        super().__init__(LR_dir, scale_factor, downsample, noise_type,
                         num_images, HR_dir, seed)
        self.LR_patch_size = LR_patch_size
        self.train = train
        self.legacy_scale = legacy_scale
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Re-seed patch sampling per epoch (the reference's global
        np.random draws a new crop every __getitem__; explicit here)."""
        self._epoch = epoch

    @staticmethod
    def scale_images(lr, hr, legacy_scale: bool = False):
        """LR stays [0,1], HR -> [-1,1] — the *intended* SRGAN scaling.

        The reference's scale_images (dataset.py:149-159) divides the
        ToTensor output — ALREADY in [0,1] — by 255 again, so its GAN
        actually trains on LR in [0, 1/255] and HR ~= -1 everywhere.
        Default here is the intended semantics; ``legacy_scale=True``
        reproduces the reference bug for parity runs (SURVEY §7 catalog).
        """
        if legacy_scale:
            return lr / 255.0, (hr / 255.0) * 2.0 - 1.0
        return lr, hr * 2.0 - 1.0

    def get_train_patches(self, lr, hr, rng):
        """Aligned random crop (dataset.py:121-147): LR center uniform in
        the valid range, HR patch = LR patch x factor."""
        lr_h, lr_w = lr.shape[0], lr.shape[1]
        pw, ph = self.LR_patch_size
        f = self.config.scale_factor
        cx = rng.integers(pw // 2, lr_w - pw // 2)
        cy = rng.integers(ph // 2, lr_h - ph // 2)
        left = int(cx - pw // 2)
        top = int(cy - ph // 2)
        lr_patch = lr[top:top + ph, left:left + pw]
        hr_patch = hr[top * f:(top + ph) * f, left * f:(left + pw) * f]
        return lr_patch, hr_patch

    def __getitem__(self, idx):
        rng = np.random.default_rng((self.config.seed, self._epoch, idx))
        lr, hr, name = get_image_pair(self.config, self.HR_images[idx], rng)
        lr, hr = self.scale_images(lr, hr, self.legacy_scale)
        if self.train:
            lr, hr = self.get_train_patches(lr, hr, rng)
        return lr, hr, name

    def base_pair(self, idx):
        """Full (uncropped, unscaled) [0,1] pair — feed for the on-device
        patch pipeline (engine/gan_epochs.py)."""
        rng = np.random.default_rng((self.config.seed, idx))
        return get_image_pair(self.config, self.HR_images[idx], rng)


def batch_iterator(dataset, batch_size: int, drop_last: bool = False,
                   pad_to_full: bool = False):
    """Minimal batching loader (reference DataLoader defaults: shuffle=False,
    drop_last=False; train_GAN.py:175). Yields stacked NHWC numpy batches.

    ``pad_to_full=True`` wraps the ragged final batch with items from the
    dataset start so every yielded batch has exactly ``batch_size`` rows —
    one jitted shape for any dataset length (a per-shape jit would otherwise
    pay a full recompile on the last batch). Same wrap-padding divergence as
    ``stack_dataset_for_device``; the reference's DIV2K default (N=800, B=8)
    divides evenly so the paths agree there.
    """
    n = len(dataset)
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        if drop_last and len(idxs) < batch_size:
            return
        if pad_to_full:
            idxs += [i % n for i in range(len(idxs), batch_size)]
        items = [dataset[i] for i in idxs]
        lr = np.stack([it[0] for it in items])
        hr = np.stack([it[1] for it in items])
        names = [it[2] for it in items]
        yield lr, hr, names
