"""Loss functions for the DIP and SRGAN engines.

Parity map:
  mse                     <- torch.nn.MSELoss          (DIP.py:26)
  bce_with_logits         <- torch.nn.BCELoss on sigmoid outputs
                             (train_GAN.py:26; same math, stable form)
  adversarial_loss        <- utils/GAN.py:96-98
  discriminator_loss      <- utils/GAN.py:101-105
  perceptual_loss         <- utils/GAN.py:108-123 (VGG content + adversarial)

The content term uses VGG19 phi_{5,4} features when weights are available
(tpusr/models/vgg19.py), else pixel MSE — the engines surface which one ran.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from tpusr.models.vgg19 import vgg19_features, vgg_preprocess


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy, computed from logits (stable log-sigmoid)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_not_p)


def adversarial_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """BCE(fake, ones) — generator wants D to call its output real."""
    return bce_with_logits(fake_logits, jnp.ones_like(fake_logits))


def discriminator_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """BCE(real, 1) + BCE(fake, 0)."""
    return (
        bce_with_logits(real_logits, jnp.ones_like(real_logits))
        + bce_with_logits(fake_logits, jnp.zeros_like(fake_logits))
    )


def make_content_loss(vgg_params: dict[str, Any] | None) -> Callable:
    """VGG19 phi_{5,4} feature MSE when weights exist, else pixel MSE.

    Mirrors Vgg19Loss.forward (utils/GAN.py:80-92): both inputs go through
    the ImageNet eval preprocess, then MSE of the conv5_4 activations.
    """
    if vgg_params is None:
        return mse

    def vgg_content(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fp = vgg19_features(vgg_params, vgg_preprocess(pred))
        ft = vgg19_features(vgg_params, vgg_preprocess(target))
        return mse(fp, ft)

    return vgg_content


def perceptual_loss(
    content_loss: Callable,
    fake_images: jnp.ndarray,
    hr_images: jnp.ndarray,
    fake_logits: jnp.ndarray,
    adv_weight: float = 1.0,
) -> jnp.ndarray:
    """content + adv_weight * adversarial (utils/GAN.py:113-123).

    The reference sums the terms unweighted (adv_weight=1.0, the default) —
    but ALSO detaches the adversarial input (train_GAN.py:58), so its G
    receives no adversarial gradient at all. With the detach fixed, weight
    1.0 lets BCE (O(1-10)) swamp patch MSE (O(0.01)); ``--adv_weight 1e-3``
    (the SRGAN paper's coefficient, Ledig et al. 2017 eq. 3) is the opt-in
    extension for a usefully-weighted adversarial term."""
    return (content_loss(fake_images, hr_images)
            + adv_weight * adversarial_loss(fake_logits))
