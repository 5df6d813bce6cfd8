"""Checkpointing: orbax-backed native checkpoints + torch .pth interop.

Reference behavior being matched:
  * ``save_model`` writes a state_dict .pth after each GAN phase
    (utils/common.py:11-18, train_GAN.py:186-188,205).
  * ``load_model`` reads a .pth, stripping DDP 'module.' prefixes
    (utils/common.py:46-60, eval_GAN.py:85).
  * Optimizer state is never saved in the reference; our native checkpoints
    DO carry {params, batch_stats, opt_state, step} so training is
    crash-resumable (SURVEY.md §5 checkpoint/resume).

.pth interop keeps the reference's tensor naming so checkpoints flow both
ways: a torch-trained SRGAN generator evaluates under tpusr, and a
tpusr-trained generator exports to a .pth loadable by the reference.
"""

from __future__ import annotations

import os
import re
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Native checkpoints (orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    restored = ckptr.restore(path, target=target)
    # Cast leaves to the target's dtypes: checkpoints written before the
    # d_moments='bf16' default (round 4) carry f32 Adam moments; resuming
    # them into a bf16-moment state (or vice versa with --d_moments f32)
    # must not poison the jitted train step with a surprise dtype tree.
    import jax

    def cast(r, t):
        return r.astype(t.dtype) if hasattr(t, "dtype") and r.dtype != t.dtype else r

    return jax.tree_util.tree_map(cast, restored, target)


# ---------------------------------------------------------------------------
# torch .pth interop
# ---------------------------------------------------------------------------

def _strip_ddp(sd: dict) -> dict:
    """'module.' prefix strip — load_model parity (utils/common.py:50-56)."""
    pattern = re.compile(r"^module\.")
    return {pattern.sub("", k): v for k, v in sd.items()}


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v) for k, v in _strip_ddp(sd).items()}


def disc_feature_hw(n: int) -> int:
    """Spatial size of the discriminator's final feature map for input n.

    Stem is stride 1; the four stride-2 k3 pad-1 convs each map
    n -> floor((n-1)/2)+1 = ceil(n/2). NOT n//16 — for n=200 the pyramid is
    200->100->50->25->13.
    """
    for _ in range(4):
        n = (n + 1) // 2
    return n


def _conv_in(sd, key):
    return {
        "kernel": jnp.asarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(sd[f"{key}.bias"]),
    }


def _bn_in(sd, key):
    params = {"scale": jnp.asarray(sd[f"{key}.weight"]),
              "bias": jnp.asarray(sd[f"{key}.bias"])}
    stats = {"mean": jnp.asarray(sd[f"{key}.running_mean"]),
             "var": jnp.asarray(sd[f"{key}.running_var"])}
    return params, stats


def infer_generator_arch(tree: dict) -> tuple[int, int]:
    """(residual_blocks_count, n_shuffles) from a generator checkpoint.

    Accepts either a reference torch state_dict (keys
    ``residual_blocks.{i}.*`` / ``pixel_shuffle_blocks.{i}.*``,
    models/GAN/generator.py) or a tpusr params tree (``res{i}`` / ``ps{i}``).
    The reference hard-codes 16 blocks and derives shuffles from the factor;
    our CLIs expose both as flags, so eval must adapt to what the checkpoint
    actually contains instead of KeyError-ing on a mismatch.
    """
    keys = list(tree.keys())
    if any(k.startswith("residual_blocks.") or k == "conv1.weight"
           for k in keys):  # torch state_dict
        rb = {int(k.split(".")[1]) for k in keys
              if k.startswith("residual_blocks.")}
        ps = {int(k.split(".")[1]) for k in keys
              if k.startswith("pixel_shuffle_blocks.")}
    else:  # tpusr params / orbax tree
        rb = {int(k[3:]) for k in keys if k.startswith("res") and k[3:].isdigit()}
        ps = {int(k[2:]) for k in keys if k.startswith("ps") and k[2:].isdigit()}
    if not rb or not ps:
        raise ValueError(
            f"not a generator checkpoint (no residual/shuffle blocks found "
            f"among {sorted(keys)[:8]}...)")
    return max(rb) + 1, max(ps) + 1


def import_torch_generator(sd: dict, residual_blocks_count: int = 16,
                           n_shuffles: int = 3):
    """Reference Generator state_dict -> (params, batch_stats).

    Key layout per models/GAN/generator.py: conv1, prelu1,
    residual_blocks.{i}.{conv1,bn1,prelu1,conv2,bn2}, conv2, bn1,
    pixel_shuffle_blocks.{i}.{conv1,prelu1}, conv3.
    """
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    params["conv1"] = _conv_in(sd, "conv1")
    params["prelu1"] = {"alpha": jnp.asarray(sd["prelu1.weight"])}

    for i in range(residual_blocks_count):
        base = f"residual_blocks.{i}"
        bn1_p, bn1_s = _bn_in(sd, f"{base}.bn1")
        bn2_p, bn2_s = _bn_in(sd, f"{base}.bn2")
        params[f"res{i}"] = {
            "conv1": _conv_in(sd, f"{base}.conv1"),
            "bn1": bn1_p,
            "prelu1": {"alpha": jnp.asarray(sd[f"{base}.prelu1.weight"])},
            "conv2": _conv_in(sd, f"{base}.conv2"),
            "bn2": bn2_p,
        }
        stats[f"res{i}"] = {"bn1": bn1_s, "bn2": bn2_s}

    params["conv2"] = _conv_in(sd, "conv2")
    bn_p, bn_s = _bn_in(sd, "bn1")
    params["bn1"] = bn_p
    stats["bn1"] = bn_s

    for i in range(n_shuffles):
        base = f"pixel_shuffle_blocks.{i}"
        params[f"ps{i}"] = {
            "conv1": _conv_in(sd, f"{base}.conv1"),
            "prelu1": {"alpha": jnp.asarray(sd[f"{base}.prelu1.weight"])},
        }

    params["conv3"] = _conv_in(sd, "conv3")
    return params, stats


def import_torch_discriminator(sd: dict, hr_patch: int = 192):
    """Reference Discriminator state_dict -> (params, batch_stats).

    dense1's input ordering differs: torch flattens NCHW (C-major), we
    flatten NHWC — the weight rows are permuted accordingly
    (discriminator.py:54 vs srgan.py Discriminator).
    """
    params: dict[str, Any] = {"conv": _conv_in(sd, "conv")}
    stats: dict[str, Any] = {}
    for i in range(7):
        base = f"convblocks.{i}"
        bn_p, bn_s = _bn_in(sd, f"{base}.bn1")
        params[f"block{i}_conv"] = _conv_in(sd, f"{base}.conv1")
        params[f"block{i}_bn"] = bn_p
        stats[f"block{i}_bn"] = bn_s

    h = w = disc_feature_hw(hr_patch)
    c = 512
    w1 = sd["dense1.weight"]  # (1024, C*H*W) in C,H,W order
    w1 = w1.reshape(1024, c, h, w).transpose(0, 2, 3, 1).reshape(1024, h * w * c)
    params["dense1"] = {
        "Dense_0": {"kernel": jnp.asarray(w1.T), "bias": jnp.asarray(sd["dense1.bias"])}
    }
    params["dense2"] = {
        "Dense_0": {"kernel": jnp.asarray(sd["dense2.weight"].T),
                    "bias": jnp.asarray(sd["dense2.bias"])}
    }
    return params, stats


def _conv_out(tree) -> dict:
    return {
        "weight": np.asarray(tree["kernel"]).transpose(3, 2, 0, 1),
        "bias": np.asarray(tree["bias"]),
    }


def _tree_f32(tree):
    """Cast all leaves to f32 numpy (torch.from_numpy rejects ml_dtypes
    bfloat16 — d_params='bf16' states export at full precision)."""
    return jax.tree_util.tree_map(
        lambda p: np.asarray(p).astype(np.float32), tree)


def _put_conv(sd: dict, tkey: str, tree) -> None:
    c = _conv_out(tree)
    sd[f"{tkey}.weight"] = c["weight"]
    sd[f"{tkey}.bias"] = c["bias"]


def _put_bn(sd: dict, tkey: str, p, s) -> None:
    sd[f"{tkey}.weight"] = np.asarray(p["scale"])
    sd[f"{tkey}.bias"] = np.asarray(p["bias"])
    sd[f"{tkey}.running_mean"] = np.asarray(s["mean"])
    sd[f"{tkey}.running_var"] = np.asarray(s["var"])
    sd[f"{tkey}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def export_torch_generator(params: dict, stats: dict,
                           residual_blocks_count: int = 16,
                           n_shuffles: int = 3) -> dict:
    """(params, batch_stats) -> reference-named numpy state_dict.

    Pass through ``torch.save({k: torch.from_numpy(v), ...})`` for a .pth the
    reference's load_model accepts.
    """
    params, stats = _tree_f32(params), _tree_f32(stats)
    sd: dict[str, np.ndarray] = {}
    _put_conv(sd, "conv1", params["conv1"])
    sd["prelu1.weight"] = np.asarray(params["prelu1"]["alpha"])
    for i in range(residual_blocks_count):
        base = f"residual_blocks.{i}"
        _put_conv(sd, f"{base}.conv1", params[f"res{i}"]["conv1"])
        _put_bn(sd, f"{base}.bn1", params[f"res{i}"]["bn1"], stats[f"res{i}"]["bn1"])
        sd[f"{base}.prelu1.weight"] = np.asarray(params[f"res{i}"]["prelu1"]["alpha"])
        _put_conv(sd, f"{base}.conv2", params[f"res{i}"]["conv2"])
        _put_bn(sd, f"{base}.bn2", params[f"res{i}"]["bn2"], stats[f"res{i}"]["bn2"])
    _put_conv(sd, "conv2", params["conv2"])
    _put_bn(sd, "bn1", params["bn1"], stats["bn1"])
    for i in range(n_shuffles):
        base = f"pixel_shuffle_blocks.{i}"
        _put_conv(sd, f"{base}.conv1", params[f"ps{i}"]["conv1"])
        sd[f"{base}.prelu1.weight"] = np.asarray(params[f"ps{i}"]["prelu1"]["alpha"])
    _put_conv(sd, "conv3", params["conv3"])
    return sd


def export_torch_discriminator(params: dict, stats: dict, hr_patch: int = 192) -> dict:
    """(params, batch_stats) -> reference-named Discriminator state_dict.

    Inverse of import_torch_discriminator, including the NHWC->NCHW dense1
    row permutation. Parity target: save_model(pre_trained_D, ...) at
    train_GAN.py:188.
    """
    params, stats = _tree_f32(params), _tree_f32(stats)
    sd: dict[str, np.ndarray] = {}
    _put_conv(sd, "conv", params["conv"])
    for i in range(7):
        _put_conv(sd, f"convblocks.{i}.conv1", params[f"block{i}_conv"])
        _put_bn(sd, f"convblocks.{i}.bn1", params[f"block{i}_bn"],
                stats[f"block{i}_bn"])

    h = w = disc_feature_hw(hr_patch)
    c = 512
    k1 = np.asarray(params["dense1"]["Dense_0"]["kernel"])  # (H*W*C, 1024)
    w1 = k1.T.reshape(1024, h, w, c).transpose(0, 3, 1, 2).reshape(1024, c * h * w)
    sd["dense1.weight"] = w1
    sd["dense1.bias"] = np.asarray(params["dense1"]["Dense_0"]["bias"])
    sd["dense2.weight"] = np.asarray(params["dense2"]["Dense_0"]["kernel"]).T
    sd["dense2.bias"] = np.asarray(params["dense2"]["Dense_0"]["bias"])
    return sd


def save_torch_pth(sd: dict, path: str) -> None:
    import torch

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
    print(f"Model saved to {path}")
