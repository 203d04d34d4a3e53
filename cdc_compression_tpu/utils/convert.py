"""PyTorch reference checkpoint → cdc_compression_tpu parameter trees.

Maps the reference state_dict naming (`epsilonparam`/`xparam` modules) to
our flax param trees, transposing NCHW conv weights (O,I,kH,kW) to HWIO
and ConvTranspose weights (I,O,kH,kW) to (kH,kW,I,O). This is the
keystone for bit-matching released checkpoints (README.md:14 of the
reference) without copying any reference code.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O,I,kH,kW) -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I,O,kH,kW) -> (kH,kW,I,O)."""
    return np.transpose(w, (2, 3, 0, 1))


def _dense_w(w: np.ndarray) -> np.ndarray:
    """torch Linear (out,in) -> (in,out)."""
    return np.transpose(w, (1, 0))


class _SD:
    """state_dict view with prefix navigation + consumption tracking."""

    def __init__(self, sd: Mapping[str, np.ndarray], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.used = set() if prefix == "" else None

    def sub(self, p: str) -> "_SD":
        child = _SD(self.sd, self.prefix + p + ".")
        child.used = self.used if self.used is not None else None
        return child

    def __call__(self, name: str) -> np.ndarray:
        key = self.prefix + name
        if self.used is not None:
            self.used.add(key)
        t = self.sd[key]
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def has(self, name: str) -> bool:
        return (self.prefix + name) in self.sd


def convert_block(sd: _SD) -> Dict[str, Any]:
    """reference Block: block.0 conv, block.1 LayerNorm."""
    return {
        "conv": {"kernel": _conv_w(sd("block.0.weight")), "bias": sd("block.0.bias")},
        "norm": {"g": sd("block.1.g").ravel(), "b": sd("block.1.b").ravel()},
    }


def convert_resnet_block(sd: _SD, has_time: bool, has_res_conv: bool) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "block1": convert_block(sd.sub("block1")),
        "block2": convert_block(sd.sub("block2")),
    }
    if has_time:
        out["time_mlp"] = {"kernel": _dense_w(sd("mlp.1.weight")), "bias": sd("mlp.1.bias")}
    if has_res_conv:
        out["res_conv"] = {"kernel": _conv_w(sd("res_conv.weight")), "bias": sd("res_conv.bias")}
    return out


def convert_attention(sd: _SD) -> Dict[str, Any]:
    """reference Residual(PreNorm(LinearAttention)) -> PreNormLinearAttention."""
    inner = sd.sub("fn")  # PreNorm
    attn = inner.sub("fn")  # LinearAttention
    return {
        "norm": {"g": inner("norm.g").ravel(), "b": inner("norm.b").ravel()},
        "attn": {
            "to_qkv": {"kernel": _conv_w(attn("to_qkv.weight"))},
            "to_out": {"kernel": _conv_w(attn("to_out.weight")), "bias": attn("to_out.bias")},
        },
    }


def convert_prior(sd: _SD, chain_len: int = 4) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(chain_len):
        w = sd(f"affine.{i}.weight")  # (C,1,1,in,out)
        b = sd(f"affine.{i}.bias")  # (C,1,1,1,out)
        out[f"affine_{i}_w"] = w[:, 0, 0]
        out[f"affine_{i}_b"] = b[:, 0, 0, 0]
        if i < chain_len - 1:
            out[f"gate_{i}_a"] = sd(f"a.{i}")[:, 0, 0, 0]
    out["medians"] = sd("_medians").ravel()
    return out


def convert_compressor(sd: _SD, n_enc: int = None, n_hyper: int = None) -> Dict[str, Any]:
    """reference Resnet/Big Compressor state_dict -> our param tree.

    Stage counts are auto-detected from the state_dict when not given."""
    if n_enc is None:
        n_enc = 0
        while sd.has(f"enc.{n_enc}.0.block1.block.0.weight"):
            n_enc += 1
    if n_hyper is None:
        n_hyper = 0
        while sd.has(f"hyper_enc.{n_hyper}.0.weight"):
            n_hyper += 1
    out: Dict[str, Any] = {"prior": convert_prior(sd.sub("prior"))}
    for i in range(n_enc):
        # enc.{i}.0 ResnetBlock, enc.{i}.2 (x-variant: enc.{i}.1) Downsample
        res_pfx = f"enc.{i}.0"
        down_idx = 2 if sd.has(f"enc.{i}.2.conv.weight") else 1
        out[f"enc_{i}_res"] = convert_resnet_block(
            sd.sub(res_pfx), has_time=False, has_res_conv=sd.has(res_pfx + ".res_conv.weight")
        )
        out[f"enc_{i}_down"] = {
            "conv": {
                "kernel": _conv_w(sd(f"enc.{i}.{down_idx}.conv.weight")),
                "bias": sd(f"enc.{i}.{down_idx}.conv.bias"),
            }
        }
    for i in range(n_enc):
        res_pfx = f"dec.{i}.0"
        up_idx = 2 if sd.has(f"dec.{i}.2.conv.weight") else 1
        out[f"dec_{i}_res"] = convert_resnet_block(
            sd.sub(res_pfx), has_time=False, has_res_conv=sd.has(res_pfx + ".res_conv.weight")
        )
        out[f"dec_{i}_up"] = {
            "conv": {
                "kernel": _convT_w(sd(f"dec.{i}.{up_idx}.conv.weight")),
                "bias": sd(f"dec.{i}.{up_idx}.conv.bias"),
            }
        }
    for i in range(n_hyper):
        out[f"hyper_enc_{i}"] = {
            "kernel": _conv_w(sd(f"hyper_enc.{i}.0.weight")),
            "bias": sd(f"hyper_enc.{i}.0.bias"),
        }
        w = sd(f"hyper_dec.{i}.0.weight")
        is_last = i == n_hyper - 1
        out[f"hyper_dec_{i}"] = {
            "kernel": _conv_w(w) if is_last else _convT_w(w),
            "bias": sd(f"hyper_dec.{i}.0.bias"),
        }
    return out


def convert_unet(sd: _SD, n_levels: int = 6, embd_type: str = "01") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if embd_type == "01":
        out["time_mlp"] = {
            "fc1": {"kernel": _dense_w(sd("time_mlp.0.weight")), "bias": sd("time_mlp.0.bias")},
            "fc2": {"kernel": _dense_w(sd("time_mlp.2.weight")), "bias": sd("time_mlp.2.bias")},
        }
    else:
        out["time_mlp"] = {
            "pos": {"weights": sd("time_mlp.0.weights")},
            "fc1": {"kernel": _dense_w(sd("time_mlp.1.weight")), "bias": sd("time_mlp.1.bias")},
            "fc2": {"kernel": _dense_w(sd("time_mlp.3.weight")), "bias": sd("time_mlp.3.bias")},
        }

    def res(pfx, has_time=True):
        return convert_resnet_block(
            sd.sub(pfx), has_time=has_time, has_res_conv=sd.has(pfx + ".res_conv.weight")
        )

    for i in range(n_levels):
        out[f"down_{i}_res1"] = res(f"downs.{i}.0")
        out[f"down_{i}_res2"] = res(f"downs.{i}.1")
        out[f"down_{i}_attn"] = convert_attention(sd.sub(f"downs.{i}.2"))
        if sd.has(f"downs.{i}.3.conv.weight"):
            out[f"down_{i}_downsample"] = {
                "conv": {
                    "kernel": _conv_w(sd(f"downs.{i}.3.conv.weight")),
                    "bias": sd(f"downs.{i}.3.conv.bias"),
                }
            }
    out["mid_block1"] = res("mid_block1")
    out["mid_attn"] = convert_attention(sd.sub("mid_attn"))
    out["mid_block2"] = res("mid_block2")
    for i in range(n_levels - 1):
        out[f"up_{i}_res1"] = res(f"ups.{i}.0")
        out[f"up_{i}_res2"] = res(f"ups.{i}.1")
        out[f"up_{i}_attn"] = convert_attention(sd.sub(f"ups.{i}.2"))
        out[f"up_{i}_upsample"] = {
            "conv": {
                "kernel": _convT_w(sd(f"ups.{i}.3.conv.weight")),
                "bias": sd(f"ups.{i}.3.conv.bias"),
            }
        }
    out["final_norm"] = {"g": sd("final_conv.0.g").ravel(), "b": sd("final_conv.0.b").ravel()}
    out["final_conv"] = {
        "kernel": _conv_w(sd("final_conv.1.weight")),
        "bias": sd("final_conv.1.bias"),
    }
    return out


def convert_diffusion_checkpoint(
    state_dict: Mapping[str, Any], n_levels: int = 6, n_enc: int = 4, embd_type: str = "01"
) -> Dict[str, Any]:
    """Full reference GaussianDiffusion state_dict -> {unet, compressor} trees.

    Accepts flat checkpoints (`{"model": sd}` from the ε-trainer) and EMA
    trees (keys prefixed `ema_model.`). Ignores schedule buffers and any
    `loss_fn_vgg.*` LPIPS weights baked into the checkpoint.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("ema_model."):
            k = k[len("ema_model."):]
        if k.startswith(("train_", "loss_fn_vgg.", "initted", "step")):
            continue
        sd[k] = v
    root = _SD(sd)
    unet = convert_unet(root.sub("denoise_fn"), n_levels=n_levels, embd_type=embd_type)
    comp = convert_compressor(root.sub("context_fn"), n_enc=n_enc)
    return {"unet": {"params": _to_jnp(unet)}, "compressor": {"params": _to_jnp(comp)}}


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(np.asarray(tree, dtype=np.float32))
