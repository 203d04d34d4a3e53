"""LPIPS perceptual distance in JAX (VGG16 backbone).

Behavioral spec: the `lpips==0.1.4` package the reference uses as its
aux loss (`denoising_diffusion.py:44-47`): inputs in [-1,1] are
channel-normalized by fixed shift/scale, passed through VGG16, features
at relu{1_2,2_2,3_3,4_3,5_3} are unit-normalized along channels,
squared-differenced, projected by learned non-negative 1x1 "lin" heads,
spatially averaged and summed over stages.

Weights: this image has no network egress and no lpips/torchvision
checkpoints, so weights must be converted offline via
`convert_lpips_weights` (torch state_dicts -> param tree) and passed in.
With random init the module is still a valid (untrained) perceptual-ish
distance usable for smoke tests; training runs that need the published
RD-perception tradeoff must load converted weights.

Offline weight-drop procedure (on any machine with torchvision + lpips):

    import torch, lpips, torchvision
    m = lpips.LPIPS(net="vgg")                       # downloads weights
    torch.save(torchvision.models.vgg16(weights="DEFAULT")
               .features.state_dict(), "vgg16_features.pt")
    torch.save({k: v for k, v in m.state_dict().items()
                if k.startswith("lin")}, "lpips_lin.pt")

copy both files here, then convert and checkpoint the tree once:

    vgg_sd = torch.load("vgg16_features.pt")
    lin_sd = torch.load("lpips_lin.pt")         # keys "lin{s}.model.1.weight"
    params = convert_lpips_weights(vgg_sd, lin_sd)
    orbax.checkpoint.StandardCheckpointer().save(path, params)

and pass `make_perceptual_fn(params)` into the engine. Numerical parity
of this module + converter against the torch math is golden-tested with
a synthetic state_dict in
`tests/test_training.py::TestLPIPS::test_golden_vs_torch_math`.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 feature-extractor plan: conv channels per stage
_VGG_PLAN = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv tower returning the 5 LPIPS feature stages (NHWC)."""

    @nn.compact
    def __call__(self, x):
        feats = []
        for s, widths in enumerate(_VGG_PLAN):
            for i, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding=1, name=f"conv{s}_{i}")(x)
                x = nn.relu(x)
            feats.append(x)
            if s < len(_VGG_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg') equivalent; returns per-sample distance."""

    @nn.compact
    def __call__(self, a, b):
        """a, b: NHWC in [-1, 1] -> (B,) distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(name="vgg")
        fa = vgg((a - shift) / scale)
        fb = vgg((b - shift) / scale)
        total = 0.0
        for s, (xa, xb) in enumerate(zip(fa, fb)):
            # exact lpips-0.1.4 normalize_tensor semantics: the eps is
            # added to the norm, not under the sqrt
            na = xa / (jnp.sqrt(jnp.sum(xa * xa, -1, keepdims=True)) + 1e-10)
            nb = xb / (jnp.sqrt(jnp.sum(xb * xb, -1, keepdims=True)) + 1e-10)
            d = jnp.square(na - nb)
            w = self.param(f"lin{s}_w", nn.initializers.ones, (d.shape[-1],))
            # lpips lin heads are non-negative 1x1 convs
            proj = jnp.sum(d * jnp.maximum(w, 0.0), axis=-1)
            total = total + jnp.mean(proj, axis=(1, 2))
        return total


def make_perceptual_fn(params):
    """Bind LPIPS params into the (a, b) -> (B,) callable the diffusion
    engine's aux loss expects. Frozen: gradients are stopped, matching
    the reference's parameters() filter (`denoising_diffusion.py:73-76`)."""
    module = LPIPS()
    frozen = jax.lax.stop_gradient(params)

    def fn(a, b):
        return module.apply(frozen, a, b)

    return fn


def init_lpips_params(rng=0):
    m = LPIPS()
    key = jax.random.PRNGKey(rng) if isinstance(rng, int) else rng
    x = jnp.zeros((1, 64, 64, 3))
    return m.init(key, x, x)


def convert_lpips_weights(vgg_state: Dict[str, Any], lin_state: Dict[str, Any]):
    """(torchvision vgg16.features state_dict, lpips lin state_dict) ->
    LPIPS param tree.

    vgg keys: '{idx}.weight/bias' with idx over the Sequential incl.
    pools; lin keys: 'lin{s}.model.1.weight' (1,C,1,1)."""
    to_np = lambda t: t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    # Sequential indices of the conv layers in torchvision vgg16.features
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params: Dict[str, Any] = {"vgg": {}}
    flat = []
    for s, widths in enumerate(_VGG_PLAN):
        for i, _ in enumerate(widths):
            flat.append(f"conv{s}_{i}")
    for name, idx in zip(flat, conv_idx):
        w = to_np(vgg_state[f"{idx}.weight"])  # (O,I,3,3)
        b = to_np(vgg_state[f"{idx}.bias"])
        params["vgg"][name] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
    for s in range(5):
        w = to_np(lin_state[f"lin{s}.model.1.weight"]).reshape(-1)
        params[f"lin{s}_w"] = w
    return {"params": params}
