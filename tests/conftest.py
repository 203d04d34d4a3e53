"""Test env: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere — pytest imports conftest first.
"""

import os
import sys

# the image pins JAX_PLATFORMS=axon (real TPU) and its sitecustomize sets
# the jax_platforms config directly, so an env override is not enough —
# tests must run on the virtual CPU mesh, so force the config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference PyTorch modules (read-only) for golden tests.

    Stubs out pip packages the reference imports but this image lacks
    (lpips, ema_pytorch). Skips if /root/reference is absent.
    """
    if not has_reference():
        pytest.skip("reference repo not available")
    import types
    import torch

    if "lpips" not in sys.modules:
        lpips_stub = types.ModuleType("lpips")

        class _LPIPS:
            def __init__(self, *a, **k):
                raise RuntimeError("lpips stub: not available in tests")

        lpips_stub.LPIPS = _LPIPS
        sys.modules["lpips"] = lpips_stub
    if "ema_pytorch" not in sys.modules:
        ema_stub = types.ModuleType("ema_pytorch")
        ema_stub.EMA = object
        sys.modules["ema_pytorch"] = ema_stub

    return _import_reference_variant("epsilonparam")


def _import_reference_variant(variant: str):
    """Import one reference variant's `modules` package under a unique
    name (both variants ship a top-level `modules/`)."""
    import types
    import torch

    # drop any previously imported `modules` tree
    for k in [k for k in sys.modules if k == "modules" or k.startswith("modules.")]:
        del sys.modules[k]
    sys.path.insert(0, os.path.join(REFERENCE, variant))
    try:
        from modules import utils as ref_utils  # noqa
        from modules import network_components as ref_nc  # noqa
        from modules import compress_modules as ref_cm  # noqa
        from modules import unet as ref_unet  # noqa
        from modules import denoising_diffusion as ref_dd  # noqa
    finally:
        sys.path.pop(0)
    ns = types.SimpleNamespace(
        utils=ref_utils, nc=ref_nc, cm=ref_cm, unet=ref_unet, dd=ref_dd, torch=torch
    )
    for k in [k for k in sys.modules if k == "modules" or k.startswith("modules.")]:
        del sys.modules[k]
    return ns


@pytest.fixture(scope="function")
def reference_modules_x():
    """The x-variant reference modules (function-scoped: cannot coexist
    with the ε import in sys.modules)."""
    if not has_reference():
        pytest.skip("reference repo not available")
    import types
    import torch

    if "lpips" not in sys.modules:
        lpips_stub = types.ModuleType("lpips")
        lpips_stub.LPIPS = object
        sys.modules["lpips"] = lpips_stub
    if "ema_pytorch" not in sys.modules:
        ema_stub = types.ModuleType("ema_pytorch")
        ema_stub.EMA = object
        sys.modules["ema_pytorch"] = ema_stub
    return _import_reference_variant("xparam")
