"""Helpers to import modules from the read-only reference tree.

Modules are loaded per-file (bypassing package __init__ chains that require
uninstalled deps); reference files using relative imports get a synthesized
parent package.  This keeps parity tests honest: the oracle is the ACTUAL
reference source at /root/reference, never a hand-retyped copy.
"""

import importlib.util
import sys
import types
from pathlib import Path

REF = Path("/root/reference")


def load_ref(name: str, relpath: str):
    """Load a single reference module that has no relative imports."""
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_ref_pkg(pkg_name: str, relpkg: str, modules):
    """Load reference modules that use relative imports by synthesizing a
    parent package (a sys.modules entry with __path__).

    Args:
      pkg_name: synthetic package name to register.
      relpkg: package directory relative to the reference root.
      modules: [(submodule_name, relpath)], loaded in order.
    """
    pkg = sys.modules.get(pkg_name)
    if pkg is None:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [str(REF / relpkg)]
        sys.modules[pkg_name] = pkg
    out = {}
    for mod_name, relpath in modules:
        full = f"{pkg_name}.{mod_name}"
        if full in sys.modules:
            out[mod_name] = sys.modules[full]
            continue
        spec = importlib.util.spec_from_file_location(full, REF / relpath)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, mod_name, mod)
        out[mod_name] = mod
    return pkg, out


def _tv_gaussian_blur(img, kernel_size, sigma):
    """Faithful torchvision.transforms.functional.gaussian_blur: separable
    conv with a normalized exp(-x^2/2s^2) kernel and reflect padding."""
    import torch
    import torch.nn.functional as F

    if isinstance(sigma, (list, tuple)):
        sigma = sigma[0]
    k = kernel_size[0] if isinstance(kernel_size, (list, tuple)) else kernel_size
    x = torch.linspace(-(k - 1) / 2.0, (k - 1) / 2.0, k)
    kern = torch.exp(-0.5 * (x / float(sigma)) ** 2)
    kern = (kern / kern.sum()).to(img.dtype)
    c = img.shape[-3]
    pad = k // 2
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    out = F.pad(img, [pad, pad, pad, pad], mode="reflect")
    out = F.conv2d(out, kern.view(1, 1, k, 1).expand(c, 1, k, 1), groups=c)
    out = F.conv2d(out, kern.view(1, 1, 1, k).expand(c, 1, 1, k), groups=c)
    return out[0] if squeeze else out


def stub_torchvision():
    """Register a minimal torchvision stub (src/utils/flow.py imports the
    unused dense-flow resize; event_image_converter.py needs a working
    gaussian_blur)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    fn = types.ModuleType("torchvision.transforms.functional")

    class _IM:
        BICUBIC = "bicubic"

    tr.InterpolationMode = _IM
    fn.resize = None
    fn.gaussian_blur = _tv_gaussian_blur
    tr.functional = fn
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = fn


def stub_pykeops():
    """Register a dense-torch pykeops stub: LazyTensor.argKmin / Kmin become
    materialized `topk(largest=False)` over the broadcast distance tensor.

    Matches KeOps semantics as used by src/losses/focus.py:129-163: the
    reduction axis (dim/axis=2) is removed and K appended last, results
    sorted by ascending distance.  Fine at test scale (the whole point of
    KeOps is avoiding this materialization at production scale)."""
    if "pykeops" in sys.modules:
        return

    class LazyTensor:
        def __init__(self, t):
            self.t = t

        @property
        def shape(self):
            return self.t.shape

        def __sub__(self, other):
            return LazyTensor(self.t - other.t)

        def __pow__(self, p):
            return LazyTensor(self.t ** p)

        def abs(self):
            return LazyTensor(self.t.abs())

        def sum(self, dim):
            return LazyTensor(self.t.sum(dim))

        def argKmin(self, K, dim):
            return self.t.topk(K, dim=dim, largest=False).indices.movedim(
                dim, -1)

        def Kmin(self, K, axis):
            return self.t.topk(K, dim=axis, largest=False).values.movedim(
                axis, -1)

    pk = types.ModuleType("pykeops")
    pkt = types.ModuleType("pykeops.torch")
    pkt.LazyTensor = LazyTensor
    pk.torch = pkt
    sys.modules["pykeops"] = pk
    sys.modules["pykeops.torch"] = pkt


def load_ref_focus_loss():
    """Load the ACTUAL src/losses/focus.py (FocusLoss.calc is the oracle for
    the paper's core contribution) with pykeops + torchvision stubbed."""
    stub_torchvision()
    stub_pykeops()

    root = sys.modules.get("ref_root")
    if root is None:
        root = types.ModuleType("ref_root")
        root.__path__ = [str(REF / "src")]
        sys.modules["ref_root"] = root

    if "ref_root.utils" not in sys.modules:
        ei = load_ref("ref_event_image_converter",
                      "src/utils/event_image_converter.py")
        loss = load_ref("ref_utils_loss", "src/utils/loss.py")
        utils_mod = types.ModuleType("ref_root.utils")
        utils_mod.EventImageConverter = ei.EventImageConverter
        utils_mod.calculate_focus_loss = loss.calculate_focus_loss
        utils_mod.calculate_smoothness_loss = loss.calculate_smoothness_loss
        sys.modules["ref_root.utils"] = utils_mod
        root.utils = utils_mod

    if "ref_root.losses" not in sys.modules:
        losses_pkg = types.ModuleType("ref_root.losses")
        losses_pkg.__path__ = [str(REF / "src/losses")]
        base = load_ref("ref_losses_base", "src/losses/base.py")
        losses_pkg.TrajectoryLossBase = base.TrajectoryLossBase
        sys.modules["ref_root.losses"] = losses_pkg
        root.losses = losses_pkg

    _, mods = load_ref_pkg("ref_root.losses", "src/losses", [
        ("focus", "src/losses/focus.py"),
    ])
    return mods["focus"].FocusLoss


def load_ref_metrics():
    """Load the actual src/utils/metrics.py + flow.py."""
    stub_torchvision()
    pkg, mods = load_ref_pkg("ref_utils_pkg", "src/utils", [
        ("trajectories", "src/utils/trajectories.py"),
        ("flow", "src/utils/flow.py"),
    ])
    pkg.calculate_flow_error = mods["flow"].calculate_flow_error
    _, mmods = load_ref_pkg("ref_utils_pkg", "src/utils", [
        ("metrics", "src/utils/metrics.py"),
    ])
    return mmods["metrics"], mods["flow"]


def stub_torchmetrics():
    """Minimal torchmetrics.Metric so src/modules/utils.py imports; the
    reference classes only use add_state + attribute accumulation."""
    if "torchmetrics" in sys.modules:
        return

    tm = types.ModuleType("torchmetrics")

    class Metric:
        def __init__(self, dist_sync_on_step=False):
            pass

        def add_state(self, name, default, dist_reduce_fx=None):
            setattr(self, name, default)

        def __call__(self, *args, **kwargs):
            self.update(*args, **kwargs)
            return self.compute()

    tm.Metric = Metric
    sys.modules["torchmetrics"] = tm


def load_ref_modules_utils():
    """Load the actual src/modules/utils.py (EPE_MULTI, FLOW_METRICS_MULTI,
    masked error fns) with torchmetrics stubbed."""
    stub_torchmetrics()
    return load_ref("ref_modules_utils", "src/modules/utils.py")


def load_ref_unet():
    """Load the actual reference UNet (src/models/unet/unet_model.py:6-48)."""
    _, mods = load_ref_pkg("ref_unet_pkg", "src/models/unet", [
        ("unet_parts", "src/models/unet/unet_parts.py"),
        ("unet_model", "src/models/unet/unet_model.py"),
    ])
    return mods["unet_model"].UNet
