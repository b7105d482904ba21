"""Import harness for the reference torch code (golden parity tests).

The reference targets torch 1.11 / transformers 4.15 / timm 0.4 / fairscale;
this environment has torch 2.13 (CPU) and transformers 4.57 and lacks
timm/fairscale.  This module installs the minimal shims needed to *execute*
the unmodified reference implementation as a test oracle.  (We run the
reference code read-only as ground truth — nothing is copied from it.)
"""

from __future__ import annotations

import importlib.machinery
import sys
import types


def _mod(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def install():
    if "timm" in sys.modules and hasattr(sys.modules["timm"], "_madtp_shim"):
        return
    import torch
    import torch.nn as nn

    timm = _mod("timm")
    timm._madtp_shim = True
    tml = _mod("timm.models")
    tvt = _mod("timm.models.vision_transformer")
    treg = _mod("timm.models.registry")
    tlay = _mod("timm.models.layers")
    thel = _mod("timm.models.helpers")
    thub = _mod("timm.models.hub")

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768):
            super().__init__()
            self.img_size = (img_size, img_size)
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size, img_size // patch_size)
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()
            self.p = p

        def forward(self, x):
            return x  # eval-mode identity (tests run model.eval())

    tvt.PatchEmbed = PatchEmbed
    tvt._cfg = lambda **kw: kw
    treg.register_model = lambda f: f
    tlay.trunc_normal_ = lambda t, std=1.0: nn.init.trunc_normal_(t, std=std)
    tlay.DropPath = DropPath
    thel.named_apply = lambda *a, **k: None
    thel.adapt_input_conv = lambda *a, **k: None
    thub.download_cached_file = lambda *a, **k: None
    for name, mod in [
        ("timm", timm), ("timm.models", tml),
        ("timm.models.vision_transformer", tvt),
        ("timm.models.registry", treg), ("timm.models.layers", tlay),
        ("timm.models.helpers", thel), ("timm.models.hub", thub),
    ]:
        sys.modules[name] = mod

    fs = _mod("fairscale")
    fsn = _mod("fairscale.nn")
    fsc = _mod("fairscale.nn.checkpoint")
    fsca = _mod("fairscale.nn.checkpoint.checkpoint_activations")
    fsca.checkpoint_wrapper = lambda m, *a, **k: m
    for name, mod in [
        ("fairscale", fs), ("fairscale.nn", fsn),
        ("fairscale.nn.checkpoint", fsc),
        ("fairscale.nn.checkpoint.checkpoint_activations", fsca),
    ]:
        sys.modules[name] = mod

    # transformers >= 4.30 moved these helpers to pytorch_utils
    import transformers.modeling_utils as mu

    if not hasattr(mu, "apply_chunking_to_forward"):
        import transformers.pytorch_utils as pu

        mu.apply_chunking_to_forward = pu.apply_chunking_to_forward
        mu.find_pruneable_heads_and_indices = pu.find_pruneable_heads_and_indices
        mu.prune_linear_layer = pu.prune_linear_layer

    # torch 2.x removed the private 1.11 attention helper the reference's
    # clip/mock.py imports; reinstate its exact 1.11 semantics
    import typing

    import torch.nn.modules.activation as A

    for _n, _v in (("Optional", typing.Optional), ("Tuple", typing.Tuple)):
        if not hasattr(A, _n):
            setattr(A, _n, _v)

    import torch.nn.functional as F

    if not hasattr(F, "_scaled_dot_product_attention"):
        def _sdpa_111(q, k, v, attn_mask=None, dropout_p=0.0):
            import math as _math

            B, Nt, E = q.shape
            q = q / _math.sqrt(E)
            attn = torch.bmm(q, k.transpose(-2, -1))
            if attn_mask is not None:
                attn = attn + attn_mask
            attn = torch.softmax(attn, dim=-1)
            if dropout_p > 0.0:
                attn = torch.nn.functional.dropout(attn, p=dropout_p)
            return torch.bmm(attn, v), attn

        F._scaled_dot_product_attention = _sdpa_111

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def install_driver_shims():
    """Extra shims to import a reference DRIVER module (compress_*_dtp.py)
    rather than just its model modules: ``ruamel_yaml`` (pyyaml stands in),
    ``fvcore`` (FlopCountAnalysis reimplemented over
    ``torch.utils.flop_counter`` — both count matmul/conv MACs; torch
    reports mul+add so the shim halves it), and a stub ``data`` package
    (the driver imports the dataset factories at module top; they pull
    torchvision+cv2 which this env lacks and which the eval-function golden
    never calls)."""
    install()
    if "fvcore" in sys.modules and hasattr(sys.modules["fvcore"],
                                           "_madtp_shim"):
        return
    import yaml as _pyyaml

    ry = _mod("ruamel_yaml")
    ry.load = lambda s, Loader=None, **k: _pyyaml.safe_load(s)
    ry.dump = lambda obj, stream=None, **k: _pyyaml.safe_dump(obj, stream)
    ry.Loader = object
    sys.modules["ruamel_yaml"] = ry

    class FlopCountAnalysis:
        """fvcore-compatible facade: counts multiply-accumulates of the
        matmul/conv family ops, like fvcore's default handler set (fvcore
        reports MACs under the name 'flops'; torch.utils.flop_counter
        reports 2*MACs, hence the /2)."""

        def __init__(self, model, inputs):
            self._model, self._inputs = model, inputs

        def unsupported_ops_warnings(self, *a, **k):
            return self

        def uncalled_modules_warnings(self, *a, **k):
            return self

        def tracer_warnings(self, *a, **k):
            return self

        def total(self):
            import torch
            from torch.utils.flop_counter import FlopCounterMode

            fc = FlopCounterMode(display=False)
            with torch.no_grad(), fc:
                self._model(*self._inputs)
            return fc.get_total_flops() / 2

    fv = _mod("fvcore")
    fv._madtp_shim = True
    fvn = _mod("fvcore.nn")
    fvn.FlopCountAnalysis = FlopCountAnalysis
    fvn.flop_count_str = lambda *a, **k: ""
    fvn.flop_count_table = lambda *a, **k: ""
    sys.modules["fvcore"] = fv
    sys.modules["fvcore.nn"] = fvn

    if "data" not in sys.modules:
        def _unavailable(*a, **k):
            raise RuntimeError(
                "reference dataset factories are stubbed (torchvision/cv2 "
                "not in this env); the driver-surface golden feeds tensors "
                "directly")

        data = _mod("data")
        data.create_dataset = _unavailable
        data.create_sampler = _unavailable
        data.create_loader = _unavailable
        sys.modules["data"] = data
