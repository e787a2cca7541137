"""In-process loader for the reference torch model (test/benchmark oracle).

The reference snapshot at /root/reference is not importable as-is:
`models/__init__.py` imports a nonexistent module (SURVEY.md §2.9 defect #1)
and `liif.py`/`extractor.py` need `timm` (absent from this image).  This
module makes the IGEV-side reference model constructible anyway:

  * a minimal `timm` shim exposing `create_model('mobilenetv2_100',
    features_only=True)` with timm 0.4.x module layout (`conv_stem`, `bn1`,
    `act1`, `blocks[stage][block].{conv_pw,bn1,conv_dw,bn2,conv_pwl,bn3}`),
    so the reference `Feature` (extractor.py:327-362) builds and its
    state_dict keys match real timm-pretrained reference checkpoints;
  * fake `models` / `models.coreContinuous_IGEV` parent packages pointing
    into /root/reference so submodules import WITHOUT executing the broken
    `models/__init__.py`;
  * a `.cuda()` no-op patch (the reference hardcodes `.cuda()` inside
    liif.py:115/122; torch here is CPU-only).

Used by tests/test_full_parity.py and tools/convert_checkpoint.py.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

_REF_ROOT = "/root/reference"


# --------------------------------------------------------------------- #
# timm shim (mobilenetv2_100, timm 0.4.x layout)
# --------------------------------------------------------------------- #

def _build_timm_shim():
    import torch
    import torch.nn as nn

    class _InvertedResidual(nn.Module):
        def __init__(self, in_c, out_c, stride, exp=6):
            super().__init__()
            mid = in_c * exp
            self.conv_pw = nn.Conv2d(in_c, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(mid)
            self.act1 = nn.ReLU6(inplace=True)
            self.conv_dw = nn.Conv2d(mid, mid, 3, stride, 1, groups=mid, bias=False)
            self.bn2 = nn.BatchNorm2d(mid)
            self.act2 = nn.ReLU6(inplace=True)
            self.conv_pwl = nn.Conv2d(mid, out_c, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(out_c)
            self.has_residual = stride == 1 and in_c == out_c

        def forward(self, x):
            y = self.act1(self.bn1(self.conv_pw(x)))
            y = self.act2(self.bn2(self.conv_dw(y)))
            y = self.bn3(self.conv_pwl(y))
            return x + y if self.has_residual else y

    class _DepthwiseSeparable(nn.Module):
        """timm DepthwiseSeparableConv (stage 0: 32→16, no expansion)."""

        def __init__(self, in_c, out_c, stride):
            super().__init__()
            self.conv_dw = nn.Conv2d(in_c, in_c, 3, stride, 1, groups=in_c, bias=False)
            self.bn1 = nn.BatchNorm2d(in_c)
            self.act1 = nn.ReLU6(inplace=True)
            self.conv_pw = nn.Conv2d(in_c, out_c, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(out_c)

        def forward(self, x):
            return self.bn2(self.conv_pw(self.act1(self.bn1(self.conv_dw(x)))))

    # (expansion, out_channels, repeats, first_stride) — mobilenetv2_100
    stages = (
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    )

    class _MobileNetV2Features(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_stem = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(32)
            self.act1 = nn.ReLU6(inplace=True)
            blocks = []
            in_c = 32
            for exp, out_c, n, s in stages:
                stage = []
                for bi in range(n):
                    stride = s if bi == 0 else 1
                    if exp == 1:
                        stage.append(_DepthwiseSeparable(in_c, out_c, stride))
                    else:
                        stage.append(_InvertedResidual(in_c, out_c, stride, exp))
                    in_c = out_c
                blocks.append(nn.Sequential(*stage))
            self.blocks = nn.Sequential(*blocks)

    def create_model(name, pretrained=False, features_only=False, **kw):
        assert name == "mobilenetv2_100", name
        # pretrained weights are not downloadable here; weight state is
        # whatever the caller loads (conversion copies it either way)
        return _MobileNetV2Features()

    shim = types.ModuleType("timm")
    shim.create_model = create_model
    shim.__anystereo_shim__ = True
    return shim


# --------------------------------------------------------------------- #
# reference module loading
# --------------------------------------------------------------------- #

def load_reference_igev_modules(ref_root: str = _REF_ROOT):
    """Import the IGEV-side reference modules, bypassing the broken
    `models/__init__.py` (defect #1).  Returns the continuous_IGEVstereo
    module.  Idempotent."""
    import torch

    if "timm" not in sys.modules:
        sys.modules["timm"] = _build_timm_shim()
    # fake parent packages: __path__ points into the reference so normal
    # import machinery finds the submodules, but the broken __init__ never runs
    if "models" not in sys.modules or not getattr(
        sys.modules["models"], "__anystereo_fake__", False
    ):
        pkg = types.ModuleType("models")
        pkg.__path__ = [f"{ref_root}/models"]
        pkg.__anystereo_fake__ = True
        sys.modules["models"] = pkg
    # CPU-only torch: the reference hardcodes .cuda() in liif.py
    torch.Tensor.cuda = lambda self, *a, **kw: self
    torch.nn.Module.cuda = lambda self, *a, **kw: self

    import importlib

    return importlib.import_module(
        "models.coreContinuous_IGEV.continuous_IGEVstereo"
    )


def load_reference_raft_modules(ref_root: str = _REF_ROOT):
    """Import the RAFT-side reference model.  corePrune_RAFT/liif.py:5
    imports the nonexistent `models.coreContinuous_A2A4IGEV.submodule`
    (SURVEY.md defect #1) — alias it to the RAFT-side submodule, whose
    symbols are what the import actually needs."""
    import importlib

    load_reference_igev_modules(ref_root)  # parents + timm + cuda patches
    sub = importlib.import_module("models.corePrune_RAFT.submodule")
    fake_pkg = types.ModuleType("models.coreContinuous_A2A4IGEV")
    fake_pkg.__path__ = []
    sys.modules["models.coreContinuous_A2A4IGEV"] = fake_pkg
    sys.modules["models.coreContinuous_A2A4IGEV.submodule"] = sub
    return importlib.import_module("models.corePrune_RAFT.prune_raft_stereo")


def default_igev_args(**overrides) -> SimpleNamespace:
    """The reference IGEV trainer's argparse defaults
    (train_continuous_IGEV.py:284-369) with multi_training on (the
    behaviorally-proven configuration, SURVEY.md) and mixed precision off
    (CPU parity runs in fp32)."""
    args = dict(
        mixed_precision=False,
        max_disp=192,
        corr_levels=2,
        corr_radius=4,
        n_downsample=2,
        slow_fast_gru=False,
        n_gru_layers=3,
        hidden_dims=[128, 128, 128],
        unfold_similarity="with_v2ISU",
        lsp_width=3,
        lsp_height=3,
        lsp_dilation=[1, 2, 4, 8],
        local_ensemble=False,
        decode_cell=False,
        unfold=False,
        Raw_Mask_dim=32,
        pos_enconding_new=False,
        pos_enconding=False,
        require_grad=True,
        pos_dim=0,
        mlphidden_list=[128, 64, 64],
        multi_training=True,
        multi_input_training=False,
        disparity_norm=False,
        disparity_norm2=False,
        quater_nearest=None,
        agg_type="type5",
    )
    args.update(overrides)
    return SimpleNamespace(**args)


def default_raft_args(**overrides) -> SimpleNamespace:
    """train_continuous_Raft.py defaults (corr_levels 4, max_disp 700,
    require_grad False) with multi_training on and fp32."""
    args = default_igev_args(
        max_disp=700, corr_levels=4, require_grad=False, unfold=False
    )
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def _randomize_state(model, seed: int, weight_std: float = 0.1):
    import torch

    g = torch.Generator().manual_seed(seed + 1)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if k.endswith("running_var"):
                sd[k] = 0.5 + torch.rand(v.shape, generator=g)
            elif k.endswith("running_mean"):
                sd[k] = 0.2 * torch.randn(v.shape, generator=g)
            else:
                sd[k] = weight_std * torch.randn(v.shape, generator=g)
    model.load_state_dict(sd)
    model.eval()
    return model


def build_reference_raft(
    args: SimpleNamespace | None = None, seed: int = 0, weight_std: float = 0.03
):
    """Construct the reference continuous_RaftStereo on CPU, eval mode,
    fully randomized state (weights + BN running stats).  The default
    weight_std is small: with random weights the GRU feedback loop is
    chaotic (fp-noise Lyapunov growth ~30x/iteration at std 0.1), which
    makes multi-iteration parity comparisons meaningless — tame weights
    keep the trajectory comparable while exercising identical wiring."""
    import torch

    mod = load_reference_raft_modules()
    if args is None:
        args = default_raft_args()
    torch.manual_seed(seed)
    model = _randomize_state(mod.continuous_RaftStereo(args), seed, weight_std)
    return model, args


def build_reference_igev(args: SimpleNamespace | None = None, seed: int = 0,
                         weight_std: float = 0.1):
    """Construct the reference continuous_IGEVStereo on CPU in eval mode,
    with every tensor (weights AND BatchNorm running stats) randomized so
    parity tests exercise non-trivial normalization statistics.

    weight_std: pass a small value (e.g. 0.03, as build_reference_raft
    defaults to) to tame the GRU feedback loop's fp-noise Lyapunov growth
    and make FULL-trajectory multi-iteration comparisons meaningful."""
    import torch

    mod = load_reference_igev_modules()
    if args is None:
        args = default_igev_args()
    torch.manual_seed(seed)
    model = _randomize_state(mod.continuous_IGEVStereo(args), seed, weight_std)
    return model, args
