"""Typed configuration — the single source of truth for model/train/eval/data.

Replaces the reference's ~60-flag argparse namespaces (four near-duplicate
copies: train_continuous_IGEV.py:285-369, train_continuous_Raft.py:297-379,
evaluation.py:557-623, evaluation_validate.py:537-607) with validated
dataclasses.  All code-path selection that the reference does by substring
matching on flag strings at trace time (`agg_type`, `unfold_similarity`) is
resolved here at config time, so jitted functions see only static structure.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple


class CoreType(str, enum.Enum):
    """Which cost-volume stage the pipeline runs.

    The reference maintains two ~90%-identical model trees
    (models/coreContinuous_IGEV vs models/corePrune_RAFT); here they are one
    pipeline differing only in this switch.
    """

    IGEV = "igev"  # GWC volume + 3D aggregation + regressed init disparity
    RAFT = "raft"  # all-pairs correlation pyramid only, zero-init disparity


class AggregationType(str, enum.Enum):
    """High-frequency stem variant (reference `agg_type`,
    continuous_IGEVstereo.py:106-158 / prune_raft_stereo.py:110-180)."""

    TYPE1 = "type1"  # PixelUnshuffle stems, IN norm
    TYPE2 = "type2"  # adds a full-res stem_1; 3-input LIIF decoder
    TYPE3 = "type3"  # HighRes_Aggregation (squeeze-excite, IN head)
    TYPE4 = "type4"  # HighRes_Aggregation_LN (LayerNorm2d head)
    TYPE5 = "type5"  # HighRes_Aggregation_LN_GeLU — reference default
    IGEV = "igev_stem"  # strided-conv stems (RAFT core only)
    NONE = "none"  # no stems (RAFT core only)


class NormType(str, enum.Enum):
    """Normalization for conv blocks.

    `FROZEN_BATCH` reproduces the reference's training regime: BatchNorm2d
    layers are switched to eval mode for the whole run
    (train_continuous_IGEV.py:203, freeze_bn at continuous_IGEVstereo.py:178)
    so they normalize with fixed statistics — implemented here as a fixed
    affine transform with non-trainable (mean, var) variables.  INSTANCE and
    GROUP are the stateless TPU-friendly defaults.
    """

    INSTANCE = "instance"
    GROUP = "group"
    LAYER = "layer"  # LayerNorm2d (channel-wise, per-pixel)
    FROZEN_BATCH = "frozen_batch"
    NONE = "none"


class IsuMode(str, enum.Enum):
    """Intra-scale similarity unfolding mode for the LIIF decoder
    (reference `unfold_similarity` strings, liif.py:492-572)."""

    NONE = "none"
    WITH_ISU = "with_isu"  # affinity on live features, concat
    WITH_V2_ISU = "with_v2_isu"  # affinity on stop_gradient(features) — default
    ONLY_ISU = "only_isu"  # affinity replaces features
    WITH_3V2_ISU = "with_3v2_isu"  # 3 dilations, detached, concat


class PosEncType(str, enum.Enum):
    NONE = "none"
    SPATIAL = "spatial"  # log-spaced Fourier features (liif.py:305-337)
    SINUSOID = "sinusoid"  # PositionEncoder 'sinusoid' + projection (liif.py:181-302)
    LEARN = "learn"  # random-feature projection + LN/GELU MLP (liif.py:218-229)
    DPB = "dpb"  # dynamic position bias MLP (liif.py:230-245)
    # Integrated positional encoding: the sinusoid bank modulated by
    # sinc(cell @ B^T / pi) over the query cell footprint (liif.py:266-273).
    # Dead config space in the reference (pos_enconding_new hardwires
    # 'sinusoid', liif.py:592, and never plumbs the cell input), but this
    # framework carries the query scale everywhere, so the variant is live.
    IPE = "ipe"


@dataclasses.dataclass(frozen=True)
class LiifConfig:
    """Implicit (LIIF) arbitrary-scale decoder configuration
    (reference liif_out_multi_scale_Training, liif.py:575-678)."""

    mlp_hidden: Tuple[int, ...] = (128, 64, 64)
    isu_mode: IsuMode = IsuMode.WITH_V2_ISU
    isu_window: Tuple[int, int] = (3, 3)  # (win_h, win_w) → 8 affinity channels
    isu_dilations: Tuple[int, ...] = (1, 2, 4, 8)
    pos_enc: PosEncType = PosEncType.NONE
    pos_dim: int = 0
    decode_cell: bool = False
    local_ensemble: bool = False  # 4-neighbor area-weighted blend (liif.py:384-414)
    # 4-nearest-tap variant (reference --quater_nearest, values None /
    # 'only_disp' / 'both', liif.py:636-640):
    #   'only_disp': the decoder emits 4 weights combining the 4 nearest
    #                low-res disparities (instead of a 3x3 unfold);
    #   'both':      additionally the MLP INPUT samples and concatenates the
    #                4 nearest latent pixels (liif_feat_multiscale_train_quater,
    #                liif.py:142-179) — latent width x4.
    quarter_nearest: str = "none"  # 'none' | 'only_disp' | 'both'
    taps: int = 9  # 3x3 neighborhood weights produced by the MLP
    # Disparity normalization before decoding (continuous_IGEVstereo.py:198-201,
    # 223-235): 'none' | 'width' (disp/W, denorm by round(4*W*scale)) |
    # 'width1024' (disp/W*1024)
    disparity_norm: str = "none"

    def __post_init__(self):
        # coerce string spellings to the enum: dispatch sites compare with
        # `is PosEncType.X`, which a bare string would silently fail,
        # disabling the positional encoding without any error
        object.__setattr__(self, "pos_enc", PosEncType(self.pos_enc))
        if self.quarter_nearest is True:  # legacy bool spelling
            object.__setattr__(self, "quarter_nearest", "only_disp")
        elif self.quarter_nearest is False or self.quarter_nearest is None:
            object.__setattr__(self, "quarter_nearest", "none")
        if self.quarter_nearest not in ("none", "only_disp", "both"):
            raise ValueError(f"quarter_nearest: {self.quarter_nearest!r}")
        if self.quarter_nearest != "none":
            object.__setattr__(self, "taps", 4)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture config (defaults = the reference's behaviorally-proven
    IGEV + type5 + multi-scale configuration, train_continuous_IGEV.py)."""

    core: CoreType = CoreType.IGEV
    max_disp: int = 192  # full-res; cost volume depth = max_disp // 4
    corr_levels: int = 2  # 4 for the RAFT core (train_continuous_Raft.py:326)
    corr_radius: int = 4
    n_gru_layers: int = 3
    hidden_dims: Tuple[int, int, int] = (128, 128, 128)  # 1/4, 1/8, 1/16
    n_downsample: int = 2  # disparity at 1/2^n resolution
    agg_type: AggregationType = AggregationType.TYPE5
    slow_fast_gru: bool = False
    # GRU cell: "conv" = 3x3 ConvGRU with context gate biases (the only
    # cell any reference config reaches); "sep" = the separable 1x5/5x1
    # SepConvGRU (update.py:43-71 — defined but dead in the reference;
    # wired here as a real variant).  SepConvGRU has no context-bias form,
    # so the precomputed context gates are unused under "sep".
    gru_type: str = "conv"
    # Fuse the ConvGRU z/r gate convs (shared input hx) into one conv with
    # concatenated output channels: same params, same numbers, one im2col
    # read of hx and one wider MXU matmul per cell instead of two.
    fuse_gru_gates: bool = False
    # Disp-head conv2 (3x3, 256→1) as a taps-on-lanes matmul + 9 shifted
    # adds: XLA's 1-output-channel conv runs at 0.4% MXU (0.158 ms/iter
    # measured); same params, same numbers up to fp32 reassociation.
    fast_disp_head: bool = True
    # Motion-encoder convc2/convd2 (two 3x3 64→64 branch convs, ~20% MXU
    # each) as one block-diagonal 3x3 128→128 conv (~91% MXU at 2 lane
    # tiles): same params, same numbers (zero cross-blocks are exact).
    fuse_motion_convs: bool = True
    # Feed the lookup output to the motion encoder as split (geo, corr)
    # parts with the Pallas kernel emitting compute-dtype directly: skips
    # the per-GRU-iteration [B,H,W,162] concat + fp32→bf16 cast (~29 MB of
    # HBM round-trips per iteration at the bench shape).  convc1's kernel
    # is sliced per part (identical params; one extra fp32 reassociation
    # at the part boundary).
    split_lookup_concat: bool = True
    # ConvGRU q-conv joint schedule: evaluate the x-rows of convq together
    # with convz/convr as one wide conv over hx (the q conv waits on r and
    # measured ~52% MXU standalone; its x-part has no such dependence),
    # leaving a thin hidden->hidden conv on the serial r*h path.  Identical
    # param tree; one fp32 reassociation at the h/x row boundary.  On-chip
    # A/B 2026-08-21 (bench.py): 10.63 -> 10.92 pairs/s (91.6 ms), eval
    # maxdiff 0.078 px after 8 bf16 iterations -> default ON.
    joint_gru_convs: bool = True
    # Run left+right through the shared-weight matching encoders/stems as
    # one batched call (numerically identical: all norms are per-sample).
    # Measured on-chip 2026-08-20 (tools/profile_matching.py, 384x1248):
    # batched 13.38 ms vs sequential 6.91 ms for the SAME two images —
    # XLA:TPU's space-to-batch conv optimization only fires at batch 1, so
    # doubling the batch halves full-res conv efficiency.  Default OFF.
    batch_lr_matching: bool = False
    gwc_groups: int = 8
    fnet_dim: int = 256  # RAFT matching-feature dim
    liif: LiifConfig = dataclasses.field(default_factory=LiifConfig)
    # Norms at the sites where the reference used BatchNorm.  The reference
    # relies on pretrained timm statistics and freezes every BatchNorm2d for
    # the whole run (train_continuous_IGEV.py:203); training from scratch
    # that is a no-op affine, so the TPU build defaults to stateless
    # GroupNorm (trainable, mesh-friendly).  FROZEN_BATCH reproduces the
    # reference regime for converted-torch-weight parity.  IN sites
    # (matching encoders/stems) are instance-norm unconditionally, as in the
    # reference.  The 3D hourglass used live BatchNorm3d — INSTANCE here.
    norm_2d: NormType = NormType.GROUP
    norm_3d: NormType = NormType.INSTANCE
    # Precision policy: bf16 compute, fp32 params, fp32 lookup/regression.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Rematerialize each GRU iteration's activations in the backward pass
    # (jax.checkpoint): trades ~1 extra forward per iteration for O(1)
    # activation memory across the scan — enables larger crops/batches.
    remat: bool = False

    @property
    def volume_disp(self) -> int:
        return self.max_disp // 4

    @property
    def lookup_channels(self) -> int:
        """Per-pixel geometry feature width fed to the motion encoder.

        IGEV: levels * (2r+1) * (groups + 1)  (update.py:77, IGEV side)
        RAFT: levels * (2r+1)                 (corePrune_RAFT/update.py:77)
        """
        taps = 2 * self.corr_radius + 1
        if self.core is CoreType.IGEV:
            return self.corr_levels * taps * (self.gwc_groups + 1)
        return self.corr_levels * taps

    def __post_init__(self):
        if self.max_disp % 4 != 0:
            raise ValueError("max_disp must be divisible by 4")
        if self.core is CoreType.IGEV and self.agg_type in (
            AggregationType.IGEV,
            AggregationType.NONE,
        ):
            raise ValueError(f"agg_type {self.agg_type} is RAFT-core only")
        if self.n_gru_layers not in (1, 2, 3):
            raise ValueError("n_gru_layers must be 1, 2, or 3")
        if self.gru_type not in ("conv", "sep"):
            raise ValueError("gru_type must be 'conv' or 'sep'")
        if self.n_downsample != 2 and not (
            self.core is CoreType.RAFT
            and self.agg_type is AggregationType.NONE
        ):
            # only the stem-free RAFT fnet honors n_downsample; the IGEV
            # matching pyramid and every stem variant are built at 1/4
            raise ValueError(
                "n_downsample != 2 requires core=RAFT with agg_type=NONE "
                "(stems and the IGEV pyramid are fixed at 1/4 resolution)"
            )


def raft_config(**overrides) -> ModelConfig:
    """RAFT-core preset (train_continuous_Raft.py defaults: corr_levels 4)."""
    base = dict(
        core=CoreType.RAFT,
        corr_levels=4,
        agg_type=AggregationType.TYPE5,
    )
    base.update(overrides)
    return ModelConfig(**base)


def reference_regime_config(**overrides) -> ModelConfig:
    """The reference's exact training regime: frozen BatchNorm statistics
    everywhere BatchNorm2d/3d sat (train_continuous_IGEV.py:203 freezes
    every BN for the whole run; the hourglass BatchNorm3d is frozen with
    the rest).  Use with weights imported from a torch checkpoint via
    utils.torch_convert (which fills the batch_stats collection) — e.g. the
    timm-pretrained mobilenetv2_100 trunk the reference's accuracy rests on
    (extractor.py:330-331).  From-scratch training should prefer the
    default GroupNorm regime (stats-free, mesh-friendly)."""
    base = dict(
        norm_2d=NormType.FROZEN_BATCH,
        norm_3d=NormType.FROZEN_BATCH,
    )
    base.update(overrides)
    return ModelConfig(**base)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (train_continuous_IGEV.py:125-134,291-301)."""

    lr: float = 2e-4
    weight_decay: float = 1e-5
    num_steps: int = 100_000
    warmup_frac: float = 0.01  # OneCycle pct_start
    batch_size: int = 2
    crop_size: Tuple[int, int] = (320, 736)
    train_iters: int = 16
    valid_iters: int = 32
    grad_clip: float = 1.0
    # Compile the train step as TWO programs (grads | optimizer apply)
    # instead of one fused program.  None = auto: split on TPU, fused
    # elsewhere.  Observed 2026-08-20 on the axon TPU runtime: the fused
    # fwd+bwd+optimizer program computes NaN for a forward that the
    # grads-only program computes finitely — identical params and batch,
    # any optimizer (even bare optax.adamw), any lookup impl (jnp or
    # Pallas), and round-2 code reproduce it, so it is an
    # environment/compiler regression (that same code trained finite
    # on-chip on 2026-08-17), not a model bug.  The split restores finite
    # training at the cost of one extra dispatch per step (device-resident
    # grads; no host transfer).
    split_opt_step: Optional[bool] = None
    # skip (no-op) any update whose grads contain inf/NaN — the bf16-TPU
    # analog of the reference's AMP GradScaler step-skip (:232-239)
    skip_nonfinite: bool = True
    # abort training (with an emergency checkpoint of the still-finite
    # state) after this many CONSECUTIVE skipped steps: persistent NaNs
    # mean divergence, and silently no-op'ing forever hides it
    max_consecutive_nonfinite: int = 50
    loss_gamma: float = 0.9  # sequence-loss base, exponent 15/(N-1)
    supervise_init: bool = False  # add smooth-L1 on the regressed init disparity
    max_disp_loss: float = 700.0  # GT validity ceiling in the loss
    # Arbitrary-scale (multi_training) sampling
    multi_scale: bool = True
    inp_size: Tuple[int, int] = (160, 320)  # LR input crop (stereo_datasets.py:71)
    scale_min: float = 1.0
    scale_max: float = 2.95
    # Checkpointing — full train state (params + opt state + step), fixing the
    # reference's weights-only restore (train_continuous_IGEV.py:192-200).
    ckpt_dir: str = "checkpoints"
    ckpt_every: int = 10_000
    seed: int = 1234

    @property
    def sample_q(self) -> int:
        """Static per-sample query count (stereo_datasets.py:71)."""
        return self.inp_size[0] * self.inp_size[1]


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout.  data = batch sharding (pjit-DP, the analog of the
    reference's nn.DataParallel + vestigial NCCL, SURVEY §2.9); spatial =
    H-tiling of images/cost volumes with halo exchange for high-res inference."""

    data_axis: str = "data"
    spatial_axis: str = "spatial"
    data: int = 1
    spatial: int = 1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset selection and augmentation (stereo_datasets.py, augmentor.py)."""

    train_datasets: Tuple[str, ...] = ("sceneflow",)
    root: str = "/datasets"
    num_workers: int = 8
    # photometric
    saturation_range: Tuple[float, float] = (0.0, 1.4)
    img_gamma: Optional[Tuple[float, float]] = None
    # spatial
    spatial_scale: Tuple[float, float] = (-0.2, 0.4)
    do_flip: Optional[str] = None  # 'h' | 'v' | None
    yjitter: bool = True
    eraser_prob: float = 0.5


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    dataset: str = "sceneflow"
    valid_iters: int = 32
    scale_test: float = 1.0  # arbitrary-scale factor (inputs downscaled by it)
    divis_by: int = 32
    max_disp_metric: float = 1000.0  # validity ceiling (evaluation_validate.py)


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
