"""The unified Any-Stereo pipeline: one configurable model covering both
reference cores (continuous_IGEVStereo, continuous_IGEVstereo.py:91-305, and
continuous_RaftStereo, prune_raft_stereo.py:92-297 — ~90%-identical forks in
the reference, one model here).

Structure of a forward pass (call stack mirror of SURVEY.md §3.2):
  normalize → matching features (+stems) → cost stage
    IGEV: GWC volume → 3D aggregation → softargmin init disparity → GEV
    RAFT: all-pairs correlation only, zero init
  → correlation pyramid → context encoder (+gate-bias precompute)
  → GRU refinement loop (lax.scan, stop_gradient between iterations)
  → LIIF upsample: every iteration in training, final iteration at eval.

TPU-native choices: NHWC/NDHWC layouts, bf16 compute with fp32 lookup and
fp32 disparity state, the iteration loop as nn.scan (constant-size XLA
program instead of a 16x unrolled graph), and query-based decoding with a
static Q so shapes stay fixed under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from anystereo_tpu.config import CoreType, ModelConfig
from anystereo_tpu.nn.aggregation import CostAggregation
from anystereo_tpu.nn.extractor import BasicEncoder, FeaturePyramid, MultiBasicEncoder
from anystereo_tpu.nn.layers import ConvNormAct
from anystereo_tpu.nn.liif import LiifDecoder
from anystereo_tpu.nn.stems import StemBranch
from anystereo_tpu.nn.update import BasicMultiUpdateBlock
from anystereo_tpu.config import NormType
from anystereo_tpu.ops.coords import make_coord
from anystereo_tpu.ops.cost_volume import (
    all_pairs_correlation,
    build_gwc_and_corr,
    disparity_regression,
)
from anystereo_tpu.ops.lookup import build_pyramid, pyramid_lookup
from anystereo_tpu.ops.upsample import (
    context_upsample_queries,
    context_upsample_queries_quarter,
)


class StereoOutput(NamedTuple):
    """init_disp: [B, H/4, W/4] regressed initial disparity (IGEV only);
    disp_preds: [iters, B, Q] per-iteration upsampled predictions (train);
    disp_final: [B, Q] final upsampled prediction;
    disp_lowres: [B, H/4, W/4] final pre-upsample disparity (the reference's
    `output_raw`, prune_raft_stereo.py:292-294)."""

    init_disp: Optional[jnp.ndarray]
    disp_preds: Optional[jnp.ndarray]
    disp_final: jnp.ndarray
    disp_lowres: jnp.ndarray


def dense_query_coords(b: int, out_h: int, out_w: int) -> jnp.ndarray:
    """Full-grid queries for fixed-size decoding ([B, H*W, 2], (y, x))."""
    return jnp.broadcast_to(make_coord((out_h, out_w))[None], (b, out_h * out_w, 2))


class AnyStereo(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        self._dt = dt
        if cfg.core is CoreType.IGEV:
            self.feature = FeaturePyramid(norm=cfg.norm_2d, dtype=dt)
            # match-descriptor head (continuous_IGEVstereo.py:159-160)
            self.conv = ConvNormAct(
                96, 3, stride=1, padding=1, norm=NormType.INSTANCE, dtype=dt
            )
            self.desc = nn.Conv(96, (1, 1), dtype=dt)
            self.cost_agg = CostAggregation(
                in_channels=cfg.gwc_groups,
                norm=cfg.norm_3d,
                norm_2d=cfg.norm_2d,
                dtype=dt,
            )
            # folded 3x3x3 (layers._Conv3x3x3Folded): XLA's conv3d lowering
            # runs thin-channel volumes ~3.5x slower than depth-batched 2-D
            # convs on TPU; same param tree ("classifier/kernel") as nn.Conv
            from anystereo_tpu.nn.layers import _Conv3x3x3Folded

            self.classifier = _Conv3x3x3Folded(
                1, use_bias=False, dtype=jnp.float32
            )
        else:
            self.fnet = BasicEncoder(
                output_dim=cfg.fnet_dim, downsample=cfg.n_downsample, dtype=dt
            )
        self.stems = StemBranch(cfg.agg_type, dtype=dt)
        self.cnet = MultiBasicEncoder(
            hidden_dims=cfg.hidden_dims,
            context_dims=cfg.hidden_dims,
            n_layers=cfg.n_gru_layers,
            downsample=cfg.n_downsample,
            norm=cfg.norm_2d,
            dtype=dt,
        )
        # per-level context→(cz,cr,cq) gate precompute (continuous_IGEVstereo.py:103)
        self.context_zqr = [
            nn.Conv(
                cfg.hidden_dims[2 - i] * 3,
                (3, 3),
                padding=((1, 1), (1, 1)),
                dtype=dt,
                name=f"context_zqr_{i}",
            )
            for i in range(cfg.n_gru_layers)
        ]
        self.update_block = BasicMultiUpdateBlock(
            hidden_dims=cfg.hidden_dims, n_layers=cfg.n_gru_layers,
            gru_type=cfg.gru_type, fuse_zr=cfg.fuse_gru_gates,
            joint_qx=cfg.joint_gru_convs,
            head_shift_matmul=cfg.fast_disp_head,
            fuse_motion_convs=cfg.fuse_motion_convs, dtype=dt
        )
        self.liif = LiifDecoder(cfg.liif, dtype=dt)

    # ------------------------------------------------------------------ #

    def _matching(self, left, right):
        """Matching features + stems + (IGEV) pyramid for both images.

        Left and right ride through the shared-weight encoders as ONE
        batched call (the reference's fnet([image1, image2]) pattern,
        extractor.py:177-198, applied to the IGEV side too): every op in
        FeaturePyramid/StemBranch normalizes per sample (instance/group/
        layer norm, per-sample squeeze-excite pooling), so the batched
        call is numerically identical to two single calls while doubling
        MXU occupancy and halving fixed per-call overhead."""
        cfg = self.cfg
        b = left.shape[0]
        if cfg.core is CoreType.IGEV:
            if cfg.batch_lr_matching:
                lr = jnp.concatenate([left, right], axis=0)
                feats = self.feature(lr)
                s1, s2, s4 = self.stems(lr)
                f4 = jnp.concatenate([feats[0], s4], axis=-1)  # [2B,..,96]
                match = self.desc(self.conv(f4))
                match_l, match_r = match[:b], match[b:]
                feats_l = [f4[:b]] + [f[:b] for f in feats[1:]]
                stems = tuple(
                    None if s is None else s[:b] for s in (s1, s2, s4)
                )
                return match_l, match_r, feats_l, stems
            feats_l = self.feature(left)
            feats_r = self.feature(right)
            s1x, s2x, s4x = self.stems(left)
            _, s2y, s4y = self.stems(right)
            f4_l = jnp.concatenate([feats_l[0], s4x], axis=-1)  # [.., 96]
            f4_r = jnp.concatenate([feats_r[0], s4y], axis=-1)
            match_l = self.desc(self.conv(f4_l))
            match_r = self.desc(self.conv(f4_r))
            feats_l = [f4_l] + feats_l[1:]
            return match_l, match_r, feats_l, (s1x, s2x, s4x)
        if cfg.batch_lr_matching:
            match = self.fnet(jnp.concatenate([left, right], axis=0))
            match_l, match_r = match[:b], match[b:]
        else:
            match_l = self.fnet(left)
            match_r = self.fnet(right)
        s1x, s2x, s4x = self.stems(left)
        return match_l, match_r, None, (s1x, s2x, s4x)

    def _cost_stage(self, match_l, match_r, feats_l):
        """Build lookup pyramids and (IGEV) the initial disparity."""
        cfg = self.cfg
        if cfg.core is CoreType.RAFT:
            corr = all_pairs_correlation(match_l, match_r)  # fp32 [B,H,W,W2]
            pyr = build_pyramid(corr, None, cfg.corr_levels, cfg.corr_radius)
            return pyr, None
        d = cfg.volume_disp
        # one grouped MXU matmul serves both the GWC volume (banded
        # extraction) and the lookup pyramid's init-corr (group sum) —
        # replaces the D-step shift-multiply scan (ops/cost_volume.py)
        gwc, corr = build_gwc_and_corr(match_l, match_r, d, cfg.gwc_groups)
        vol = jnp.transpose(gwc, (0, 4, 1, 2, 3)).astype(self._dt)  # [B,D,H,W,G]
        gev = self.cost_agg(vol, feats_l)  # [B,D,H,W,8]
        logits = self.classifier(gev.astype(jnp.float32))[..., 0]  # [B,D,H,W]
        prob = jax.nn.softmax(logits, axis=1)
        init_disp = disparity_regression(
            jnp.transpose(prob, (0, 2, 3, 1)), d
        )  # [B,H,W] fp32
        geo = jnp.transpose(gev, (0, 2, 3, 4, 1))  # [B,H,W,8,D]
        pyr = build_pyramid(corr, geo, cfg.corr_levels, cfg.corr_radius)
        return pyr, init_disp

    def _context(self, left):
        cfg = self.cfg
        cnet_out = self.cnet(left)
        net = [jnp.tanh(n) for n, _ in cnet_out]
        ctx = []
        for i, (_, inp) in enumerate(cnet_out):
            gates = self.context_zqr[i](nn.relu(inp))
            ctx.append(tuple(jnp.split(gates, 3, axis=-1)))
        return net, ctx

    def _decoder_feats(self, hidden, stems):
        s1x, s2x, s4x = stems
        x = hidden if s4x is None else jnp.concatenate([s4x, hidden], axis=-1)
        if s1x is not None:
            return [s1x, s2x, x]  # type2 ordering (continuous_IGEVstereo.py:211)
        if s2x is not None:
            return [x, s2x]
        return [x]

    def _normalize(self, img):
        """[0,255] image → [-1,1] in the compute dtype
        (continuous_IGEVstereo.py:242-243).  Single source of truth — the
        stage profiler calls this too (tools/profile_stages.py)."""
        return (2.0 * (img / 255.0) - 1.0).astype(self._dt)

    def _scale_disp(self, disp, scale):
        """Pre-decode disparity scaling (continuous_IGEVstereo.py:198-206):
        default disp*2^n_downsample*scale (4x for every reference config);
        optional width normalization variants."""
        up = float(2 ** self.cfg.n_downsample)
        w = disp.shape[-1]
        norm = self.cfg.liif.disparity_norm
        if norm == "width":
            return disp / w
        if norm == "width1024":
            return disp / w * 1024.0
        return disp * up * scale[:, None, None]

    def _denorm_disp(self, disp_up, w, scale):
        """Post-decode denormalization (continuous_IGEVstereo.py:223-235)."""
        up = float(2 ** self.cfg.n_downsample)
        norm = self.cfg.liif.disparity_norm
        if norm == "width":
            return disp_up * jnp.round(w * up * scale).reshape(
                (-1,) + (1,) * (disp_up.ndim - 1)
            )
        if norm == "width1024":
            return disp_up / 1024.0 * jnp.round(w * up * scale).reshape(
                (-1,) + (1,) * (disp_up.ndim - 1)
            )
        return disp_up

    def _upsample(self, disp, hidden, stems, coords, scale):
        """upsample_disp (continuous_IGEVstereo.py:192-237): LIIF weights →
        softmax → weighted 3x3 (or 4-tap) combine of disp * 4 * scale."""
        cfg = self.cfg
        feats = self._decoder_feats(hidden, stems)
        weights = self.liif(feats, coords, scale)  # [B, Q, taps]
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1)
        w = disp.shape[-1]
        disp_scaled = self._scale_disp(disp, scale)  # [B,H,W] fp32
        if cfg.liif.quarter_nearest != "none":
            up = context_upsample_queries_quarter(disp_scaled, weights, coords)
        else:
            up = context_upsample_queries(disp_scaled, weights, coords)
        return self._denorm_disp(up, w, scale)

    def _upsample_dense(self, disp, hidden, stems, ys, xs, scale):
        """Dense-grid decode (the reference's fixed-size liif_out +
        context_upsample path, submodule.py:343-355) — separable one-hot
        matmuls instead of per-query gathers; returns [B, H', W']."""
        from anystereo_tpu.ops.sampling import nearest_dense_gather
        from anystereo_tpu.ops.upsample import unfold3x3

        feats = self._decoder_feats(hidden, stems)
        weights = self.liif(feats, ys=ys, xs=xs, scale=scale)  # [B,H',W',taps]
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1)
        w0 = disp.shape[-1]
        disp_scaled = self._scale_disp(disp, scale)
        if self.cfg.liif.quarter_nearest != "none":
            # separable dense analog of context_upsample_queries_quarter:
            # gather disp at the four corner cells (per-axis shifts), tap
            # order (vy,vx) = (-,-),(-,+),(+,-),(+,+) matching the weights
            h0 = disp_scaled.shape[1]
            ry, rx = 1.0 / h0, 1.0 / w0
            eps = 1e-6
            taps = []
            for vy in (-1.0, 1.0):
                for vx in (-1.0, 1.0):
                    t, _, _ = nearest_dense_gather(
                        disp_scaled[..., None],
                        ys + (vy * ry + eps),
                        xs + (vx * rx + eps),
                    )
                    taps.append(t)
            up = jnp.concatenate(taps, axis=-1)  # [B, H', W', 4]
        else:
            patches = unfold3x3(disp_scaled)  # [B, h, w, 9] fp32
            up, _, _ = nearest_dense_gather(patches, ys, xs)  # [B,H',W',9]
        return self._denorm_disp((up * weights).sum(axis=-1), w0, scale)

    # ------------------------------------------------------------------ #

    def __call__(
        self,
        left: jnp.ndarray,
        right: jnp.ndarray,
        iters: int = 16,
        coords: Optional[jnp.ndarray] = None,
        scale: Optional[jnp.ndarray] = None,
        mode: str = "train",
        dense_grid: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> StereoOutput:
        """left/right: [B, H, W, 3] uint8-range images (0..255 floats).
        coords: [B, Q, 2] normalized queries (training / scattered GT);
        dense_grid: (ys [H'], xs [W']) separable output grid — eval-only
        fast path (no gathers; disp_final is [B, H', W']).  With neither,
        eval decodes the full input-resolution grid densely.
        scale: [B] arbitrary-scale factor (defaults to 1)."""
        cfg = self.cfg
        b, h, w, _ = left.shape
        left = self._normalize(left)
        right = self._normalize(right)
        if scale is None:
            scale = jnp.ones((b,), jnp.float32)
        else:
            scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (b,))
        # round-5: the dense separable path covers ALL sampling modes —
        # quarter-nearest (per-axis corner shifts stay separable) and the
        # local ensemble (4 shifted dense decodes, swapped-area blend) —
        # so eval always decodes gather-free (LiifDecoder._decode_dense)
        if coords is None and dense_grid is None:
            if mode == "train":
                coords = dense_query_coords(b, h, w)
            else:
                from anystereo_tpu.ops.coords import _axis_centers

                dense_grid = (_axis_centers(h), _axis_centers(w))
        if dense_grid is not None and mode == "train":
            raise ValueError("dense_grid is an eval-only decode path")
        match_l, match_r, feats_l, stems = self._matching(left, right)
        pyr, init_disp = self._cost_stage(match_l, match_r, feats_l)
        net, ctx = self._context(left)

        if init_disp is None:
            disp = jnp.zeros(match_l.shape[:3], jnp.float32)  # RAFT zero init
        else:
            disp = init_disp

        slow_fast = cfg.slow_fast_gru

        def gru_update(mdl, net, disp, pyr, ctx):
            if cfg.split_lookup_concat:
                # split parts in compute dtype: no concat materialization,
                # no XLA-side cast (the kernel rounds at its final store)
                geo = pyramid_lookup(
                    pyr, jax.lax.stop_gradient(disp), split=True,
                    out_dtype=mdl._dt,
                )
            else:
                geo = pyramid_lookup(pyr, jax.lax.stop_gradient(disp))
            if slow_fast and cfg.n_gru_layers == 3:
                net, _ = mdl.update_block(
                    net, ctx, iter04=False, iter08=False, iter16=True, update=False
                )
            if slow_fast and cfg.n_gru_layers >= 2:
                net, _ = mdl.update_block(
                    net,
                    ctx,
                    iter04=False,
                    iter08=True,
                    iter16=cfg.n_gru_layers == 3,
                    update=False,
                )
            net, delta = mdl.update_block(
                net,
                ctx,
                corr=geo if isinstance(geo, tuple) else geo.astype(mdl._dt),
                disp=jax.lax.stop_gradient(disp)[..., None].astype(mdl._dt),
                iter16=cfg.n_gru_layers == 3,
                iter08=cfg.n_gru_layers >= 2,
            )
            disp = jax.lax.stop_gradient(disp) + delta[..., 0].astype(jnp.float32)
            return net, disp

        # Static per-forward inputs (pyramids, context gates, stems, queries)
        # enter the scan as nn.broadcast args — not closures — so flax's
        # broadcast-linearization can hoist them and reverse-mode works.
        if mode == "train":

            def body(mdl, carry, _, pyr, ctx, stems, coords, scale):
                net, disp = carry
                net, disp = gru_update(mdl, net, disp, pyr, ctx)
                disp_up = mdl._upsample(disp, net[0], stems, coords, scale)
                return (net, disp), disp_up

            if cfg.remat:
                # O(1) activation memory across the iteration scan
                body = nn.remat(body, prevent_cse=False)
            scanned = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=(nn.broadcast,) * 6,
                length=iters,
            )
            (net, disp), disp_preds = scanned(
                self, (net, disp), None, pyr, ctx, stems, coords, scale
            )
            return StereoOutput(
                init_disp=init_disp,
                disp_preds=disp_preds,  # [iters, B, Q]
                disp_final=disp_preds[-1],
                disp_lowres=disp,
            )

        def body_eval(mdl, carry, _, pyr, ctx):
            net, disp = carry
            return gru_update(mdl, net, disp, pyr, ctx), None

        scanned = nn.scan(
            body_eval,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast,) * 3,
            length=iters,
        )
        (net, disp), _ = scanned(self, (net, disp), None, pyr, ctx)
        if dense_grid is not None:
            ys, xs = dense_grid
            disp_up = self._upsample_dense(disp, net[0], stems, ys, xs, scale)
        else:
            disp_up = self._upsample(disp, net[0], stems, coords, scale)
        return StereoOutput(
            init_disp=init_disp,
            disp_preds=None,
            disp_final=disp_up,
            disp_lowres=disp,
        )


def _build_igev(**kw) -> "AnyStereo":
    return AnyStereo(ModelConfig(**kw))


def _build_raft(**kw) -> "AnyStereo":
    from anystereo_tpu.config import raft_config

    return AnyStereo(raft_config(**kw))


# model registry (models/__init__.py:4-7 equivalent)
MODELS = {
    "continuous_IGEVStereo": _build_igev,
    "continuous_RAFTStereo": _build_raft,
}
