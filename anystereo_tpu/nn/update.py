"""Iterative refinement: motion encoder, multi-level coupled ConvGRUs and
the disparity head.

Spec: models/coreContinuous_IGEV/update.py (ConvGRU :26-41 with context
biases added inside the gates, BasicMotionEncoder :73-92, pool2x/interp
:94-102, BasicMultiUpdateBlock :104-136).  The only IGEV/RAFT difference is
the motion-encoder input width (162 vs 36 lookup channels).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from anystereo_tpu.ops.sampling import avg_pool2d, interp_bilinear

Dtype = Any


def _conv3(features, dtype, name=None):
    return nn.Conv(
        features, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype, name=name
    )


class _Conv3Params(nn.Module):
    """Parameter holder with nn.Conv's exact tree layout ({kernel, bias} at
    this module's scope) and init distributions, for convs whose kernels
    are concatenated or sliced at apply time (ConvGRU.fuse_zr,
    BasicMotionEncoder's split convc1)."""

    features: int
    ksize: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, in_ch: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.ksize, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,),
                          jnp.float32)
        return kernel, bias


class ConvGRU(nn.Module):
    """update.py:26-41.  Context gate biases (cz, cr, cq) are precomputed
    once outside the GRU loop (continuous_IGEVstereo.py:103,273) and added
    inside the sigmoid/tanh.

    fuse_zr: compute the z and r gates (which share the input hx) as ONE
    conv with concatenated output channels — one im2col read of hx and one
    wider MXU matmul instead of two.  Param tree and numerics are identical
    to the unfused form (convolution is independent per output channel);
    only the schedule changes."""

    hidden_dim: int
    dtype: Optional[Dtype] = None
    fuse_zr: bool = False
    joint_qx: bool = False

    @nn.compact
    def __call__(self, h, context, *inputs):
        cz, cr, cq = context
        x = jnp.concatenate(list(inputs), axis=-1)
        hx = jnp.concatenate([h, x], axis=-1)
        if self.joint_qx:
            return self._joint(h, x, hx, cz, cr, cq)
        if self.fuse_zr:
            kz, bz = _Conv3Params(self.hidden_dim, name="convz")(hx.shape[-1])
            kr, br = _Conv3Params(self.hidden_dim, name="convr")(hx.shape[-1])
            # dtype=None must match nn.Conv's promote-to-common semantics
            # (input and fp32 params promote, i.e. fp32 compute for bf16
            # activations) — NOT downcast the params to the input dtype.
            dt = (
                jnp.promote_types(hx.dtype, kz.dtype)
                if self.dtype is None
                else self.dtype
            )
            zr = jax.lax.conv_general_dilated(
                hx.astype(dt),
                jnp.concatenate([kz, kr], axis=-1).astype(dt),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.concatenate([bz, br]).astype(dt)
            z_pre, r_pre = jnp.split(zr, 2, axis=-1)
            z = nn.sigmoid(z_pre + cz)
            r = nn.sigmoid(r_pre + cr)
        else:
            z = nn.sigmoid(_conv3(self.hidden_dim, self.dtype, "convz")(hx) + cz)
            r = nn.sigmoid(_conv3(self.hidden_dim, self.dtype, "convr")(hx) + cr)
        q = jnp.tanh(
            _conv3(self.hidden_dim, self.dtype, "convq")(
                jnp.concatenate([r * h, x], axis=-1)
            )
            + cq
        )
        return (1.0 - z) * h + z * q

    def _joint(self, h, x, hx, cz, cr, cq):
        """joint_qx schedule (round-5): q's input is concat([r*h, x]) — only
        its first hidden_dim rows depend on r.  Evaluate the x-rows of convq
        JOINTLY with convz/convr as one 3-N-tile conv over hx (the h-rows of
        the qx column are structurally zero), leaving only a thin
        hidden→hidden conv on the serial r*h path.  Rationale: the q conv
        measured ~52% MXU and cannot join XLA's z/r coalition because it
        waits on r (docs/PERF.md round-3 table); this moves 2/3 of its MACs
        into the wide leading conv that has no data dependence.  Param tree
        identical (convz/convr/convq kernels sliced at apply); numerics:
        the two q partials each round at their conv store (one extra bf16
        rounding vs the single conv) and are summed in fp32 — a single
        reassociation at the h/x row boundary."""
        hd = self.hidden_dim
        in_all = hx.shape[-1]
        kz, bz = _Conv3Params(hd, name="convz")(in_all)
        kr, br = _Conv3Params(hd, name="convr")(in_all)
        kq, bq = _Conv3Params(hd, name="convq")(in_all)
        dt = (
            jnp.promote_types(hx.dtype, kz.dtype)
            if self.dtype is None
            else self.dtype
        )
        kqx = jnp.concatenate(
            [jnp.zeros_like(kq[:, :, :hd]), kq[:, :, hd:]], axis=2
        )
        kbig = jnp.concatenate([kz, kr, kqx], axis=-1)  # [3,3,in,3*hd]
        zrq = jax.lax.conv_general_dilated(
            hx.astype(dt),
            kbig.astype(dt),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        z = nn.sigmoid(zrq[..., :hd] + bz.astype(dt) + cz)
        r = nn.sigmoid(zrq[..., hd : 2 * hd] + br.astype(dt) + cr)
        # no preferred_element_type here: the conv transpose rule feeds the
        # fp32 cotangent back against the bf16 input and trips a dtype
        # check under autodiff — so the qh partial rounds at its store
        # (one extra bf16 rounding vs the single conv) and the parts are
        # summed in fp32
        qh = jax.lax.conv_general_dilated(
            (r * h).astype(dt),
            kq[:, :, :hd, :].astype(dt),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        q_pre = (
            zrq[..., 2 * hd :].astype(jnp.float32)
            + qh.astype(jnp.float32)
            + bq
        ).astype(dt)
        q = jnp.tanh(q_pre + cq)
        return (1.0 - z) * h + z * q


class SepConvGRU(nn.Module):
    """Separable (1x5 then 5x1) ConvGRU (update.py:43-71 — present in the
    reference but unused by its default 3-level path; provided for config
    parity)."""

    hidden_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h, *inputs):
        x = jnp.concatenate(list(inputs), axis=-1)
        for name, kern, pad in (("h", (1, 5), (0, 2)), ("v", (5, 1), (2, 0))):
            hx = jnp.concatenate([h, x], axis=-1)

            def conv(cname):
                return nn.Conv(
                    self.hidden_dim,
                    kern,
                    padding=((pad[0], pad[0]), (pad[1], pad[1])),
                    dtype=self.dtype,
                    name=f"{cname}{name}",
                )

            z = nn.sigmoid(conv("convz")(hx))
            r = nn.sigmoid(conv("convr")(hx))
            q = jnp.tanh(conv("convq")(jnp.concatenate([r * h, x], axis=-1)))
            h = (1.0 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """update.py:73-92: lookup features + current disparity → 128-ch motion
    features (last channel is the raw disparity).

    fuse_branch_convs: run convc2 (3x3 64→64 on the corr branch) and convd2
    (3x3 64→64 on the disp branch) as ONE 3x3 conv over concat([c, d]) with
    a block-diagonal kernel (cross-branch blocks exactly zero).  Same param
    tree and the same numbers — the zero blocks contribute exact zeros to
    the fp32 accumulation — but one 128-in/128-out conv (2 N-tiles on the
    lane axis, ~91% MXU measured) replaces two 64-ch convs (~20% MXU each,
    tools/profile_update_convs.py)."""

    dtype: Optional[Dtype] = None
    fuse_branch_convs: bool = False

    @nn.compact
    def __call__(self, disp, corr):
        # disp: [B,H,W,1] (fp32, cast in); corr: [B,H,W,C_lookup], or a
        # TUPLE of lookup parts ((geo, corr) from pyramid_lookup(split=True))
        # — then convc1's 1x1 kernel is sliced per part and the partial
        # products summed, so the per-GRU-iteration [B,H,W,162] concat is
        # never materialized.  Identical params; the partial products are
        # MXU-accumulated in fp32 (preferred_element_type) and summed in
        # fp32 before one cast to compute dtype, so the only numeric change
        # vs the single conv is one fp32 reassociation at the part boundary
        # (no extra bf16 rounding even when dtype=bfloat16).
        if isinstance(corr, (tuple, list)):
            widths = [p.shape[-1] for p in corr]
            kc1, bc1 = _Conv3Params(64, ksize=(1, 1), name="convc1")(
                sum(widths)
            )
            dt = (
                jnp.promote_types(corr[0].dtype, kc1.dtype)
                if self.dtype is None
                else self.dtype
            )
            acc = bc1.astype(jnp.float32)
            off = 0
            for p, wdt in zip(corr, widths):
                acc = acc + jax.lax.dot_general(
                    p.astype(dt),
                    kc1[0, 0, off : off + wdt, :].astype(dt),
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                off += wdt
            c = nn.relu(acc.astype(dt))
        else:
            c = nn.relu(
                nn.Conv(64, (1, 1), dtype=self.dtype, name="convc1")(corr)
            )
        d = nn.relu(
            nn.Conv(64, (7, 7), padding=((3, 3), (3, 3)), dtype=self.dtype,
                    name="convd1")(disp)
        )
        if self.fuse_branch_convs:
            kc, bc = _Conv3Params(64, name="convc2")(64)
            kd, bd = _Conv3Params(64, name="convd2")(64)
            cd = jnp.concatenate([c, d], axis=-1)
            dt = (
                jnp.promote_types(cd.dtype, kc.dtype)
                if self.dtype is None
                else self.dtype
            )
            zero = jnp.zeros_like(kc)
            k = jnp.concatenate(
                [
                    jnp.concatenate([kc, zero], axis=-1),  # input c rows
                    jnp.concatenate([zero, kd], axis=-1),  # input d rows
                ],
                axis=-2,
            )  # [3, 3, 128, 128] block-diagonal
            cd = jax.lax.conv_general_dilated(
                cd.astype(dt),
                k.astype(dt),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.concatenate([bc, bd]).astype(dt)
            cd = nn.relu(cd)
        else:
            c = nn.relu(_conv3(64, self.dtype, "convc2")(c))
            d = nn.relu(_conv3(64, self.dtype, "convd2")(d))
            cd = jnp.concatenate([c, d], axis=-1)
        out = nn.relu(_conv3(127, self.dtype, "conv")(cd))
        return jnp.concatenate([out, disp.astype(out.dtype)], axis=-1)


class DispHead(nn.Module):
    """update.py:16-24: two 3x3 convs with a 256-wide hidden layer → Δdisp.

    shift_matmul: schedule-only rewrite of conv2 (3x3, hidden→1).  XLA's
    conv with ONE output channel runs at 0.4% MXU on v5e (0.158 ms/iter at
    the bench shape, measured by tools/profile_update_convs.py): the lane
    dim carries the single output channel.  Same math as a [·,C]×[C,9]
    matmul (taps on lanes) followed by 9 shifted adds of scalar maps —
    identical params ({kernel (3,3,C,1), bias (1,)} at conv2/) and the same
    numbers up to fp32 reassociation."""

    hidden: int = 256
    dtype: Optional[Dtype] = None
    shift_matmul: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_conv3(self.hidden, self.dtype, "conv1")(x))
        if not self.shift_matmul:
            return _conv3(1, self.dtype, "conv2")(y)
        k, bias = _Conv3Params(1, name="conv2")(y.shape[-1])
        dt = (
            jnp.promote_types(y.dtype, k.dtype)
            if self.dtype is None
            else self.dtype
        )
        # mat[c, 3*dy+dx] = kernel[dy, dx, c, 0]
        mat = k[..., 0].transpose(2, 0, 1).reshape(y.shape[-1], 9)
        t = jax.lax.dot_general(
            y.astype(dt),
            mat.astype(dt),
            dimension_numbers=(((3,), (0,)), ((), ())),
        )  # [B, H, W, 9] per-tap scalar maps
        tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, w = y.shape[1], y.shape[2]
        # cross-correlation with pad 1: out[i,j] = sum_dy,dx
        # y[i+dy-1, j+dx-1]·w[dy,dx] = sum tp[i+dy, j+dx, 3*dy+dx]
        out = sum(
            tp[:, dy : dy + h, dx : dx + w, 3 * dy + dx]
            for dy in range(3)
            for dx in range(3)
        )
        return out[..., None] + bias.astype(out.dtype)


def pool2x(x):
    return avg_pool2d(x, 3, 2, 1)


def pool4x(x):
    return avg_pool2d(x, 5, 4, 1)


class BasicMultiUpdateBlock(nn.Module):
    """update.py:104-136.  net: list of hidden states ordered [1/4, 1/8,
    1/16]; context: per-level (cz, cr, cq) gate biases.  Coupling: each GRU
    sees the pooled finer state and the upsampled coarser state."""

    hidden_dims: Sequence[int] = (128, 128, 128)  # indexed [2]=1/4 as in ref
    n_layers: int = 3
    gru_type: str = "conv"  # "conv" | "sep" (SepConvGRU, no context gates)
    fuse_zr: bool = False  # fused z/r gate conv (numerics-identical)
    joint_qx: bool = False  # ConvGRU.joint_qx schedule (one reassociation)
    head_shift_matmul: bool = False  # disp-head conv2 as matmul+shifts
    fuse_motion_convs: bool = False  # block-diag convc2+convd2 (identical)
    dtype: Optional[Dtype] = None

    def _gru(self, hidden_dim, name):
        """GRU cell factory returning a callable (h, context, *inputs).
        SepConvGRU (the reference's dead separable variant, wired here as a
        real config) takes no context biases — they are dropped."""
        if self.gru_type == "sep":
            cell = SepConvGRU(hidden_dim, self.dtype, name=name)
            return lambda h, context, *inputs: cell(h, *inputs)
        return ConvGRU(hidden_dim, self.dtype, fuse_zr=self.fuse_zr,
                       joint_qx=self.joint_qx, name=name)

    @nn.compact
    def __call__(
        self,
        net: List[jnp.ndarray],
        context,
        corr=None,
        disp=None,
        iter04: bool = True,
        iter08: bool = True,
        iter16: bool = True,
        update: bool = True,
    ):
        net = list(net)
        if iter16 and self.n_layers == 3:
            net[2] = self._gru(self.hidden_dims[0], "gru16")(
                net[2], context[2], pool2x(net[1])
            )
        if iter08 and self.n_layers >= 2:
            if self.n_layers > 2:
                net[1] = self._gru(self.hidden_dims[1], "gru08")(
                    net[1],
                    context[1],
                    pool2x(net[0]),
                    interp_bilinear(net[2], net[1].shape[1:3]),
                )
            else:
                net[1] = self._gru(self.hidden_dims[1], "gru08")(
                    net[1], context[1], pool2x(net[0])
                )
        if iter04:
            motion = BasicMotionEncoder(
                self.dtype,
                fuse_branch_convs=self.fuse_motion_convs,
                name="encoder",
            )(disp, corr)
            if self.n_layers > 1:
                net[0] = self._gru(self.hidden_dims[2], "gru04")(
                    net[0],
                    context[0],
                    motion,
                    interp_bilinear(net[1], net[0].shape[1:3]),
                )
            else:
                net[0] = self._gru(self.hidden_dims[2], "gru04")(
                    net[0], context[0], motion
                )
        if not update:
            return net, None
        delta = DispHead(
            256,
            self.dtype,
            shift_matmul=self.head_shift_matmul,
            name="disp_head",
        )(net[0])
        return net, delta
