"""Config-variant coverage: every agg_type, LIIF option, and disparity
normalization actually builds and runs a forward pass (tiny shapes).
These claims were previously 'constructible'; here they execute."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anystereo_tpu.config import (
    AggregationType,
    IsuMode,
    LiifConfig,
    ModelConfig,
    PosEncType,
    raft_config,
)
from anystereo_tpu.nn.model import AnyStereo


def _run(cfg, b=1, h=32, w=64, q=32):
    model = AnyStereo(cfg)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    coords = jnp.asarray((rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99)
    scale = jnp.asarray([1.3], np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), left, right, iters=1, coords=coords, scale=scale
    )
    out = model.apply(
        variables, left, right, iters=1, coords=coords, scale=scale, mode="train"
    )
    assert out.disp_preds.shape == (1, b, q)
    assert bool(jnp.isfinite(out.disp_preds).all())
    return out


# model-compile-heavy; deselect with -m 'not slow' for quick runs
pytestmark = pytest.mark.slow


class TestAggVariants:
    @pytest.mark.parametrize(
        "agg", [AggregationType.TYPE1, AggregationType.TYPE2,
                AggregationType.TYPE3, AggregationType.TYPE4,
                AggregationType.TYPE5]
    )
    def test_igev_agg_types_run(self, agg):
        _run(ModelConfig(max_disp=32, agg_type=agg))

    @pytest.mark.parametrize(
        "agg", [AggregationType.IGEV, AggregationType.NONE]
    )
    def test_raft_only_agg_types_run(self, agg):
        _run(raft_config(max_disp=32, agg_type=agg, corr_levels=2))

    def test_raft_only_types_rejected_for_igev(self):
        with pytest.raises(ValueError):
            ModelConfig(agg_type=AggregationType.NONE)


class TestLiifVariants:
    def test_local_ensemble(self):
        cfg = ModelConfig(max_disp=32, liif=LiifConfig(local_ensemble=True))
        _run(cfg)

    def test_local_ensemble_eval_uses_query_path(self):
        """Default eval (no coords) must not silently drop the 4-neighbor
        ensemble: local_ensemble configs route through the query path, and
        the separable dense grid is rejected for them."""
        from anystereo_tpu.nn.model import dense_query_coords
        from anystereo_tpu.ops.coords import _axis_centers

        cfg = ModelConfig(max_disp=32, liif=LiifConfig(local_ensemble=True))
        model = AnyStereo(cfg)
        b, h, w = 1, 32, 64
        rng = np.random.RandomState(0)
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        variables = model.init(
            jax.random.PRNGKey(0), left, right, iters=1, mode="eval"
        )
        auto = model.apply(
            variables, left, right, iters=1, mode="eval"
        ).disp_final
        explicit = model.apply(
            variables, left, right, iters=1,
            coords=dense_query_coords(b, h, w), mode="eval",
        ).disp_final
        np.testing.assert_allclose(
            np.asarray(auto).reshape(-1),
            np.asarray(explicit).reshape(-1),
            rtol=1e-5, atol=1e-5,
        )
        with pytest.raises(ValueError):
            model.apply(
                variables, left, right, iters=1,
                dense_grid=(_axis_centers(h), _axis_centers(w)), mode="eval",
            )

    def test_quarter_nearest(self):
        cfg = ModelConfig(max_disp=32, liif=LiifConfig(quarter_nearest=True))
        assert cfg.liif.taps == 4
        _run(cfg)

    def test_spatial_posenc(self):
        cfg = ModelConfig(
            max_disp=32,
            liif=LiifConfig(pos_enc=PosEncType.SPATIAL, pos_dim=24),
        )
        _run(cfg)

    def test_sinusoid_posenc(self):
        cfg = ModelConfig(
            max_disp=32,
            liif=LiifConfig(pos_enc=PosEncType.SINUSOID, pos_dim=16),
        )
        _run(cfg)

    def test_learn_posenc(self):
        cfg = ModelConfig(
            max_disp=32,
            liif=LiifConfig(pos_enc=PosEncType.LEARN, pos_dim=16),
        )
        _run(cfg)

    def test_ipe_posenc(self):
        """The ipe encoder needs the query cell — both entry modes."""
        cfg = ModelConfig(
            max_disp=32,
            liif=LiifConfig(pos_enc=PosEncType.IPE, pos_dim=16),
        )
        _run(cfg)
        # dense separable grid path (eval decode) also plumbs the cell
        model = AnyStereo(cfg)
        rng = np.random.RandomState(0)
        left = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32) * 255)
        variables = model.init(
            jax.random.PRNGKey(0), left, right, iters=1, mode="eval"
        )
        out = model.apply(variables, left, right, iters=1, mode="eval")
        assert bool(jnp.isfinite(out.disp_final).all())

    def test_dpb_posenc(self):
        cfg = ModelConfig(
            max_disp=32,
            liif=LiifConfig(pos_enc=PosEncType.DPB, pos_dim=16),
        )
        _run(cfg)

    def test_decode_cell(self):
        cfg = ModelConfig(max_disp=32, liif=LiifConfig(decode_cell=True))
        _run(cfg)

    @pytest.mark.parametrize(
        "mode", [IsuMode.NONE, IsuMode.WITH_ISU, IsuMode.ONLY_ISU,
                 IsuMode.WITH_3V2_ISU]
    )
    def test_isu_modes(self, mode):
        cfg = ModelConfig(max_disp=32, liif=LiifConfig(isu_mode=mode))
        _run(cfg)


class TestDisparityNorm:
    @pytest.mark.parametrize("norm", ["width", "width1024"])
    def test_norm_variants_run(self, norm):
        cfg = ModelConfig(max_disp=32, liif=LiifConfig(disparity_norm=norm))
        _run(cfg)


class TestGruVariants:
    @pytest.mark.parametrize("n_layers", [1, 2])
    def test_fewer_gru_levels(self, n_layers):
        _run(ModelConfig(max_disp=32, n_gru_layers=n_layers))

    def test_slow_fast(self):
        _run(ModelConfig(max_disp=32, slow_fast_gru=True))

    def test_sep_conv_gru(self):
        """gru_type='sep' routes every level through SepConvGRU (the
        reference's dead separable variant, wired as a live config)."""
        out = _run(ModelConfig(max_disp=32, gru_type="sep"))
        assert bool(jnp.isfinite(out.init_disp).all())

    def test_bad_gru_type_rejected(self):
        with pytest.raises(ValueError):
            ModelConfig(max_disp=32, gru_type="nope")

    def test_fused_gru_gates_identical(self):
        """fuse_gru_gates computes z/r as one concatenated-kernel conv: the
        param tree is unchanged (same names, same init RNG draws) and the
        full-model outputs match the unfused form exactly (per-output-channel
        convolution is the same contraction either way)."""
        base = ModelConfig(max_disp=32, compute_dtype="float32")
        fused = dataclasses.replace(base, fuse_gru_gates=True)
        m0, m1 = AnyStereo(base), AnyStereo(fused)
        rng = np.random.RandomState(3)
        b, h, w, q = 1, 32, 64, 32
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        coords = jnp.asarray((rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99)
        scale = jnp.asarray([1.0], np.float32)
        v0 = m0.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        v1 = m1.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        # identical param trees (paths AND values)
        p0 = jax.tree_util.tree_leaves_with_path(v0["params"])
        p1 = jax.tree_util.tree_leaves_with_path(v1["params"])
        assert [k for k, _ in p0] == [k for k, _ in p1]
        for (_, a), (_, b_) in zip(p0, p1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        o0 = m0.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        o1 = m1.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        np.testing.assert_allclose(
            np.asarray(o0.disp_preds), np.asarray(o1.disp_preds),
            rtol=0, atol=1e-5,
        )

    def test_split_lookup_concat_identical(self):
        """split_lookup_concat feeds the motion encoder split (geo, corr)
        parts with convc1's kernel sliced per part: same param tree, same
        numbers up to ONE fp32 reassociation at the part boundary."""
        base = ModelConfig(
            max_disp=32, compute_dtype="float32", split_lookup_concat=False
        )
        split = dataclasses.replace(base, split_lookup_concat=True)
        m0, m1 = AnyStereo(base), AnyStereo(split)
        rng = np.random.RandomState(8)
        b, h, w, q = 1, 32, 64, 32
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        coords = jnp.asarray(
            (rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99
        )
        scale = jnp.asarray([1.0], np.float32)
        v0 = m0.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        v1 = m1.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        p0 = jax.tree_util.tree_leaves_with_path(v0["params"])
        p1 = jax.tree_util.tree_leaves_with_path(v1["params"])
        assert [k for k, _ in p0] == [k for k, _ in p1]
        for (_, a), (_, b_) in zip(p0, p1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        o0 = m0.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        o1 = m1.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        np.testing.assert_allclose(
            np.asarray(o0.disp_preds), np.asarray(o1.disp_preds),
            rtol=0, atol=5e-4,
        )

    def test_joint_gru_convs_identical(self):
        """joint_gru_convs evaluates convq's x-rows jointly with convz/convr
        (one wide conv; the qx column's h-rows are structurally zero) and
        sums the two q partial products in fp32: same param tree, same
        numbers up to one fp32 reassociation at the h/x row boundary."""
        base = ModelConfig(max_disp=32, compute_dtype="float32")
        joint = dataclasses.replace(base, joint_gru_convs=True)
        m0, m1 = AnyStereo(base), AnyStereo(joint)
        rng = np.random.RandomState(11)
        b, h, w, q = 1, 32, 64, 32
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        coords = jnp.asarray(
            (rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99
        )
        scale = jnp.asarray([1.0], np.float32)
        v0 = m0.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        v1 = m1.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        p0 = jax.tree_util.tree_leaves_with_path(v0["params"])
        p1 = jax.tree_util.tree_leaves_with_path(v1["params"])
        assert [k for k, _ in p0] == [k for k, _ in p1]
        for (_, a), (_, b_) in zip(p0, p1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        o0 = m0.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        o1 = m1.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        np.testing.assert_allclose(
            np.asarray(o0.disp_preds), np.asarray(o1.disp_preds),
            rtol=0, atol=5e-4,
        )

    def test_mxu_rewrites_identical_raft_core(self):
        """Both MXU layout rewrites at once on the RAFT core (distinct
        motion-encoder widths, zero-init disparity): same param tree, same
        outputs up to fp32 reassociation in the disp head."""
        from anystereo_tpu.config import raft_config

        base = raft_config(
            max_disp=32, corr_levels=2, compute_dtype="float32",
            fast_disp_head=False, fuse_motion_convs=False,
        )
        both = dataclasses.replace(
            base, fast_disp_head=True, fuse_motion_convs=True
        )
        m0, m1 = AnyStereo(base), AnyStereo(both)
        rng = np.random.RandomState(6)
        b, h, w, q = 1, 32, 64, 32
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        coords = jnp.asarray(
            (rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99
        )
        scale = jnp.asarray([1.0], np.float32)
        v0 = m0.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        v1 = m1.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        p0 = jax.tree_util.tree_leaves_with_path(v0["params"])
        p1 = jax.tree_util.tree_leaves_with_path(v1["params"])
        assert [k for k, _ in p0] == [k for k, _ in p1]
        for (_, a), (_, b_) in zip(p0, p1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        o0 = m0.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        o1 = m1.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        np.testing.assert_allclose(
            np.asarray(o0.disp_preds), np.asarray(o1.disp_preds),
            rtol=0, atol=5e-4,
        )

    def test_fast_disp_head_identical(self):
        """fast_disp_head rewrites the disp-head conv2 (3x3, 256→1) as a
        taps-on-lanes matmul + 9 shifted adds: the param tree is unchanged
        and the full-model outputs match the conv form up to fp32
        reassociation (the reduction over the 2304 products is reordered)."""
        base = ModelConfig(
            max_disp=32, compute_dtype="float32",
            fast_disp_head=False, fuse_motion_convs=False,
        )
        fast = dataclasses.replace(base, fast_disp_head=True)
        m0, m1 = AnyStereo(base), AnyStereo(fast)
        rng = np.random.RandomState(4)
        b, h, w, q = 1, 32, 64, 32
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        coords = jnp.asarray((rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99)
        scale = jnp.asarray([1.0], np.float32)
        v0 = m0.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        v1 = m1.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        p0 = jax.tree_util.tree_leaves_with_path(v0["params"])
        p1 = jax.tree_util.tree_leaves_with_path(v1["params"])
        assert [k for k, _ in p0] == [k for k, _ in p1]
        for (_, a), (_, b_) in zip(p0, p1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        o0 = m0.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        o1 = m1.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        # reassociated fp32 reduction: tiny per-step deltas, amplified a bit
        # by the iterative refinement — bound the disparity drift tightly
        np.testing.assert_allclose(
            np.asarray(o0.disp_preds), np.asarray(o1.disp_preds),
            rtol=0, atol=5e-4,
        )


    def test_fuse_motion_convs_identical(self):
        """fuse_motion_convs runs convc2/convd2 as one block-diagonal 3x3
        128→128 conv: param tree unchanged, outputs exactly equal (the zero
        cross-branch blocks contribute exact zeros to the accumulation)."""
        base = ModelConfig(
            max_disp=32, compute_dtype="float32",
            fast_disp_head=False, fuse_motion_convs=False,
        )
        fused = dataclasses.replace(base, fuse_motion_convs=True)
        m0, m1 = AnyStereo(base), AnyStereo(fused)
        rng = np.random.RandomState(5)
        b, h, w, q = 1, 32, 64, 32
        left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
        coords = jnp.asarray((rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.99)
        scale = jnp.asarray([1.0], np.float32)
        v0 = m0.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        v1 = m1.init(jax.random.PRNGKey(7), left, right, iters=2,
                     coords=coords, scale=scale)
        p0 = jax.tree_util.tree_leaves_with_path(v0["params"])
        p1 = jax.tree_util.tree_leaves_with_path(v1["params"])
        assert [k for k, _ in p0] == [k for k, _ in p1]
        for (_, a), (_, b_) in zip(p0, p1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        o0 = m0.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        o1 = m1.apply(v0, left, right, iters=2, coords=coords, scale=scale,
                      mode="train")
        np.testing.assert_allclose(
            np.asarray(o0.disp_preds), np.asarray(o1.disp_preds),
            rtol=0, atol=1e-5,
        )
