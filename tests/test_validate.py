"""Validation-protocol tests: pad_for_queries coordinate bookkeeping
(evaluation_validate.py:66-90 semantics, incl. the get_pad_num fix) and an
end-to-end per-image validation loop with a tiny model."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anystereo_tpu.config import ModelConfig
from anystereo_tpu.eval.validate import Validator, pad_for_queries, validate_dataset
from anystereo_tpu.nn.model import AnyStereo
from anystereo_tpu.ops.coords import make_coord


# model-compile-heavy; deselect with -m 'not slow' for quick runs
pytestmark = pytest.mark.slow


class TestPadForQueries:
    def test_scale1_coords_cover_unpadded_region(self):
        h, w = 30, 50
        left = np.zeros((1, h, w, 3), np.float32)
        lp, rp, coords, s = pad_for_queries(left, left.copy(), 1.0, 16)
        assert lp.shape[1] % 16 == 0 and lp.shape[2] % 16 == 0
        assert coords.shape == (1, h * w, 2)
        # the queries must be exactly the padded-grid coords of the
        # original pixels
        hp, wp = lp.shape[1], lp.shape[2]
        full = np.asarray(make_coord((hp, wp), flatten=False))
        t = (hp - h) // 2
        l = (wp - w) // 2
        want = full[t : t + h, l : l + w].reshape(-1, 2)
        np.testing.assert_allclose(np.asarray(coords)[0], want, atol=1e-6)

    def test_scale2_downscales_inputs(self):
        h, w = 64, 96
        left = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32)
        lp, rp, coords, s = pad_for_queries(left, left.copy(), 2.0, 32)
        assert s == 2.0
        assert lp.shape[1] == 32 and lp.shape[2] == 64  # ceil(64/2), ceil(96/2)
        assert coords.shape == (1, h * w, 2)
        assert np.abs(np.asarray(coords)).max() < 1.0


class TestValidateLoop:
    def test_validate_synthetic_dataset(self, tmp_path):
        """Full per-image validation on a 2-image synthetic dataset with a
        tiny random model: metrics come back finite with the right keys."""
        from tests.test_data import _synthetic_dataset

        ds = _synthetic_dataset(tmp_path, n=2, h=44, w=72)
        ds.augmentor = None
        cfg = ModelConfig(max_disp=32)
        model = AnyStereo(cfg)
        img1, img2, _, _ = ds._load_raw(0)
        lp, rp, coords, s = pad_for_queries(
            img1[None].astype(np.float32), img2[None].astype(np.float32), 1.0, 32
        )
        variables = model.init(
            jax.random.PRNGKey(0), lp, rp, iters=1, coords=coords,
            scale=jnp.asarray([s]),
        )
        res = validate_dataset(
            model, variables["params"], ds, valid_iters=2, divis=32, max_images=2
        )
        for key in ("epe", "d1", "thres1", "thres3"):
            assert key in res and np.isfinite(res[key])

    def test_validator_caches_by_shape(self, tmp_path):
        from tests.test_data import _synthetic_dataset

        ds = _synthetic_dataset(tmp_path, n=1, h=44, w=72)
        cfg = ModelConfig(max_disp=32)
        model = AnyStereo(cfg)
        img1, img2, _, _ = ds._load_raw(0)
        lp, rp, coords, s = pad_for_queries(
            img1[None].astype(np.float32), img2[None].astype(np.float32), 1.0, 32
        )
        variables = model.init(
            jax.random.PRNGKey(0), lp, rp, iters=1, coords=coords,
            scale=jnp.asarray([s]),
        )
        v = Validator(model, variables["params"], valid_iters=1)
        v.infer(img1, img2)
        v.infer(img1, img2)
        assert len(v._fns) == 1


class TestFixedUpscaleDivis:
    def test_qf_protocol_respects_model_divis(self):
        """Middlebury Q→F/H→F: Validator.infer must pad the fixed-upscale
        path to the model's divis (32 for IGEV), not a hardcoded 16 — at
        H=48 (16-divisible only) the 3-level hourglass otherwise crashes
        on an odd skip concat (H/4=12 is not divisible by 8)."""
        from anystereo_tpu.eval.validate import pad_for_fixed_upscale

        cfg = ModelConfig(max_disp=32)
        model = AnyStereo(cfg)
        rng = np.random.RandomState(0)
        img1 = (rng.rand(48, 64, 3) * 255).astype(np.float32)
        img2 = (rng.rand(48, 64, 3) * 255).astype(np.float32)
        lp, rp, ys, xs, s = pad_for_fixed_upscale(
            img1[None], img2[None], 2, 32
        )
        variables = model.init(
            jax.random.PRNGKey(0), lp, rp, iters=1, dense_grid=(ys, xs),
            scale=jnp.asarray([s]), mode="eval",
        )
        v = Validator(model, variables["params"], valid_iters=1)
        out = v.infer(img1, img2, fixed_upscale=2, divis=32)
        assert out.shape == (96, 128)
        assert np.isfinite(out).all()


class TestReporting:
    def test_result_txt_and_pngs(self, tmp_path):
        """--record/--output equivalents: per-image result lines, summary
        block, colored disparity + error-map PNGs."""
        from tests.test_data import _synthetic_dataset
        from anystereo_tpu.nn.model import AnyStereo
        from anystereo_tpu.config import ModelConfig
        import jax.numpy as jnp

        (tmp_path / "data").mkdir()
        ds = _synthetic_dataset(tmp_path / "data", n=1, h=44, w=72)
        ds.augmentor = None
        cfg = ModelConfig(max_disp=32)
        model = AnyStereo(cfg)
        img1, img2, _, _ = ds._load_raw(0)
        from anystereo_tpu.eval.validate import pad_for_dense_grid

        lp, rp, ys, xs, s = pad_for_dense_grid(
            img1[None].astype(np.float32), img2[None].astype(np.float32), 1.0, 32
        )
        variables = model.init(
            jax.random.PRNGKey(0), lp, rp, iters=1, dense_grid=(ys, xs),
            scale=jnp.asarray([s]), mode="eval",
        )
        rep = tmp_path / "report"
        validate_dataset(
            model, variables["params"], ds, valid_iters=1, divis=32,
            max_images=1, report_dir=str(rep), dump_images=True,
        )
        txt = (rep / "result.txt").read_text()
        assert "epe=" in txt and "summary" in txt
        pngs = list((rep / "output").glob("*.png"))
        assert len(pngs) == 2  # disparity + error map


class TestOccProviders:
    def test_kitti_occ_provider(self, tmp_path):
        import cv2
        from anystereo_tpu.eval.validate import kitti_occ_provider
        from anystereo_tpu.data.datasets import StereoDataset
        from anystereo_tpu.data.frame_utils import read_disp_kitti

        occ = np.zeros((6, 8), np.uint16)
        noc = np.zeros((6, 8), np.uint16)
        occ[2, 3] = 1000  # valid in occ GT only → occluded pixel
        occ[4, 5] = 500
        noc[4, 5] = 500  # agrees → non-occluded
        p_occ = str(tmp_path / "disp_occ_0"); os.makedirs(p_occ)
        p_noc = str(tmp_path / "disp_noc_0"); os.makedirs(p_noc)
        cv2.imwrite(p_occ + "/000000_10.png", occ)
        cv2.imwrite(p_noc + "/000000_10.png", noc)
        ds = StereoDataset(reader=read_disp_kitti, sparse=True)
        ds.disparity_list = [p_occ + "/000000_10.png"]
        mask = kitti_occ_provider(ds, 0)
        assert mask[2, 3] and not mask[4, 5]
        assert mask.sum() == 1

    def test_nocc_provider_from_tuple_reader(self, tmp_path):
        from anystereo_tpu.eval.validate import nocc_mask_occ_provider
        from anystereo_tpu.data.datasets import StereoDataset

        nocc = np.zeros((4, 4), bool)
        nocc[1:3, 1:3] = True

        def reader(path):
            return np.ones((4, 4), np.float32), nocc

        ds = StereoDataset(reader=reader, sparse=True)
        ds.disparity_list = ["dummy"]
        occ = nocc_mask_occ_provider(ds, 0)
        assert occ.sum() == 16 - 4
        assert not occ[1, 1]

    def test_nocc_provider_eth3d_layout(self, tmp_path):
        """ETH3D: reader returns a bare PFM array; the provider must read
        mask0nocc.png beside disp0GT.pfm (evaluation_validate.py:161-166)."""
        from PIL import Image

        from anystereo_tpu.data.datasets import ETH3D
        from anystereo_tpu.data.frame_utils import write_pfm
        from anystereo_tpu.eval.validate import nocc_mask_occ_provider

        h, w = 6, 8
        scene = tmp_path / "two_view_training_gt" / "scene_1"
        scene.mkdir(parents=True)
        imdir = tmp_path / "two_view_training" / "scene_1"
        imdir.mkdir(parents=True)
        for name in ("im0.png", "im1.png"):
            Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(imdir / name)
        write_pfm(str(scene / "disp0GT.pfm"), np.ones((h, w), np.float32))
        nocc = np.full((h, w), 255, np.uint8)
        nocc[0, :3] = 0  # 3 occluded pixels
        Image.fromarray(nocc).save(scene / "mask0nocc.png")

        ds = ETH3D(str(tmp_path))
        assert len(ds.disparity_list) == 1
        occ = nocc_mask_occ_provider(ds, 0)
        assert occ is not None, "ETH3D occlusion mask must be available"
        assert occ.sum() == 3 and occ[0, 0] and not occ[1, 1]

    def test_eth3d_validation_emits_occ_metrics(self, tmp_path):
        """End-to-end: validate_dataset over a synthetic ETH3D tree must
        emit occ/noc metric columns (round-1 defect: they silently
        vanished because the provider returned None)."""
        from PIL import Image

        import jax
        import jax.numpy as jnp

        from anystereo_tpu.config import ModelConfig
        from anystereo_tpu.data.datasets import ETH3D
        from anystereo_tpu.data.frame_utils import write_pfm
        from anystereo_tpu.eval.validate import (
            nocc_mask_occ_provider,
            validate_dataset,
        )
        from anystereo_tpu.nn.model import AnyStereo

        h, w = 40, 64
        rng = np.random.RandomState(5)
        scene = tmp_path / "two_view_training_gt" / "scene_1"
        scene.mkdir(parents=True)
        imdir = tmp_path / "two_view_training" / "scene_1"
        imdir.mkdir(parents=True)
        for name in ("im0.png", "im1.png"):
            Image.fromarray(
                (rng.rand(h, w, 3) * 255).astype(np.uint8)
            ).save(imdir / name)
        write_pfm(str(scene / "disp0GT.pfm"), np.full((h, w), 2.0, np.float32))
        nocc = np.full((h, w), 255, np.uint8)
        nocc[:4] = 0
        Image.fromarray(nocc).save(scene / "mask0nocc.png")

        ds = ETH3D(str(tmp_path))
        model = AnyStereo(ModelConfig(max_disp=32))
        left = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(
            lambda k: model.init(k, left, left, iters=1, mode="eval")
        )(jax.random.PRNGKey(0))
        results = validate_dataset(
            model, variables["params"], ds, valid_iters=2,
            occ_provider=nocc_mask_occ_provider,
        )
        keys = set(results)
        assert any("occ" in k for k in keys), keys
        assert any("noc" in k for k in keys), keys


class TestTrainValidateHook:
    def test_make_train_validate_fn(self, tmp_path):
        """The in-training validation hook (train_continuous_IGEV.py:242-264)
        built from a dataset name runs with current params and returns
        metrics."""
        from types import SimpleNamespace

        from PIL import Image

        import jax
        import jax.numpy as jnp

        from anystereo_tpu.config import ModelConfig
        from anystereo_tpu.data.frame_utils import write_pfm
        from anystereo_tpu.eval.validate import make_train_validate_fn
        from anystereo_tpu.nn.model import AnyStereo

        h, w = 40, 64
        rng = np.random.RandomState(6)
        scene = tmp_path / "two_view_training_gt" / "scene_1"
        scene.mkdir(parents=True)
        imdir = tmp_path / "two_view_training" / "scene_1"
        imdir.mkdir(parents=True)
        for name in ("im0.png", "im1.png"):
            Image.fromarray(
                (rng.rand(h, w, 3) * 255).astype(np.uint8)
            ).save(imdir / name)
        write_pfm(str(scene / "disp0GT.pfm"), np.full((h, w), 2.0, np.float32))
        nocc = np.full((h, w), 255, np.uint8)
        Image.fromarray(nocc).save(scene / "mask0nocc.png")

        model = AnyStereo(ModelConfig(max_disp=32))
        left = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(
            lambda k: model.init(k, left, left, iters=1, mode="eval")
        )(jax.random.PRNGKey(0))
        fn = make_train_validate_fn(model, "eth3d", str(tmp_path), valid_iters=2)
        results = fn(SimpleNamespace(params=variables["params"]), step=10)
        assert "epe_all" in results or any("epe" in k for k in results), results
        assert all(np.isfinite(v) for v in results.values())


class TestQuarterNearestValidation:
    def test_validator_falls_back_to_query_path(self, tmp_path):
        """quarter_nearest models cannot use the separable dense-grid
        decode; the Validator must route them through the query path so
        the standard eval tooling works for every live config."""
        from tests.test_data import _synthetic_dataset
        from anystereo_tpu.config import LiifConfig
        from anystereo_tpu.eval.validate import Validator, pad_for_queries

        ds = _synthetic_dataset(tmp_path, n=1, h=44, w=72)
        ds.augmentor = None
        cfg = ModelConfig(
            max_disp=32, liif=LiifConfig(quarter_nearest="only_disp")
        )
        model = AnyStereo(cfg)
        img1, img2, _, _ = ds._load_raw(0)
        lp, rp, coords, s = pad_for_queries(
            img1[None].astype(np.float32), img2[None].astype(np.float32),
            1.0, 32,
        )
        variables = model.init(
            jax.random.PRNGKey(0), lp, rp, iters=1, coords=coords,
            scale=jnp.asarray([s]),
        )
        v = Validator(model, variables["params"], valid_iters=2)
        disp = v.infer(img1.astype(np.float32), img2.astype(np.float32))
        assert disp.shape == img1.shape[:2]
        assert np.isfinite(disp).all()


def _synthetic_middeval3(root, h=40, w=64):
    """MiddEval3 trainingF layout with GT that has inf holes AND occluded
    pixels that carry GT — the configuration that exposes valid-mask/nocc
    conflation (evaluation_validate.py:479-483 semantics)."""
    from PIL import Image

    from anystereo_tpu.data.frame_utils import write_pfm

    rng = np.random.RandomState(7)
    scene = root / "MiddEval3" / "trainingF" / "scene1"
    scene.mkdir(parents=True)
    for name in ("im0.png", "im1.png"):
        Image.fromarray(
            (rng.rand(h, w, 3) * 255).astype(np.uint8)
        ).save(scene / name)
    gt = np.full((h, w), 3.0, np.float32)
    gt[:2, :] = np.inf  # no GT at all (excluded from every mask)
    nocc = np.full((h, w), 255, np.uint8)
    nocc[10:20, :] = 128  # occluded (mask != 255) but GT IS present
    write_pfm(str(scene / "disp0GT.pfm"), gt)
    Image.fromarray(nocc).save(scene / "mask0nocc.png")
    return root


class TestMiddleburyProtocol:
    def test_all_includes_occluded_and_occ_columns_emitted(self, tmp_path):
        """The reference's Middlebury valid mask is
        `(valid_gt>=-0.5)&(disp_gt<1000)` over ALL pixels
        (evaluation_validate.py:480-482) — occluded pixels with GT count
        in the "all" metrics, and the occ/noc columns must both appear.
        Conflating validity with the reader's nocc mask makes "all"
        noc-only and the occ subset provably empty."""
        from anystereo_tpu.eval.validate import build_eval_dataset

        root = _synthetic_middeval3(tmp_path)
        ds, fixed_upscale, occ_provider, valid_from_gt = build_eval_dataset(
            "middlebury_F", str(root)
        )
        assert valid_from_gt, "Middlebury must derive validity from GT"
        assert fixed_upscale is None
        assert len(ds) == 1
        model = AnyStereo(ModelConfig(max_disp=32))
        left = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(
            lambda k: model.init(k, left, left, iters=1, mode="eval")
        )(jax.random.PRNGKey(0))
        results = validate_dataset(
            model, variables["params"], ds, valid_iters=2,
            occ_provider=occ_provider, valid_from_gt=valid_from_gt,
        )
        for key in ("epe", "epe_occ", "epe_noc", "d1", "d1_occ", "d1_noc"):
            assert key in results, (key, sorted(results))
        # inf GT holes must not poison the masked means (inf*0 = NaN)
        assert all(np.isfinite(v) for v in results.values()), results
        # occluded pixels carry GT, so "all" must differ from noc-only
        assert results["epe"] != results["epe_noc"]

    def test_occ_all_noc_mask_accounting(self, tmp_path):
        """Pixel-level accounting: all = finite∧<1000 (38 of 40 rows);
        occ = all∧(mask0nocc≠255) (10 rows); noc = the remaining 28."""
        from anystereo_tpu.eval.validate import (
            build_eval_dataset,
            nocc_mask_occ_provider,
        )

        root = _synthetic_middeval3(tmp_path, h=40, w=64)
        ds, _, occ_provider, _ = build_eval_dataset("middlebury_F", str(root))
        _, _, flow, _ = ds._load_raw(0)
        gt = flow[..., 0]
        vmask = np.isfinite(gt) & (gt > 0) & (gt < 1000.0)
        occ = occ_provider(ds, 0)
        assert vmask.sum() == 38 * 64
        assert (vmask & occ).sum() == 10 * 64
        assert (vmask & ~occ).sum() == 28 * 64

    def test_middlebury_2014_has_no_occ_provider_mask(self, tmp_path):
        """Middlebury 2014 ships disp0.pfm with NO mask0nocc — the
        provider must return None, not mislabel the disp<1e3 validity
        tuple as an occlusion split."""
        from PIL import Image

        from anystereo_tpu.data.datasets import Middlebury
        from anystereo_tpu.data.frame_utils import write_pfm
        from anystereo_tpu.eval.validate import nocc_mask_occ_provider

        scene = tmp_path / "2014" / "scene1"
        scene.mkdir(parents=True)
        for name in ("im0.png", "im1.png", "im1E.png", "im1L.png"):
            Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(scene / name)
        write_pfm(str(scene / "disp0.pfm"), np.ones((4, 4), np.float32))
        ds = Middlebury(str(tmp_path), split="2014")
        assert len(ds) == 3  # E/L/plain exposure variants
        assert nocc_mask_occ_provider(ds, 0) is None


class TestEvalOthers:
    def test_bicubic_upscale_comparison_path(self, tmp_path):
        """multi_evaothers (pad_for_muti_other, evaluation_validate.py:
        109-118 + :147-154): downscale by scale_test, plain inference,
        disparity x scale_test, bicubic back to the original grid."""
        cfg = ModelConfig(max_disp=32)
        model = AnyStereo(cfg)
        rng = np.random.RandomState(3)
        img1 = (rng.rand(40, 64, 3) * 255).astype(np.float32)
        img2 = (rng.rand(40, 64, 3) * 255).astype(np.float32)
        left = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = jax.jit(
            lambda k: model.init(k, left, left, iters=1, mode="eval")
        )(jax.random.PRNGKey(0))
        v = Validator(model, variables["params"], valid_iters=1)
        out = v.infer(img1, img2, scale_test=2.0, divis=32, eval_others=True)
        assert out.shape == (40, 64)
        assert np.isfinite(out).all()
        # the LR inference ran at ceil(40/2) x ceil(64/2) = one cached fn
        (shape_key, _), = v._fns
        assert shape_key[1] == 32 and shape_key[2] == 32


class TestShapeBucketing:
    def test_one_compile_per_bucket_and_metrics_stable(self, tmp_path):
        """Mixed-size images that round to the same 64-bucket must reuse
        ONE jitted fn, and the bucketed metrics must match the per-shape
        protocol closely (replicate-edge padding only adds border
        context)."""
        from PIL import Image

        from anystereo_tpu.data.datasets import StereoDataset
        from anystereo_tpu.data.frame_utils import write_pfm

        rng = np.random.RandomState(11)
        ds = StereoDataset(sparse=True, reader=None)
        ds.reader = None
        # two different sizes, both <= (64, 128) after rounding up
        sizes = [(44, 72), (52, 96)]
        disp_paths = []
        for i, (h, w) in enumerate(sizes):
            d = tmp_path / f"img{i}"
            d.mkdir()
            for name in ("im0.png", "im1.png"):
                Image.fromarray(
                    (rng.rand(h, w, 3) * 255).astype(np.uint8)
                ).save(d / name)
            write_pfm(str(d / "disp.pfm"), np.full((h, w), 2.0, np.float32))
            ds.image_list.append([str(d / "im0.png"), str(d / "im1.png")])
            ds.disparity_list.append(str(d / "disp.pfm"))
        from anystereo_tpu.data import frame_utils

        ds.reader = frame_utils.read_gen

        model = AnyStereo(ModelConfig(max_disp=32))
        left = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(
            lambda k: model.init(k, left, left, iters=1, mode="eval")
        )(jax.random.PRNGKey(0))

        res_plain = validate_dataset(
            model, variables["params"], ds, valid_iters=2, divis=32
        )
        vd = Validator(model, variables["params"], valid_iters=2, bucket=64)
        assert len({tuple(s) for s in sizes}) == 2
        meter_keys = None
        for i in range(2):
            img1, img2, _, _ = ds._load_raw(i)
            out = vd.infer(img1, img2, divis=32)
            assert out.shape == img1.shape[:2]
        assert len(vd._fns) == 1, "both sizes must share one compiled fn"

        res_bucket = validate_dataset(
            model, variables["params"], ds, valid_iters=2, divis=32, bucket=64
        )
        assert set(res_bucket) == set(res_plain)
        # border-context effect only: the random-weight model is the
        # worst case and still stays within a few percent
        assert abs(res_bucket["epe"] - res_plain["epe"]) <= max(
            0.05 * abs(res_plain["epe"]), 0.05
        ), (res_bucket["epe"], res_plain["epe"])
