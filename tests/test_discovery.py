"""Dataset path-discovery tests on synthetic directory trees mirroring the
reference's glob layouts (stereo_datasets.py:252-484)."""

import os

import numpy as np
import pytest


def _touch_png(path):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((4, 6, 3), np.uint8)).save(path)


def _touch_pfm(path):
    from anystereo_tpu.data.frame_utils import write_pfm

    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_pfm(path, np.ones((4, 6), np.float32))


class TestSceneFlowDiscovery:
    def test_things_monkaa_driving_globs(self, tmp_path):
        from anystereo_tpu.data.datasets import SceneFlowDataset

        root = str(tmp_path)
        # FlyingThings: dstype/TRAIN/*/*/left/*.png
        _touch_png(f"{root}/frames_finalpass/TRAIN/A/0001/left/0006.png")
        _touch_png(f"{root}/frames_finalpass/TRAIN/A/0001/right/0006.png")
        _touch_pfm(f"{root}/disparity/TRAIN/A/0001/left/0006.pfm")
        # Monkaa: dstype/TRAIN/*/left/*.png
        _touch_png(f"{root}/frames_finalpass/TRAIN/scene/left/0001.png")
        _touch_png(f"{root}/frames_finalpass/TRAIN/scene/right/0001.png")
        _touch_pfm(f"{root}/disparity/TRAIN/scene/left/0001.pfm")
        # Driving: dstype/TRAIN/*/*/*/left/*.png
        _touch_png(f"{root}/frames_finalpass/TRAIN/f/15mm/fast/left/0400.png")
        _touch_png(f"{root}/frames_finalpass/TRAIN/f/15mm/fast/right/0400.png")
        _touch_pfm(f"{root}/disparity/TRAIN/f/15mm/fast/left/0400.pfm")

        ds = SceneFlowDataset(root, aug=None)
        # Things pattern (*/*/left) also matches the Driving 4-level dirs'
        # sub-paths? No: TRAIN/*/*/left has exactly 2 levels — only A/0001.
        assert len(ds) == 3
        left, right = ds.image_list[0]
        assert "/left/" in left and "/right/" in right
        assert ds.disparity_list[0].endswith(".pfm")
        img1, img2, flow, valid = ds._load_raw(0)
        assert flow.shape == (4, 6, 2)

    def test_things_test_split_uses_seed_1000(self, tmp_path):
        from anystereo_tpu.data.datasets import SceneFlowDataset

        root = str(tmp_path)
        for i in range(3):
            _touch_png(f"{root}/frames_finalpass/TEST/A/{i:04d}/left/0.png")
            _touch_png(f"{root}/frames_finalpass/TEST/A/{i:04d}/right/0.png")
            _touch_pfm(f"{root}/disparity/TEST/A/{i:04d}/left/0.pfm")
        ds = SceneFlowDataset(root, aug=None, things_test=True)
        # reference takes set(permutation(N)) = every index (SURVEY note)
        assert len(ds) == 3


class TestKittiDiscovery:
    def _mk_kitti(self, tmp_path, year, n):
        import cv2

        if year == 2015:
            img_l, img_r, disp = "image_2", "image_3", "disp_occ_0"
        else:
            img_l, img_r, disp = "colored_0", "colored_1", "disp_occ"
        root = str(tmp_path / f"k{year}")
        for i in range(n):
            _touch_png(f"{root}/training/{img_l}/{i:06d}_10.png")
            _touch_png(f"{root}/training/{img_r}/{i:06d}_10.png")
            os.makedirs(f"{root}/training/{disp}", exist_ok=True)
            cv2.imwrite(
                f"{root}/training/{disp}/{i:06d}_10.png",
                (np.ones((4, 6)) * 256).astype(np.uint16),
            )
        return root

    def test_mixed_modes_partition(self, tmp_path):
        from anystereo_tpu.data.datasets import KittiMixed

        r12 = self._mk_kitti(tmp_path, 2012, 20)
        r15 = self._mk_kitti(tmp_path, 2015, 25)
        full = KittiMixed(r12, r15, aug=None, mode="mix_train_all")
        train = KittiMixed(r12, r15, aug=None, mode="mix_train")
        v12 = KittiMixed(r12, r15, aug=None, mode="valid_12")
        v15 = KittiMixed(r12, r15, aug=None, mode="valid_15")
        assert len(full) == 45
        assert len(v12) == min(14, 20) and len(v15) == 20
        assert len(train) + len(v12) + len(v15) == len(full)
        # held-out sets are disjoint from the train set
        train_set = {tuple(p) for p in train.image_list}
        for held in (v12, v15):
            for p in held.image_list:
                assert tuple(p) not in train_set


class TestMiddleburyDiscovery:
    def test_middeval3_and_2014_variants(self, tmp_path):
        from anystereo_tpu.data.datasets import Middlebury

        root = str(tmp_path)
        for name in ("Adirondack", "Jadeplant"):
            for split in ("F", "Q"):
                _touch_png(f"{root}/MiddEval3/training{split}/{name}/im0.png")
                _touch_png(f"{root}/MiddEval3/training{split}/{name}/im1.png")
                _touch_pfm(f"{root}/MiddEval3/training{split}/{name}/disp0GT.pfm")
        ds_f = Middlebury(root, aug=None, split="F")
        ds_q = Middlebury(root, aug=None, split="Q")
        assert len(ds_f) == 2 and len(ds_q) == 2
        # 2014 with E/L exposure variants (stereo_datasets.py:470-475)
        for s in ("E", "L", ""):
            _touch_png(f"{root}/2014/Scene1/im1{s}.png")
        _touch_png(f"{root}/2014/Scene1/im0.png")
        _touch_pfm(f"{root}/2014/Scene1/disp0.pfm")
        ds14 = Middlebury(root, aug=None, split="2014")
        assert len(ds14) == 3  # one per exposure variant


class TestETH3DDiscovery:
    def test_non_training_split_uses_dummy_gt(self, tmp_path):
        """split != 'training' has no GT: every image pairs with the fixed
        dummy GT (stereo_datasets.py:323) — zipping against training GTs
        would pair unrelated scenes."""
        from anystereo_tpu.data.datasets import ETH3D

        root = str(tmp_path)
        for scene in ("lakeside", "sandbox"):
            _touch_png(f"{root}/two_view_testing/{scene}/im0.png")
            _touch_png(f"{root}/two_view_testing/{scene}/im1.png")
        # one unrelated training-GT scene that must NOT be zipped in
        _touch_pfm(f"{root}/two_view_training_gt/delivery_area/disp0GT.pfm")
        ds = ETH3D(root, aug=None, split="testing")
        assert len(ds) == 2
        assert all("playground_1l" in d for d in ds.disparity_list)

    def test_training_split_pairs_real_gt(self, tmp_path):
        from anystereo_tpu.data.datasets import ETH3D

        root = str(tmp_path)
        for scene in ("lakeside", "sandbox"):
            _touch_png(f"{root}/two_view_training/{scene}/im0.png")
            _touch_png(f"{root}/two_view_training/{scene}/im1.png")
            _touch_pfm(f"{root}/two_view_training_gt/{scene}/disp0GT.pfm")
        ds = ETH3D(root, aug=None, split="training")
        assert len(ds) == 2
        assert "lakeside" in ds.disparity_list[0]


class TestFetchDataset:
    def test_name_mapping_and_replication(self, tmp_path):
        from anystereo_tpu.data.augment import AugmentorConfig
        from anystereo_tpu.data.datasets import fetch_dataset

        root = str(tmp_path)
        _touch_png(f"{root}/frames_finalpass/TRAIN/A/0001/left/0.png")
        _touch_png(f"{root}/frames_finalpass/TRAIN/A/0001/right/0.png")
        _touch_pfm(f"{root}/disparity/TRAIN/A/0001/left/0.pfm")
        roots = {"sceneflow": root}
        ds = fetch_dataset(["sceneflow"], roots, AugmentorConfig())
        assert len(ds) == 1
