"""Generate synthetic on-disk dataset trees matching the real
SceneFlow/KITTI/Middlebury/ETH3D layouts (the exact glob patterns the
dataset classes in data/datasets.py use, which mirror the reference's
stereo_datasets.py:252-540), so the full baseline-reproduction pipeline
(tools/reproduce_baseline.py: train → ckpt → evaluate all 9 protocols →
markdown) can be dress-rehearsed end-to-end without the real datasets.

Pairs are textured images warped by a smooth disparity field (right =
warp(left)), so a trained model produces meaningful (non-garbage) EPEs.

  PYTHONPATH=. python tools/make_synthetic_datasets.py --out /tmp/synth_data
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_pair(rng, h, w, dmin=4.0, dmax=14.0):
    """(left, right, disp): textured pair with right = warp(left, disp)."""
    import cv2

    margin = int(np.ceil(dmax)) + 10
    tex = cv2.GaussianBlur(rng.rand(h, w + margin, 3).astype(np.float32),
                           (0, 0), 1.2)
    tex = (tex - tex.min()) / (tex.max() - tex.min()) * 255
    dgrid = cv2.GaussianBlur(rng.rand(h, w).astype(np.float32), (0, 0), 12)
    dgrid = dmin + (dmax - dmin) * (
        (dgrid - dgrid.min()) / max(float(np.ptp(dgrid)), 1e-6)
    )
    left = tex[:, margin:]
    xs = np.arange(w)[None, :] + margin - dgrid
    ys = np.tile(np.arange(h)[:, None], (1, w)).astype(np.float32)
    right = np.stack(
        [cv2.remap(tex[..., c], xs.astype(np.float32), ys, cv2.INTER_LINEAR)
         for c in range(3)],
        axis=-1,
    )
    return left.astype(np.uint8), right.astype(np.uint8), dgrid.astype(np.float32)


def _save_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _save_pfm(path, arr):
    from anystereo_tpu.data.frame_utils import write_pfm

    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_pfm(path, arr)


def _save_kitti_disp(path, disp):
    """KITTI sparse uint16 PNG: disp*256, 0 = invalid."""
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, (disp * 256.0).astype(np.uint16))


def gen_sceneflow(root, rng, n_train=4, n_test=4, h=200, w=400):
    # >= the reference train recipe's 160x320 crop so the augmentor can
    # crop without padding
    """frames_finalpass/{TRAIN,TEST}/A/0000/left/NNNN.png + disparity twin
    (SceneFlowDataset._add_things glob: {split}/*/*/left/*.png)."""
    for split, n in (("TRAIN", n_train), ("TEST", n_test)):
        for i in range(n):
            l, r, d = make_pair(rng, h, w)
            base = os.path.join(root, "frames_finalpass", split, "A", "0000")
            _save_png(os.path.join(base, "left", f"{i:04d}.png"), l)
            _save_png(os.path.join(base, "right", f"{i:04d}.png"), r)
            _save_pfm(
                os.path.join(root, "disparity", split, "A", "0000", "left",
                             f"{i:04d}.pfm"), d)


def gen_kitti15(root, rng, n=3, h=120, w=376):
    """training/image_2|image_3|disp_occ_0 (+disp_noc_0 for the occ split)."""
    for i in range(n):
        l, r, d = make_pair(rng, h, w)
        name = f"{i:06d}_10.png"
        _save_png(os.path.join(root, "training", "image_2", name), l)
        _save_png(os.path.join(root, "training", "image_3", name), r)
        occ = d.copy()
        occ[rng.rand(h, w) < 0.3] = 0  # sparse GT
        noc = occ.copy()
        noc[:, : w // 8] = 0  # a band valid only in the occ GT
        _save_kitti_disp(os.path.join(root, "training", "disp_occ_0", name), occ)
        _save_kitti_disp(os.path.join(root, "training", "disp_noc_0", name), noc)


def gen_kitti12(root, rng, n=3, h=120, w=376):
    """training/colored_0|colored_1|disp_occ (+disp_noc)."""
    for i in range(n):
        l, r, d = make_pair(rng, h, w)
        name = f"{i:06d}_10.png"
        _save_png(os.path.join(root, "training", "colored_0", name), l)
        _save_png(os.path.join(root, "training", "colored_1", name), r)
        occ = d.copy()
        occ[rng.rand(h, w) < 0.3] = 0
        noc = occ.copy()
        noc[:, : w // 8] = 0
        _save_kitti_disp(os.path.join(root, "training", "disp_occ", name), occ)
        _save_kitti_disp(os.path.join(root, "training", "disp_noc", name), noc)


def gen_middlebury(root, rng, scenes=("scene_a", "scene_b"), hf=192, wf=256):
    """MiddEval3/training{F,H,Q}/<scene>/{im0,im1}.png + disp0GT.pfm +
    mask0nocc.png, with F/H/Q at full/half/quarter resolution and the F GT
    exactly 2x the H / 4x the Q image size (the Q_F/H_F fixed-upscale
    protocols divide these)."""
    import cv2

    for scene in scenes:
        lf, rf, df = make_pair(rng, hf, wf, dmax=20.0)
        for split, s in (("F", 1), ("H", 2), ("Q", 4)):
            h, w = hf // s, wf // s
            l = cv2.resize(lf, (w, h), interpolation=cv2.INTER_AREA)
            r = cv2.resize(rf, (w, h), interpolation=cv2.INTER_AREA)
            d = cv2.resize(df, (w, h), interpolation=cv2.INTER_AREA) / s
            base = os.path.join(root, "MiddEval3", f"training{split}", scene)
            _save_png(os.path.join(base, "im0.png"), l)
            _save_png(os.path.join(base, "im1.png"), r)
            gt = d.copy()
            gt[: h // 10] = np.inf  # missing-GT band (PFM inf convention)
            _save_pfm(os.path.join(base, "disp0GT.pfm"), gt)
            nocc = np.full((h, w), 255, np.uint8)
            nocc[:, : w // 6] = 128  # occluded band WITH GT
            _save_png(os.path.join(base, "mask0nocc.png"), nocc)


def gen_eth3d(root, rng, scenes=("playground_1l", "forest_2s"), h=120, w=224):
    """two_view_training/<scene>/im{0,1}.png +
    two_view_training_gt/<scene>/disp0GT.pfm + mask0nocc.png."""
    for scene in scenes:
        l, r, d = make_pair(rng, h, w)
        imdir = os.path.join(root, "two_view_training", scene)
        gtdir = os.path.join(root, "two_view_training_gt", scene)
        _save_png(os.path.join(imdir, "im0.png"), l)
        _save_png(os.path.join(imdir, "im1.png"), r)
        gt = d.copy()
        gt[: h // 10] = np.inf
        _save_pfm(os.path.join(gtdir, "disp0GT.pfm"), gt)
        nocc = np.full((h, w), 255, np.uint8)
        nocc[:, : w // 6] = 0
        _save_png(os.path.join(gtdir, "mask0nocc.png"), nocc)


def generate_all(out: str, seed: int = 0, sceneflow_n: int = 4):
    rng = np.random.RandomState(seed)
    gen_sceneflow(out, rng, n_train=sceneflow_n, n_test=sceneflow_n)
    gen_kitti15(out, rng)
    gen_kitti12(out, rng)
    gen_middlebury(out, rng)
    gen_eth3d(out, rng)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sceneflow-n", type=int, default=4)
    args = ap.parse_args()
    generate_all(args.out, args.seed, args.sceneflow_n)
    # sanity: every dataset class must see its files
    from anystereo_tpu.eval.validate import build_eval_dataset

    for key in ("sceneflow", "kitti15", "kitti12", "eth3d", "middlebury_F",
                "middlebury_H", "middlebury_Q", "middlebury_Q_F",
                "middlebury_H_F"):
        ds, *_ = build_eval_dataset(key, args.out)
        print(f"{key:16s} {len(ds)} images")
        assert len(ds) > 0, key


if __name__ == "__main__":
    main()
