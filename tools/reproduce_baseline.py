"""Reproduce the reference's training recipe and generate BASELINE.md rows.

The reference publishes no benchmark numbers (SURVEY.md §6); the acceptance
protocol is therefore self-generated: run the reference's pinned 100k-step
recipe (train_continuous_IGEV.py:125-134,291-301 — AdamW lr 2e-4 wd 1e-5,
OneCycle, batch 2, 16 train / 32 valid iters, grad-clip 1.0, max_disp 192)
on SceneFlow, then evaluate every dataset protocol the reference defines
(evaluation_validate.py:121-533) and emit the metric table rows that
BASELINE.md's "to be measured" section is waiting for.

Stages (each skippable so partial runs resume):

  python tools/reproduce_baseline.py --data-root /datasets \
      [--ckpt ckpts/ref-repro]        # train if the ckpt dir is empty
      [--skip-train]                  # eval-only from an existing ckpt
      [--datasets sceneflow kitti15]  # subset of eval protocols
      [--out BASELINE_measured.md]

Measured on one TPU v5e the recipe runs ~242 ms/step => ~6.7 h for 100k
steps (BASELINE.md).  The eval stage alone takes minutes per dataset.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_PROTOCOLS = [
    # (name, dataset key, scale_test, note)
    ("SceneFlow EPE (finalpass TEST, seed-1000 subset)", "sceneflow", 1.0, ""),
    ("KITTI-2015 D1-all", "kitti15", 1.0, "occ/noc from disp_occ vs disp_noc"),
    ("KITTI-2012 D1-all", "kitti12", 1.0, ""),
    ("ETH3D EPE/D1", "eth3d", 1.0, "occ/noc from mask0nocc.png"),
    ("Middlebury Q EPE/D1", "middlebury_Q", 1.0, ""),
    ("Middlebury H EPE/D1", "middlebury_H", 1.0, ""),
    ("Middlebury F EPE/D1", "middlebury_F", 1.0, "full res; spatial tiling via tools/tiled_infer.py if OOM"),
    ("Middlebury Q->F (x4 arbitrary-scale)", "middlebury_Q_F", 1.0, "fixed-upscale protocol evaluation_validate.py:430-436"),
    ("Middlebury H->F (x2 arbitrary-scale)", "middlebury_H_F", 1.0, "fixed-upscale protocol evaluation_validate.py:453-462"),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True,
                   help="directory containing sceneflow/, kitti15/, ... trees")
    p.add_argument("--ckpt", default="ckpts/ref-repro")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--num-steps", type=int, default=100_000)
    p.add_argument("--datasets", nargs="+", default=None,
                   help="subset of eval dataset keys (default: all available)")
    p.add_argument("--valid-iters", type=int, default=32)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--out", default="BASELINE_measured.md")
    args = p.parse_args()

    from anystereo_tpu.config import Config, ModelConfig, TrainConfig
    from anystereo_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    model_cfg = ModelConfig(max_disp=192, corr_levels=2, corr_radius=4)

    # ---- stage 1: train the reference recipe (resumable via Orbax) -----
    have_ckpt = os.path.isdir(args.ckpt) and any(
        d.isdigit() for d in os.listdir(args.ckpt)
    ) if os.path.isdir(args.ckpt) else False
    if not args.skip_train and not have_ckpt:
        from anystereo_tpu.data.augment import AugmentorConfig
        from anystereo_tpu.data.datasets import fetch_dataset
        from anystereo_tpu.data.loader import PrefetchLoader
        from anystereo_tpu.train.trainer import train

        cfg = Config(
            model=model_cfg,
            train=TrainConfig(
                lr=2e-4,
                num_steps=args.num_steps,
                batch_size=2,
                train_iters=16,
                multi_scale=True,
                inp_size=(160, 320),
                scale_min=1.0,
                scale_max=2.95,
                supervise_init=True,
                ckpt_dir=args.ckpt,
            ),
        )
        roots = {k: args.data_root for k in ("sceneflow",)}
        dataset = fetch_dataset(
            ["sceneflow"], roots,
            AugmentorConfig(crop_size=(160, 320), yjitter=True),
            multi_scale=True, scale_min=1.0, scale_max=2.95,
            inp_size=(160, 320),
        )
        loader = PrefetchLoader(dataset, 2, num_workers=8, seed=cfg.train.seed)
        print(f"training reference recipe: {args.num_steps} steps "
              f"-> {args.ckpt}", flush=True)
        train(cfg, loader)
    else:
        print(f"skipping training (ckpt {'found' if have_ckpt else 'skipped'})")

    # ---- stage 2: run every eval protocol and collect rows -------------
    from anystereo_tpu.eval.validate import build_eval_dataset, run_validation

    rows = []
    for title, key, scale_test, note in EVAL_PROTOCOLS:
        if args.datasets and key not in args.datasets:
            continue
        try:
            ds, *_ = build_eval_dataset(key, args.data_root)
            if len(ds) == 0:
                print(f"[skip] {key}: no images under {args.data_root}", flush=True)
                continue
        except (FileNotFoundError, AssertionError) as e:
            print(f"[skip] {key}: {e}", flush=True)
            continue
        try:
            res = run_validation(
                model_cfg=model_cfg,
                ckpt_dir=args.ckpt,
                dataset=key,
                data_root=args.data_root,
                valid_iters=args.valid_iters,
                scale_test=scale_test,
                max_images=args.max_images,
            )
        except FileNotFoundError as e:
            print(f"[skip] {key}: dataset not found ({e})", flush=True)
            continue
        except Exception as e:  # keep going; report what failed
            print(f"[FAIL] {key}: {type(e).__name__}: {e}", flush=True)
            continue
        val = ", ".join(f"{k}={v:.4f}" for k, v in sorted(res.items()))
        rows.append(f"| {title} | {val} | TPU v5e x1 | {note} |")
        print(rows[-1], flush=True)

    # ---- stage 3: write the table ---------------------------------------
    if rows:
        with open(args.out, "w") as f:
            f.write("# Measured reference-recipe results (generated by "
                    "tools/reproduce_baseline.py)\n\n")
            f.write("| Metric | Value | Hardware | Notes |\n|---|---|---|---|\n")
            f.write("\n".join(rows) + "\n")
        print(f"wrote {len(rows)} rows to {args.out} — paste into BASELINE.md")
    else:
        print("no datasets evaluated (none mounted?)")


if __name__ == "__main__":
    main()
