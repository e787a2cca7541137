"""Zero-activation-energy gate for the real-data accuracy campaign.

No dataset has ever been mounted in the build environment (BASELINE.md's
accuracy rows are all "to be measured").  The moment a /datasets mount
appears, this tool turns it into a running campaign in one command:

  python tools/check_datasets.py --data-root /datasets [--smoke]

For every dataset protocol the reference defines (stereo_datasets.py:
252-540 glob layouts) it:
  1. resolves the dataset under the root (probing common subdirectory
     aliases), reports the sample count and the expected tree when absent;
  2. verifies the first sample actually decodes (images + GT reader);
  3. with --smoke: runs a 5-image eval smoke (random weights — checks the
     protocol machinery, not accuracy) and a 20-step train smoke on the
     first available training set;
  4. prints the exact reproduce_baseline.py command for the 100k-step run.

Exit 0 if at least one training dataset and one eval protocol resolve.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# eval protocols (build_eval_dataset keys) and the tree each one expects
EVAL_SPECS = [
    ("sceneflow", "frames_finalpass/TEST/*/*/left/*.png (+ disparity/)"),
    ("kitti15", "training/image_2|image_3|disp_occ_0|disp_noc_0/*_10.png"),
    ("kitti12", "training/colored_0|colored_1|disp_occ|disp_noc/*_10.png"),
    ("middlebury_F", "MiddEval3/trainingF/<scene>/{im0,im1}.png disp0GT.pfm mask0nocc.png"),
    ("middlebury_H", "MiddEval3/trainingH/..."),
    ("middlebury_Q", "MiddEval3/trainingQ/..."),
    ("middlebury_Q_F", "trainingQ inputs + trainingF GT (x4 protocol)"),
    ("middlebury_H_F", "trainingH inputs + trainingF GT (x2 protocol)"),
    ("eth3d", "two_view_training/*/im0.png + two_view_training_gt/*/disp0GT.pfm"),
]

# training sets (fetch_dataset names), first resolvable one used for the smoke
TRAIN_SPECS = [
    ("sceneflow", "frames_finalpass/TRAIN/... + Monkaa + Driving"),
    ("kitti_mix", "KITTI 2012+2015 training trees"),
]

# common per-dataset subdirectory aliases probed in addition to the root
ALIASES = {
    "sceneflow": ("", "sceneflow", "SceneFlow"),
    "kitti15": ("", "kitti15", "Kitti2015", "KITTI2015", "kitti/2015"),
    "kitti12": ("", "kitti12", "Kitti2012/stereoflow", "KITTI2012"),
    "middlebury": ("", "middlebury", "Middlebury"),
    "eth3d": ("", "eth3d", "ETH3D/Stereo", "ETH3D"),
}


def _alias_key(name: str) -> str:
    if name.startswith("middlebury"):
        return "middlebury"
    if name.startswith("kitti_mix"):
        return "kitti15"
    return name if name in ALIASES else "sceneflow"


def _resolve(name: str, data_root: str):
    """Try the root and its aliases; return (dataset, resolved_root) for the
    first candidate with samples, else (None, None)."""
    from anystereo_tpu.eval.validate import build_eval_dataset
    from anystereo_tpu.data.datasets import KittiMixed

    for sub in ALIASES[_alias_key(name)]:
        root = os.path.join(data_root, sub) if sub else data_root
        if not os.path.isdir(root):
            continue
        try:
            if name == "kitti_mix":
                ds = KittiMixed(root, root, aug=None, mode="mix_train")
            else:
                ds, *_ = build_eval_dataset(name, root)
        except Exception:
            continue
        if len(ds) > 0:
            return ds, root
    return None, None


def _decode_first(ds) -> str:
    """Load sample 0 end-to-end; '' on success, error string on failure."""
    try:
        item = ds[0]
        imgs = item["left"], item["right"]
        assert all(i.ndim == 3 and i.shape[-1] == 3 for i in imgs), (
            "bad image shapes"
        )
        return ""
    except Exception:
        return traceback.format_exc(limit=2).strip().splitlines()[-1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/datasets")
    ap.add_argument("--smoke", action="store_true",
                    help="run the 5-image eval + 20-step train smokes")
    args = ap.parse_args()

    if not os.path.isdir(args.data_root):
        print(f"FAIL: {args.data_root} does not exist — mount the datasets "
              "and rerun.", file=sys.stderr)
        return 1

    ok_eval, ok_train = [], []
    print(f"== dataset trees under {args.data_root} ==")
    for name, tree in EVAL_SPECS:
        ds, root = _resolve(name, args.data_root)
        if ds is None:
            print(f"  [absent ] {name:16s} expected: {tree}")
            continue
        err = _decode_first(ds)
        if err:
            print(f"  [BROKEN ] {name:16s} {len(ds)} samples at {root}; "
                  f"sample 0 failed: {err}")
            continue
        print(f"  [ok     ] {name:16s} {len(ds):5d} samples at {root}")
        ok_eval.append((name, root))
    for name, tree in TRAIN_SPECS:
        ds, root = _resolve(name, args.data_root)
        if ds is not None and not _decode_first(ds):
            print(f"  [ok     ] {name:16s} {len(ds):5d} TRAIN samples at {root}")
            ok_train.append((name, root))
        else:
            print(f"  [absent ] {name:16s} expected: {tree}")

    if args.smoke and ok_eval:
        name, root = ok_eval[0]
        print(f"== 5-image eval smoke on {name} (random weights) ==")
        import jax

        from anystereo_tpu.config import ModelConfig
        from anystereo_tpu.nn.model import AnyStereo
        from anystereo_tpu.eval.validate import build_eval_dataset, validate_dataset
        from anystereo_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
        cfg = ModelConfig(max_disp=64)
        model = AnyStereo(cfg)
        ds, fixed_upscale, occ_provider, valid_from_gt = build_eval_dataset(
            name, root
        )
        item = ds[0]
        variables = jax.jit(
            lambda k, l, r: model.init(
                k, l[None], r[None], iters=1,
                coords=jax.numpy.zeros((1, 16, 2)),
                scale=jax.numpy.ones((1,)),
            )
        )(jax.random.PRNGKey(0), item["left"].astype("float32"),
          item["right"].astype("float32"))
        res = validate_dataset(
            model, variables["params"], ds, valid_iters=4, max_images=5,
            fixed_upscale=fixed_upscale, occ_provider=occ_provider,
            valid_from_gt=valid_from_gt,
        )
        print(f"  eval smoke OK: {res}")

    if args.smoke and ok_train:
        import subprocess

        name, root = ok_train[0]
        print(f"== 20-step train smoke on {name} ==", flush=True)
        rc = subprocess.call([
            sys.executable, "-m", "anystereo_tpu.cli", "train",
            "--data-root", root, "--datasets",
            "sceneflow" if name == "sceneflow" else "kitti_all",
            "--num-steps", "20", "--batch-size", "1", "--max-disp", "64",
            "--train-iters", "4", "--num-workers", "2",
            "--ckpt-dir", "/tmp/anystereo_smoke_ckpt",
        ], cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        print(f"  train smoke rc={rc}")
        if rc != 0:
            return 1

    print("== next ==")
    if ok_train and ok_eval:
        root = ok_train[0][1]
        print("Start the accuracy campaign (100k steps, ~6.7 h on one v5e, "
              "then every eval protocol):\n"
              f"  python tools/reproduce_baseline.py --data-root {root} "
              "--ckpt ckpts/ref-repro")
        return 0
    print("FAIL: need at least one training set and one eval protocol "
          "resolvable.", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
