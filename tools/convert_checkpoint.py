"""Convert a reference torch checkpoint to an anystereo_tpu Orbax checkpoint.

Imports a trained `continuous_IGEVStereo` / `continuous_RaftStereo`
state_dict (including the timm mobilenetv2_100 pretrained trunk the
reference's accuracy rests on, extractor.py:330-331) into the flax variable
tree, using the complete name mapping in utils/torch_convert.py.  The
target model must be built with the reference-regime config (frozen
BatchNorm statistics, config.reference_regime_config).

  python tools/convert_checkpoint.py --torch-ckpt ref.pth --out ckpts/ref \
      [--core raft] [--max-disp 192]

The output directory is loadable by `cli.py evaluate --ckpt` and by
train --restore (params-only restore).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--core", choices=["igev", "raft"], default="igev")
    p.add_argument("--max-disp", type=int, default=192)
    p.add_argument("--verify", action="store_true",
                   help="run one tiny forward on CPU to sanity-check the tree")
    args = p.parse_args()

    import torch

    import jax
    import jax.numpy as jnp

    from anystereo_tpu.config import CoreType, reference_regime_config
    from anystereo_tpu.nn.model import AnyStereo
    from anystereo_tpu.utils.torch_convert import (
        convert_igev_state_dict,
        convert_raft_state_dict,
    )

    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    cfg = reference_regime_config(
        core=CoreType(args.core),
        max_disp=args.max_disp,
        corr_levels=2 if args.core == "igev" else 4,
    )
    convert = convert_igev_state_dict if args.core == "igev" else convert_raft_state_dict
    variables = jax.tree_util.tree_map(jnp.asarray, convert(sd, cfg))
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables))
    print(f"converted {n/1e6:.2f}M values "
          f"({len(sd)} torch tensors) for core={args.core}")

    if args.verify:
        model = AnyStereo(cfg)
        left = jnp.zeros((1, 64, 96, 3), jnp.float32)
        out = jax.jit(
            lambda v, l, r: model.apply(v, l, r, iters=2, mode="eval").disp_final
        )(variables, left, left)
        assert np.isfinite(np.asarray(out)).all(), "forward produced non-finite"
        print("verify: forward finite OK")

    import orbax.checkpoint as ocp

    path = os.path.abspath(args.out)
    mngr = ocp.CheckpointManager(path)
    save_args = dict(
        params=ocp.args.StandardSave(jax.device_get(variables["params"]))
    )
    if variables.get("batch_stats"):
        save_args["batch_stats"] = ocp.args.StandardSave(
            jax.device_get(variables["batch_stats"])
        )
    mngr.save(0, args=ocp.args.Composite(**save_args))
    mngr.wait_until_finished()
    mngr.close()
    print(f"wrote {path}/0 (params"
          + (" + batch_stats)" if "batch_stats" in save_args else ")"))


if __name__ == "__main__":
    main()
