"""Golden-value regression: fixed seed + fixed inputs must keep producing
the same disparities across refactors (generated on CPU, jax 0.9.0,
2026-08-17).  Loose tolerance absorbs bf16 reassociation from compiler
version drift; a real numerical change will blow far past it."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anystereo_tpu.config import ModelConfig, raft_config
from anystereo_tpu.nn.model import AnyStereo

# igev row regenerated 2026-08-17 after the lookup switched to the internal
# (g-major) channel order (ops/lookup.py docstring) — same math, different
# binding of the randomly-initialized convc1 weights to lookup channels;
# reference-order parity is proven by tests/test_full_parity.py via the
# converter's channel permutation.  Earlier regen: exact (erf) GELU.
GOLDEN = {
    "igev": [7.097925, 14.859694, 10.721042, 17.216562, 16.051649, 14.950571,
             11.750313, 16.038221, 17.297558, 17.856905, 16.688665, 17.864592,
             15.839089, 17.58881, 17.0749, 10.596992],
    "igev_init": [3.48105, 3.552955, 3.536513, 3.53917],
    "raft": [-0.289482, -5.103186, 0.286458, -2.82279, -5.192584, -5.060033,
             0.33677, -5.593468, -1.062798, -3.952824, -4.718577, -2.762172,
             -4.145384, -3.447958, -1.858149, -2.341542],
}


def _forward(cfg):
    model = AnyStereo(cfg)
    b, h, w, q = 1, 32, 64, 16
    rng = np.random.RandomState(42)
    left = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    right = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    coords = jnp.asarray((rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.9)
    scale = jnp.asarray([1.25], np.float32)
    variables = model.init(
        jax.random.PRNGKey(7), left, right, iters=1, coords=coords, scale=scale
    )
    return model.apply(
        variables, left, right, iters=2, coords=coords, scale=scale, mode="train"
    )


# model-compile-heavy; deselect with -m 'not slow' for quick runs
pytestmark = pytest.mark.slow


# goldens were generated from the reference conv forms; the default-on MXU
# layout rewrites (fast_disp_head / fuse_motion_convs) reassociate fp32
# reductions, which the iterative refinement amplifies past the band at
# RAFT's zero-init — their equivalence to the conv forms is pinned
# separately (test_variants.py), so the golden gate pins the base numerics
_PIN = dict(fast_disp_head=False, fuse_motion_convs=False,
            joint_gru_convs=False)


class TestGolden:
    def test_igev_outputs_stable(self):
        out = _forward(ModelConfig(max_disp=32, **_PIN))
        np.testing.assert_allclose(
            np.asarray(out.disp_preds[-1, 0]), GOLDEN["igev"], rtol=2e-3,
            atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(out.init_disp[0, ::4, ::8].ravel()),
            GOLDEN["igev_init"], rtol=2e-3, atol=2e-2,
        )

    def test_raft_outputs_stable(self):
        out = _forward(raft_config(max_disp=32, corr_levels=2, **_PIN))
        np.testing.assert_allclose(
            np.asarray(out.disp_preds[-1, 0]), GOLDEN["raft"], rtol=2e-3,
            atol=2e-2,
        )

    # The shipped DEFAULT configuration (all MXU layout rewrites on) must
    # also track the goldens end-to-end — the rewrites only reassociate
    # reductions, which the iterative refinement amplifies to ~0.06 px at
    # these shapes (measured 2026-08-20); a band of 0.2 px absorbs that
    # plus compiler drift while still catching any real default-path
    # regression that the small-shape equivalence tests miss.
    def test_igev_default_config_tracks_golden(self):
        out = _forward(ModelConfig(max_disp=32))
        np.testing.assert_allclose(
            np.asarray(out.disp_preds[-1, 0]), GOLDEN["igev"], atol=0.2
        )
        np.testing.assert_allclose(
            np.asarray(out.init_disp[0, ::4, ::8].ravel()),
            GOLDEN["igev_init"], atol=0.2,
        )

    def test_raft_default_config_tracks_golden(self):
        out = _forward(raft_config(max_disp=32, corr_levels=2))
        np.testing.assert_allclose(
            np.asarray(out.disp_preds[-1, 0]), GOLDEN["raft"], atol=0.2
        )
