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

GOLDEN = {
    "igev": [6.717396, 15.502223, 11.757691, 17.835032, 16.667902, 15.769783,
             11.870843, 17.265327, 15.813115, 16.965523, 17.270546, 17.155916,
             16.68634, 15.995749, 16.140154, 10.579068],
    "igev_init": [3.476388, 3.526374, 3.527356, 3.488979],
    "raft": [-0.289357, -5.102499, 0.288723, -2.822647, -5.192936, -5.058916,
             0.340232, -5.593797, -1.061265, -3.952051, -4.719308, -2.762082,
             -4.14565, -3.448748, -1.857761, -2.342546],
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


class TestGolden:
    def test_igev_outputs_stable(self):
        out = _forward(ModelConfig(max_disp=32))
        np.testing.assert_allclose(
            np.asarray(out.disp_preds[-1, 0]), GOLDEN["igev"], rtol=2e-3,
            atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(out.init_disp[0, ::4, ::8].ravel()),
            GOLDEN["igev_init"], rtol=2e-3, atol=2e-2,
        )

    def test_raft_outputs_stable(self):
        out = _forward(raft_config(max_disp=32, corr_levels=2))
        np.testing.assert_allclose(
            np.asarray(out.disp_preds[-1, 0]), GOLDEN["raft"], rtol=2e-3,
            atol=2e-2,
        )
