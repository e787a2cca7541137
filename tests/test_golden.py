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

# regenerated 2026-08-17 after switching GELU to the exact (erf) form the
# torch reference uses (verified by tests/test_full_parity.py)
GOLDEN = {
    "igev": [6.718129, 15.512094, 11.766248, 17.825256, 16.681341, 15.783713,
             11.938251, 17.206884, 15.883462, 16.972982, 17.235853, 17.222736,
             16.719198, 16.014507, 16.185093, 10.600921],
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
