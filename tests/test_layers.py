"""Oracle tests for the depth-folded 3-D conv formulations: each folded
variant must be bit-level-close to the general XLA conv it replaces
(the folds exist purely for TPU speed — XLA's conv3d lowering runs the
hourglass's thin-channel volumes ~3.5x slower than depth-batched 2-D
convs; see nn/layers.py docstrings)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anystereo_tpu.nn.layers import (
    TorchConvTranspose,
    _Conv3x3x3Folded,
    _Conv3x3x3FoldedS2,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


class TestFolded3dConvs:
    @pytest.mark.parametrize("b,d,h,w,ci,co", [(1, 8, 6, 10, 5, 7),
                                               (2, 5, 5, 7, 3, 3)])
    def test_stride1_matches_conv3d(self, rng, b, d, h, w, ci, co):
        x = jnp.asarray(rng.randn(b, d, h, w, ci).astype(np.float32))
        mod = _Conv3x3x3Folded(co)
        params = mod.init(jax.random.PRNGKey(0), x)
        got = mod.apply(params, x)
        want = jax.lax.conv_general_dilated(
            x, params["params"]["kernel"], (1, 1, 1),
            ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("b,d,h,w,ci,co", [(1, 8, 6, 10, 5, 7),
                                               (2, 5, 5, 7, 3, 3),
                                               (1, 48, 8, 8, 8, 16),
                                               (1, 2, 4, 6, 3, 4),
                                               (1, 1, 4, 6, 3, 4)])
    def test_stride2_matches_conv3d(self, rng, b, d, h, w, ci, co):
        x = jnp.asarray(rng.randn(b, d, h, w, ci).astype(np.float32))
        mod = _Conv3x3x3FoldedS2(co)
        params = mod.init(jax.random.PRNGKey(1), x)
        got = mod.apply(params, x)
        want = jax.lax.conv_general_dilated(
            x, params["params"]["kernel"], (2, 2, 2),
            ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("b,d,h,w,ci,co", [(1, 8, 6, 10, 5, 7),
                                               (2, 5, 4, 4, 3, 3)])
    def test_transposed_depth_decomposition(self, rng, b, d, h, w, ci, co):
        """k4 s2 p1 3-D deconv: the even/odd depth interleave must equal
        the input-dilated conv it replaces (torch ConvTranspose3d
        semantics, oracle-pinned in test_torch_parity)."""
        x = jnp.asarray(rng.randn(b, d, h, w, ci).astype(np.float32))
        mod = TorchConvTranspose(co, (4, 4, 4), (2, 2, 2), (1, 1, 1))
        params = mod.init(jax.random.PRNGKey(2), x)
        got = mod.apply(params, x)
        wf = jnp.flip(params["params"]["kernel"], axis=(0, 1, 2))
        want = jax.lax.conv_general_dilated(
            x, wf, (1, 1, 1), ((2, 2), (2, 2), (2, 2)),
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        assert got.shape == (b, 2 * d, 2 * h, 2 * w, co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
