"""Cross-framework parity: build torch twins of individual modules with the
REFERENCE's exact definitions (update.py, submodule.py), copy the weights
via utils.torch_compat, and require near-exact output agreement.  This pins
our conv/padding/norm conventions to torch semantics end to end."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from anystereo_tpu.utils.torch_compat import (
    conv_kernel,
    conv_transpose_kernel,
    dense_kernel,
)

RTOL, ATOL = 2e-4, 2e-4


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


class TestConvTranspose:
    @pytest.mark.parametrize("k,s,p", [(4, 2, 1), (3, 2, 1), (4, 2, 0)])
    def test_matches_torch(self, rng, k, s, p):
        from anystereo_tpu.nn.layers import TorchConvTranspose

        x = rng.randn(2, 7, 9, 5).astype(np.float32)
        tconv = tnn.ConvTranspose2d(5, 6, k, stride=s, padding=p, bias=False)
        want = tconv(torch.from_numpy(to_nchw(x))).detach().numpy()

        mod = TorchConvTranspose(6, (k, k), (s, s), (p, p), use_bias=False)
        params = {
            "params": {"kernel": jnp.asarray(conv_transpose_kernel(
                tconv.weight.detach().numpy()))}
        }
        got = to_nchw(np.asarray(mod.apply(params, jnp.asarray(x))))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestConvGRU:
    def test_matches_reference_convgru(self, rng):
        """ConvGRU with in-gate context biases (update.py:26-41)."""
        from anystereo_tpu.nn.update import ConvGRU

        hidden, inp = 16, 24
        # torch twin, defined as in the reference
        convz = tnn.Conv2d(hidden + inp, hidden, 3, padding=1)
        convr = tnn.Conv2d(hidden + inp, hidden, 3, padding=1)
        convq = tnn.Conv2d(hidden + inp, hidden, 3, padding=1)
        h = rng.randn(1, 8, 10, hidden).astype(np.float32)
        x = rng.randn(1, 8, 10, inp).astype(np.float32)
        cz = rng.randn(1, 8, 10, hidden).astype(np.float32)
        cr = rng.randn(1, 8, 10, hidden).astype(np.float32)
        cq = rng.randn(1, 8, 10, hidden).astype(np.float32)

        ht, xt = torch.from_numpy(to_nchw(h)), torch.from_numpy(to_nchw(x))
        hx = torch.cat([ht, xt], 1)
        z = torch.sigmoid(convz(hx) + torch.from_numpy(to_nchw(cz)))
        r = torch.sigmoid(convr(hx) + torch.from_numpy(to_nchw(cr)))
        q = torch.tanh(
            convq(torch.cat([r * ht, xt], 1)) + torch.from_numpy(to_nchw(cq))
        )
        want = ((1 - z) * ht + z * q).detach().numpy()

        mod = ConvGRU(hidden)
        params = {
            "params": {
                name: {
                    "kernel": jnp.asarray(conv_kernel(c.weight.detach().numpy())),
                    "bias": jnp.asarray(c.bias.detach().numpy()),
                }
                for name, c in (("convz", convz), ("convr", convr), ("convq", convq))
            }
        }
        got = mod.apply(
            params,
            jnp.asarray(h),
            (jnp.asarray(cz), jnp.asarray(cr), jnp.asarray(cq)),
            jnp.asarray(x),
        )
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want, rtol=RTOL, atol=ATOL)


class TestMotionEncoder:
    def test_matches_reference(self, rng):
        """BasicMotionEncoder (update.py:73-92), IGEV widths (162 lookup ch)."""
        from anystereo_tpu.nn.update import BasicMotionEncoder

        cor_planes = 162
        convc1 = tnn.Conv2d(cor_planes, 64, 1)
        convc2 = tnn.Conv2d(64, 64, 3, padding=1)
        convd1 = tnn.Conv2d(1, 64, 7, padding=3)
        convd2 = tnn.Conv2d(64, 64, 3, padding=1)
        conv = tnn.Conv2d(128, 127, 3, padding=1)

        disp = rng.randn(1, 6, 8, 1).astype(np.float32)
        corr = rng.randn(1, 6, 8, cor_planes).astype(np.float32)
        dt, ct = torch.from_numpy(to_nchw(disp)), torch.from_numpy(to_nchw(corr))
        c = TF.relu(convc1(ct))
        c = TF.relu(convc2(c))
        d = TF.relu(convd1(dt))
        d = TF.relu(convd2(d))
        out = TF.relu(conv(torch.cat([c, d], 1)))
        want = torch.cat([out, dt], 1).detach().numpy()

        mod = BasicMotionEncoder()

        def cp(c):
            return {
                "kernel": jnp.asarray(conv_kernel(c.weight.detach().numpy())),
                "bias": jnp.asarray(c.bias.detach().numpy()),
            }

        params = {
            "params": {
                "convc1": cp(convc1),
                "convc2": cp(convc2),
                "convd1": cp(convd1),
                "convd2": cp(convd2),
                "conv": cp(conv),
            }
        }
        got = mod.apply(params, jnp.asarray(disp), jnp.asarray(corr))
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want, rtol=RTOL, atol=ATOL)


class TestLayerNorm2d:
    def test_matches_reference_layernorm(self, rng):
        """Custom channelwise LayerNorm (submodule.py:149-188)."""
        from anystereo_tpu.nn.layers import LayerNorm2d

        c = 12
        x = rng.randn(2, 5, 7, c).astype(np.float32)
        weight = rng.rand(c).astype(np.float32) + 0.5
        bias = rng.randn(c).astype(np.float32)
        xt = torch.from_numpy(to_nchw(x))
        mu = xt.mean(1, keepdim=True)
        var = (xt - mu).pow(2).mean(1, keepdim=True)
        y = (xt - mu) / (var + 1e-6).sqrt()
        want = (
            torch.from_numpy(weight).view(1, c, 1, 1) * y
            + torch.from_numpy(bias).view(1, c, 1, 1)
        ).numpy()

        mod = LayerNorm2d(c)
        params = {"params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)}}
        got = mod.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want, rtol=RTOL, atol=ATOL)


class TestInstanceNorm:
    def test_matches_torch(self, rng):
        from anystereo_tpu.nn.layers import instance_norm

        x = rng.randn(2, 6, 7, 5).astype(np.float32)
        want = tnn.InstanceNorm2d(5)(torch.from_numpy(to_nchw(x))).numpy()
        got = to_nchw(np.asarray(instance_norm(jnp.asarray(x))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestPixelUnshuffle:
    def test_matches_torch(self, rng):
        from anystereo_tpu.nn.layers import pixel_unshuffle

        x = rng.randn(2, 8, 10, 3).astype(np.float32)
        want = tnn.PixelUnshuffle(2)(torch.from_numpy(to_nchw(x))).numpy()
        got = to_nchw(np.asarray(pixel_unshuffle(jnp.asarray(x), 2)))
        np.testing.assert_allclose(got, want)


class TestStridedConvPositions:
    def test_stride2_k3_p1_matches_torch(self, rng):
        """Even-size stride-2 conv positions differ between XLA 'SAME' and
        torch pad=1; our explicit padding must match torch."""
        from flax import linen as nn

        x = rng.randn(1, 8, 8, 4).astype(np.float32)
        tconv = tnn.Conv2d(4, 6, 3, stride=2, padding=1, bias=False)
        want = tconv(torch.from_numpy(to_nchw(x))).detach().numpy()
        mod = nn.Conv(6, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                      use_bias=False)
        params = {"params": {"kernel": jnp.asarray(
            conv_kernel(tconv.weight.detach().numpy()))}}
        got = to_nchw(np.asarray(mod.apply(params, jnp.asarray(x))))
        assert got.shape == want.shape == (1, 6, 4, 4)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestDense:
    def test_mlp_layer_matches_linear(self, rng):
        lin = tnn.Linear(10, 7)
        x = rng.randn(3, 10).astype(np.float32)
        want = lin(torch.from_numpy(x)).detach().numpy()
        from flax import linen as nn

        mod = nn.Dense(7)
        params = {
            "params": {
                "kernel": jnp.asarray(dense_kernel(lin.weight.detach().numpy())),
                "bias": jnp.asarray(lin.bias.detach().numpy()),
            }
        }
        got = np.asarray(mod.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestAffinity:
    def test_matches_reference_affinity(self, rng):
        """AffinityFeature dilation-1 (liif.py:417-446)."""
        from anystereo_tpu.nn.liif import affinity_features

        x = rng.randn(1, 6, 9, 8).astype(np.float32)
        xt = torch.from_numpy(to_nchw(x))
        fn = TF.normalize(xt, dim=1, p=2)
        unfolded = tnn.Unfold(kernel_size=(3, 3), dilation=1, padding=1)(fn)
        alln = unfolded.reshape(1, 8, 9, 6, 9).transpose(1, 2)
        neighbor = torch.cat((alln[:, :4], alln[:, 5:]), dim=1)
        aff = torch.sum(neighbor * fn.unsqueeze(1), dim=2)
        aff[aff < 0] = 0
        want = aff.numpy()  # [1, 8, H, W]

        got = np.asarray(affinity_features(jnp.asarray(x), (3, 3), 1))
        np.testing.assert_allclose(
            np.transpose(got, (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-4
        )


class TestSepConvGRU:
    def test_matches_reference_sepconvgru(self, rng):
        """SepConvGRU (update.py:43-71): horizontal (1x5) then vertical
        (5x1) GRU pass.  Present-but-unused in the reference's default
        3-level path; kept for config parity and pinned here."""
        from anystereo_tpu.nn.update import SepConvGRU

        hidden, inp = 12, 20
        convs = {}
        for nm, kern, pad in (("1", (1, 5), (0, 2)), ("2", (5, 1), (2, 0))):
            for g in ("convz", "convr", "convq"):
                convs[f"{g}{nm}"] = tnn.Conv2d(hidden + inp, hidden, kern, padding=pad)

        h0 = rng.randn(1, 8, 10, hidden).astype(np.float32)
        x0 = rng.randn(1, 8, 10, inp).astype(np.float32)

        def torch_fwd(h, x):
            h, x = torch.from_numpy(to_nchw(h)), torch.from_numpy(to_nchw(x))
            hx = torch.cat([h, x], dim=1)
            z = torch.sigmoid(convs["convz1"](hx))
            r = torch.sigmoid(convs["convr1"](hx))
            q = torch.tanh(convs["convq1"](torch.cat([r * h, x], dim=1)))
            h = (1 - z) * h + z * q
            hx = torch.cat([h, x], dim=1)
            z = torch.sigmoid(convs["convz2"](hx))
            r = torch.sigmoid(convs["convr2"](hx))
            q = torch.tanh(convs["convq2"](torch.cat([r * h, x], dim=1)))
            return ((1 - z) * h + z * q).detach().numpy()

        with torch.no_grad():
            want = torch_fwd(h0, x0)

        params = {}
        for tnm, fnm in (("1", "h"), ("2", "v")):
            for g in ("convz", "convr", "convq"):
                c = convs[f"{g}{tnm}"]
                params[f"{g}{fnm}"] = {
                    "kernel": jnp.asarray(conv_kernel(c.weight.detach().numpy())),
                    "bias": jnp.asarray(c.bias.detach().numpy()),
                }
        mod = SepConvGRU(hidden_dim=hidden)
        got = to_nchw(
            np.asarray(mod.apply({"params": params}, jnp.asarray(h0), jnp.asarray(x0)))
        )
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestPositionEncoders:
    """Torch twins of the reference PositionEncoder 'learn' and 'dpb'
    variants (liif.py:218-245, 282-300) — config-reachable only by editing
    the hardwired posenc_type (liif.py:592), implemented for parity."""

    def test_learn_matches_reference(self, rng):
        from anystereo_tpu.nn.liif import LearnedPositionEncoder

        hidden, enc, head = 32, 24, 8
        wr = tnn.Linear(2, hidden // 2, bias=False)
        mlp = tnn.Sequential(
            tnn.LayerNorm(hidden, eps=1e-6),
            tnn.Linear(hidden, hidden),
            tnn.GELU(),
            tnn.LayerNorm(hidden, eps=1e-6),
            tnn.Linear(hidden, enc),
        )
        proj = tnn.Sequential(tnn.GELU(), tnn.Linear(enc, head))
        pos = rng.randn(2, 40, 2).astype(np.float32)

        with torch.no_grad():
            p = wr(torch.from_numpy(pos))
            e = torch.cat([torch.sin(p), torch.cos(p)], dim=-1) / np.sqrt(hidden)
            want = proj(mlp(e)).numpy()

        params = {
            "Wr": {"kernel": jnp.asarray(dense_kernel(wr.weight.detach().numpy()))},
            "mlp_ln1": {"scale": jnp.asarray(mlp[0].weight.detach().numpy()),
                        "bias": jnp.asarray(mlp[0].bias.detach().numpy())},
            "mlp_fc1": {"kernel": jnp.asarray(dense_kernel(mlp[1].weight.detach().numpy())),
                        "bias": jnp.asarray(mlp[1].bias.detach().numpy())},
            "mlp_ln2": {"scale": jnp.asarray(mlp[3].weight.detach().numpy()),
                        "bias": jnp.asarray(mlp[3].bias.detach().numpy())},
            "mlp_fc2": {"kernel": jnp.asarray(dense_kernel(mlp[4].weight.detach().numpy())),
                        "bias": jnp.asarray(mlp[4].bias.detach().numpy())},
            "proj": {"kernel": jnp.asarray(dense_kernel(proj[1].weight.detach().numpy())),
                     "bias": jnp.asarray(proj[1].bias.detach().numpy())},
        }
        mod = LearnedPositionEncoder(hidden_dims=hidden, enc_dims=enc, head=head)
        got = np.asarray(mod.apply({"params": params}, jnp.asarray(pos)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_ipe_matches_reference(self, rng):
        """'ipe' (liif.py:254-273): sinusoid bank with each [sin, cos]
        feature attenuated by torch.sinc((1/pi) * cell @ B^T)."""
        from anystereo_tpu.nn.liif import IpePositionEncoder

        enc_dims, head, posenc_scale = 16, 8, 10.0
        n = enc_dims // 4
        b_vals = 2.0 ** torch.linspace(0, posenc_scale, n) - 1
        b_vals = torch.stack([b_vals, torch.zeros_like(b_vals)], dim=-1)
        b_vals = torch.cat([b_vals, torch.roll(b_vals, 1, -1)], dim=0)
        proj = tnn.Linear(enc_dims, head)
        pos = rng.randn(2, 40, 2).astype(np.float32)
        cell = (rng.rand(2, 40, 2).astype(np.float32) * 0.5 + 1e-3)

        with torch.no_grad():
            tp = torch.from_numpy(pos) @ b_vals.transpose(-2, -1)
            cp = torch.sinc(
                (1.0 / np.pi) * torch.from_numpy(cell) @ b_vals.transpose(-2, -1)
            )
            enc = torch.cat([torch.sin(tp) * cp, torch.cos(tp) * cp], dim=-1)
            want = proj(enc).numpy()

        params = {
            "Dense_0": {
                "kernel": jnp.asarray(dense_kernel(proj.weight.detach().numpy())),
                "bias": jnp.asarray(proj.bias.detach().numpy()),
            }
        }
        mod = IpePositionEncoder(
            enc_dim=enc_dims, posenc_scale=posenc_scale, head=head
        )
        got = np.asarray(
            mod.apply({"params": params}, jnp.asarray(pos), jnp.asarray(cell))
        )
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_dpb_matches_reference(self, rng):
        from anystereo_tpu.nn.liif import DpbPositionEncoder

        hidden = enc = 32
        head = 8
        mlp = tnn.Sequential(
            tnn.Linear(2, hidden),
            tnn.LayerNorm(hidden, eps=1e-6),
            tnn.ReLU(),
            tnn.Linear(hidden, hidden),
            tnn.LayerNorm(hidden, eps=1e-6),
            tnn.ReLU(),
            tnn.Linear(hidden, enc),
        )
        proj = tnn.Sequential(
            tnn.LayerNorm(hidden, eps=1e-6), tnn.ReLU(), tnn.Linear(enc, head)
        )
        pos = rng.randn(2, 40, 2).astype(np.float32)
        with torch.no_grad():
            want = proj(mlp(torch.from_numpy(pos))).numpy()

        def ln(m):
            return {"scale": jnp.asarray(m.weight.detach().numpy()),
                    "bias": jnp.asarray(m.bias.detach().numpy())}

        def fc(m):
            return {"kernel": jnp.asarray(dense_kernel(m.weight.detach().numpy())),
                    "bias": jnp.asarray(m.bias.detach().numpy())}

        params = {
            "mlp_fc1": fc(mlp[0]), "mlp_ln1": ln(mlp[1]),
            "mlp_fc2": fc(mlp[3]), "mlp_ln2": ln(mlp[4]),
            "mlp_fc3": fc(mlp[6]),
            "proj_ln": ln(proj[0]), "proj": fc(proj[2]),
        }
        mod = DpbPositionEncoder(hidden_dims=hidden, enc_dims=enc, head=head)
        got = np.asarray(mod.apply({"params": params}, jnp.asarray(pos)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
