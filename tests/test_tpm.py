"""TPM parity tests: a torch functional oracle built from the same weights."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tpdm_tpu.models.tpm import TimePredictor, reshape_tokens_to_2d


def _tpm_torch_oracle(params, x_nchw, temb, epsilon=1.0):
    """Reference TPM forward (modeling_sd3_pnt.py:100-115) with flax weights.

    Written directly against torch.nn.functional so conv padding/stride,
    GroupNorm, adaptive pooling and activation semantics are checked against
    an independent implementation.
    """
    p = params["params"]

    def conv(x, name, stride=1):
        w = torch.tensor(np.asarray(p[name]["kernel"])).permute(3, 2, 0, 1)
        b = torch.tensor(np.asarray(p[name]["bias"]))
        return F.conv2d(x, w, b, stride=stride, padding=1)

    x = torch.tensor(np.asarray(x_nchw))
    t = torch.tensor(np.asarray(temb))

    x = conv(x, "conv1")
    # CustomAdaGroupNormZeroSingle (modeling_sd3_pnt.py:77-83)
    lin_w = torch.tensor(np.asarray(p["norm1"]["linear"]["kernel"]))
    lin_b = torch.tensor(np.asarray(p["norm1"]["linear"]["bias"]))
    mod = F.silu(t) @ lin_w + lin_b
    shift, scale = mod.chunk(2, dim=1)
    gn_scale = torch.tensor(np.asarray(p["norm1"]["norm"]["scale"]))
    gn_bias = torch.tensor(np.asarray(p["norm1"]["norm"]["bias"]))
    x = F.group_norm(x, 1, gn_scale, gn_bias, eps=1e-6)
    x = x * (1 + scale[:, :, None, None]) + shift[:, :, None, None]
    x = F.silu(x)
    x = conv(x, "conv2", stride=2)
    x = F.adaptive_avg_pool2d(x, (16, 16))
    x = F.adaptive_max_pool2d(x, (1, 1)).view(x.size(0), -1)
    x = F.silu(x @ torch.tensor(np.asarray(p["fc1"]["kernel"])) + torch.tensor(np.asarray(p["fc1"]["bias"])))
    x = x @ torch.tensor(np.asarray(p["fc2"]["kernel"])) + torch.tensor(np.asarray(p["fc2"]["bias"]))
    return torch.exp(x) + epsilon


class TestTimePredictor:
    def setup_method(self):
        self.in_ch = 32
        self.temb_dim = 24
        self.tpm = TimePredictor(
            conv_out_channels=16, in_channels=self.in_ch, temb_dim=self.temb_dim
        )
        self.x = np.random.default_rng(0).normal(size=(2, self.in_ch, 64, 64)).astype(
            np.float32
        )
        self.temb = np.random.default_rng(1).normal(size=(2, self.temb_dim)).astype(
            np.float32
        )
        self.params = self.tpm.init(
            jax.random.PRNGKey(0), jnp.array(self.x), jnp.array(self.temb)
        )

    def test_matches_torch_oracle(self):
        ours = self.tpm.apply(self.params, jnp.array(self.x), jnp.array(self.temb))
        ref = _tpm_torch_oracle(self.params, self.x, self.temb)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-4)

    def test_init_policy_at_zero_input(self):
        """Zero activations+temb -> output is exactly (e^init_alpha, e^init_beta)+1.

        This is the reference's init contract: the untrained policy starts at
        Beta(init values) (modeling_sd3_pnt.py:117-126).
        """
        out = self.tpm.apply(
            self.params,
            jnp.zeros((1, self.in_ch, 64, 64)),
            jnp.zeros((1, self.temb_dim)),
        )
        np.testing.assert_allclose(
            np.asarray(out[0]),
            [np.exp(1.5) + 1.0, np.exp(0.5) + 1.0],
            rtol=1e-5,
        )

    def test_outputs_exceed_epsilon(self):
        out = self.tpm.apply(self.params, jnp.array(self.x), jnp.array(self.temb))
        assert np.all(np.asarray(out) > 1.0)

    def test_gradients_flow(self):
        def loss(params):
            ab = self.tpm.apply(params, jnp.array(self.x), jnp.array(self.temb))
            return jnp.sum(ab)

        g = jax.grad(loss)(self.params)
        leaves = jax.tree.leaves(g)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestReshapeTokens:
    def test_matches_reference_einsum(self):
        """Oracle: inline torch replica of reshape_hidden_states_to_2d."""
        b, c = 2, 6
        tokens = np.random.default_rng(2).normal(size=(b, 1024, c)).astype(np.float32)
        ours = reshape_tokens_to_2d(jnp.array(tokens), height=32, width=32)

        t = torch.tensor(tokens).reshape(b, 16, 16, 2, 2, c)
        t = torch.einsum("nhwpqc->nchpwq", t).reshape(b, c, 32, 32)
        np.testing.assert_allclose(np.asarray(ours), t.numpy(), rtol=1e-6)

    def test_roundtrip_preserves_values(self):
        tokens = jnp.arange(2 * 1024 * 3, dtype=jnp.float32).reshape(2, 1024, 3)
        out = reshape_tokens_to_2d(tokens, 32, 32)
        assert out.shape == (2, 3, 32, 32)
        # A permutation preserves the multiset of values exactly.
        np.testing.assert_array_equal(
            np.sort(np.asarray(out).ravel()), np.sort(np.asarray(tokens).ravel())
        )


class TestAdaptivePool:
    def test_matches_torch_various_sizes(self):
        from tpdm_tpu.models.tpm import adaptive_avg_pool_2d

        rng = np.random.default_rng(3)
        for h, w in [(32, 32), (16, 16), (4, 4), (17, 23), (64, 16)]:
            x = rng.normal(size=(2, h, w, 5)).astype(np.float32)
            ours = adaptive_avg_pool_2d(jnp.array(x), 16, 16)
            ref = F.adaptive_avg_pool2d(
                torch.tensor(x).permute(0, 3, 1, 2), (16, 16)
            ).permute(0, 2, 3, 1)
            np.testing.assert_allclose(
                np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-5,
                err_msg=f"size {h}x{w}",
            )
