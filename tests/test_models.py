"""Encoder / flow / decoder unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridode.models import nn
from hybridode.models.decoders import (
    RealBenchmarkSpec,
    RealDecoderSpec,
    SimDecoderSpec,
    init_real_benchmark,
    init_real_decoder,
    init_sim_decoder,
    real_benchmark_apply,
    real_decoder_apply,
    sim_decoder_apply,
)
from hybridode.models.encoders import (
    EncoderLSTMRealSpec,
    EncoderLSTMSpec,
    EncoderPlanarLSTMSpec,
    encoder_lstm_apply,
    encoder_lstm_real_apply,
    encoder_planar_lstm_apply,
    init_encoder_lstm,
    init_encoder_lstm_real,
    init_encoder_planar_lstm,
    planar_log_density,
    planar_reparameterize,
)
from hybridode.models.flows import planar_flow
from hybridode.models.priors import exponential_log_density, gaussian_log_density, gaussian_reparameterize


class TestNN:
    def test_lstm_matches_torch(self):
        """Cross-check the scan LSTM cell against torch.nn.LSTM."""
        import torch

        T, B, I, H = 5, 3, 4, 6
        key = jax.random.PRNGKey(0)
        p = nn.lstm_init(key, I, H)
        xs = np.random.RandomState(0).randn(T, B, I).astype(np.float32)

        tl = torch.nn.LSTM(I, H)
        with torch.no_grad():
            tl.weight_ih_l0.copy_(torch.tensor(np.asarray(p["w_ih"]).T))
            tl.weight_hh_l0.copy_(torch.tensor(np.asarray(p["w_hh"]).T))
            tl.bias_ih_l0.copy_(torch.tensor(np.asarray(p["b_ih"])))
            tl.bias_hh_l0.copy_(torch.tensor(np.asarray(p["b_hh"])))
            t_out, _ = tl(torch.tensor(xs))

        j_out = nn.lstm_scan(p, jnp.asarray(xs), H, return_all=True)
        # XLA-CPU's rational tanh/sigmoid approximations (~1e-6/step) compound
        # through the recurrence; 2e-3 over 5 steps is the approximation floor.
        np.testing.assert_allclose(j_out, t_out.numpy(), atol=2e-3)

    def test_mlp_final_activation(self):
        p = nn.mlp_init(jax.random.PRNGKey(0), [3, 5, 2])
        y = nn.mlp_apply(p, jnp.ones((4, 3)), final_activation=jnp.tanh)
        assert y.shape == (4, 2)
        assert bool(jnp.all(jnp.abs(y) <= 1.0))


class TestPriors:
    def test_gaussian_log_density(self):
        import scipy.stats as st

        mu = jnp.array([[0.5, -1.0]])
        log_var = jnp.array([[0.2, -0.3]])
        z = jnp.array([[0.1, 0.4]])
        got = gaussian_log_density(mu, log_var, z)
        want = sum(
            st.norm(float(mu[0, i]), float(np.exp(0.5 * log_var[0, i]))).logpdf(float(z[0, i])) for i in range(2)
        )
        np.testing.assert_allclose(got[0], want, rtol=1e-5)

    def test_exponential_log_density(self):
        z = jnp.array([[0.01, 0.02]])
        got = exponential_log_density(z, rate=100.0)
        want = 2 * np.log(100.0) - 100.0 * 0.03
        np.testing.assert_allclose(got[0], want, rtol=1e-5)

    def test_reparam_stats(self):
        mu = jnp.zeros((2000, 2)) + 1.0
        log_var = jnp.zeros((2000, 2)) + np.log(0.25)
        z = gaussian_reparameterize(jax.random.PRNGKey(0), mu, log_var)
        np.testing.assert_allclose(z.mean(), 1.0, atol=0.05)
        np.testing.assert_allclose(z.std(), 0.5, atol=0.05)


class TestPlanarFlow:
    def test_log_det_matches_autodiff(self):
        """Property test: analytic log|det J| == autodiff Jacobian log-det."""
        B, D = 4, 3
        rng = np.random.RandomState(0)
        z = jnp.asarray(rng.randn(B, D).astype(np.float32))
        u = jnp.asarray(rng.randn(B, D, 1).astype(np.float32))
        w = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
        b = jnp.asarray(rng.randn(B, 1, 1).astype(np.float32))

        z_out, log_det = planar_flow(z, u, w, b)
        assert z_out.shape == (B, D)

        def single(zi, ui, wi, bi):
            zo, _ = planar_flow(zi[None], ui[None], wi[None], bi[None])
            return zo[0]

        for i in range(B):
            J = jax.jacobian(single)(z[i], u[i], w[i], b[i])
            sign, want = np.linalg.slogdet(np.asarray(J))
            np.testing.assert_allclose(log_det[i], want, rtol=1e-4, atol=1e-5)


class TestEncoders:
    def test_encoder_lstm_shapes_and_positivity(self):
        T, B, obs, act, H, out = 5, 7, 20, 1, 40, 6
        spec = EncoderLSTMSpec(obs + act, H, out, normalize=True)
        p = init_encoder_lstm(jax.random.PRNGKey(0), spec)
        x = jnp.ones((T, B, obs))
        a = jnp.zeros((T, B, act))
        m = jnp.ones((T, B, obs))
        mu, log_var = encoder_lstm_apply(p, spec, x, a, m)
        assert mu.shape == (B, out) and log_var.shape == (B, out)
        assert bool(jnp.all(mu > 0))  # exp(mu)/10 positivity
        assert bool(jnp.all(log_var < 0))  # log_var - 5

    def test_encoder_reverse_order_matters(self):
        """The LSTM consumes time backwards: permuting later steps changes the
        output differently from permuting early steps."""
        spec = EncoderLSTMSpec(4, 8, 3, normalize=False)
        p = init_encoder_lstm(jax.random.PRNGKey(1), spec)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(6, 2, 3).astype(np.float32))
        a = jnp.asarray(rng.randn(6, 2, 1).astype(np.float32))
        m = jnp.ones((6, 2, 3))
        mu0, _ = encoder_lstm_apply(p, spec, x, a, m)
        # reversing input order changes output (not symmetric)
        mu1, _ = encoder_lstm_apply(p, spec, x[::-1], a[::-1], m)
        assert not np.allclose(mu0, mu1)

    def test_planar_encoder_roundtrip(self):
        T, B, obs, act, H, out, K = 4, 3, 5, 1, 10, 4, 2
        spec = EncoderPlanarLSTMSpec(obs + act, H, out, num_flows=K)
        p = init_encoder_planar_lstm(jax.random.PRNGKey(0), spec)
        x = jnp.ones((T, B, obs)) * 0.3
        a = jnp.zeros((T, B, act))
        m = jnp.ones((T, B, obs))
        enc_out = encoder_planar_lstm_apply(p, spec, x, a, m)
        mu, log_var, u, w, b = enc_out
        assert u.shape == (B, K, out, 1) and w.shape == (B, K, 1, out) and b.shape == (B, K, 1, 1)
        mu2, lv2, z, log_det, z0 = planar_reparameterize(jax.random.PRNGKey(1), enc_out, K)
        assert z.shape == (B, out)
        assert bool(jnp.all(z > 0))  # exp positivity layer
        lq = planar_log_density(mu2, lv2, z, log_det, z0)
        assert lq.shape == (B,)
        assert bool(jnp.all(jnp.isfinite(lq)))

    def test_real_encoder(self):
        T, B, obs, act, stat = 6, 4, 3, 1, 2
        in_dim = obs + act + stat + 1
        spec = EncoderLSTMRealSpec(in_dim, 8, 5, reverse=False)
        p = init_encoder_lstm_real(jax.random.PRNGKey(0), spec)
        x = jnp.ones((T, B, obs))
        a = jnp.ones((T, B, act + stat))
        m = jnp.ones((T, B, obs))
        mu, log_var = encoder_lstm_real_apply(p, spec, x, a, m)
        assert mu.shape == (B, 5)
        assert bool(jnp.all(jnp.abs(mu) <= 1.0))  # tanh head


class TestDecoders:
    def test_sim_decoder_expert(self):
        B, obs, latent = 4, 20, 4
        spec = SimDecoderSpec(obs, latent, 1, t_max=14, step_size=1, roche=True, max_steps=256)
        assert spec.model_name == "ExpertDecoder"
        p = init_sim_decoder(jax.random.PRNGKey(0), spec)
        init = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (B, latent))) * 0.01
        actions = jnp.zeros((15, B, 1)).at[3, :, 0].set(0.5)
        x_hat, h = sim_decoder_apply(p, spec, init, actions)
        assert x_hat.shape == (15, B, obs)
        assert h.shape == (15, B, latent)
        assert bool(jnp.all(jnp.isfinite(x_hat)))

    @pytest.mark.slow
    def test_sim_decoder_adjoint_matches_scan(self):
        # Per-sample control: custom-VJP backward vs bounded-scan backward
        # must agree in values AND parameter gradients.
        B, obs, latent = 3, 8, 6
        base = dict(obs_dim=obs, latent_dim=latent, action_dim=1, t_max=14, step_size=1,
                    roche=True, max_steps=256, per_sample_control=True)
        spec_scan = SimDecoderSpec(**base, use_adjoint=False)
        spec_adj = SimDecoderSpec(**base, use_adjoint=True)
        p = init_sim_decoder(jax.random.PRNGKey(0), spec_scan)
        init = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (B, latent))) * 0.01
        actions = jnp.zeros((15, B, 1)).at[3, :, 0].set(0.5)

        x_scan, _ = sim_decoder_apply(p, spec_scan, init, actions)
        x_adj, _ = sim_decoder_apply(p, spec_adj, init, actions)
        np.testing.assert_allclose(np.asarray(x_adj), np.asarray(x_scan), rtol=1e-5, atol=1e-6)

        def loss(spec):
            def f(p, init):
                x, _ = sim_decoder_apply(p, spec, init, actions)
                return jnp.sum(x**2)

            return f

        g_scan = jax.grad(loss(spec_scan), argnums=(0, 1))(p, init)
        g_adj = jax.grad(loss(spec_adj), argnums=(0, 1))(p, init)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5),
            g_adj, g_scan,
        )

    @pytest.mark.slow
    def test_sim_decoder_lockstep_adjoint_matches_scan(self):
        # Batched lockstep (one controller per batch, torchdiffeq semantics,
        # model.py:1116-1118): the while_loop-adjoint implementation must
        # match the bounded-scan lockstep solver in values and gradients.
        B, obs, latent = 3, 8, 6
        base = dict(obs_dim=obs, latent_dim=latent, action_dim=1, t_max=14, step_size=1,
                    roche=True, max_steps=512, per_sample_control=False)
        spec_scan = SimDecoderSpec(**base, use_adjoint=False)
        spec_adj = SimDecoderSpec(**base, use_adjoint=True, max_record=256)
        p = init_sim_decoder(jax.random.PRNGKey(0), spec_scan)
        init = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (B, latent))) * 0.01
        actions = jnp.zeros((15, B, 1)).at[3, :, 0].set(0.5)

        x_scan, _ = sim_decoder_apply(p, spec_scan, init, actions)
        x_adj, _ = sim_decoder_apply(p, spec_adj, init, actions)
        np.testing.assert_allclose(np.asarray(x_adj), np.asarray(x_scan), rtol=1e-5, atol=1e-6)

        def loss(spec):
            def f(p, init):
                x, _ = sim_decoder_apply(p, spec, init, actions)
                return jnp.sum(x**2)

            return f

        g_scan = jax.grad(loss(spec_scan), argnums=(0, 1))(p, init)
        g_adj = jax.grad(loss(spec_adj), argnums=(0, 1))(p, init)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5),
            g_adj, g_scan,
        )

    def test_sim_decoder_names(self):
        assert SimDecoderSpec(20, 6, 1, 14, 1, roche=True).model_name == "HybridDecoder"
        assert SimDecoderSpec(20, 6, 1, 14, 1, roche=False).model_name == "NeuralODEDecoder"
        assert SimDecoderSpec(20, 4, 1, 14, 1, roche=True, ablate=True).model_name == "ExpertDecoderAblate"

    def test_real_decoder_rank2(self):
        B, obs, latent, T = 3, 5, 6, 12
        spec = RealDecoderSpec(obs, latent, 1, 2, 8, t_max=T, step_size=1.0, t0=4,
                               method="explicit_adams", ode_step_size=0.5, ode_type="hybrid")
        p = init_real_decoder(jax.random.PRNGKey(0), spec)
        init = jnp.ones((B, latent)) * 0.1
        actions = jnp.ones((T, B, 1)) * 0.05
        statics = jnp.ones((T, B, 2))
        x_hat, h = real_decoder_apply(p, spec, init, actions, statics)
        # grid arange(3, 12) has 9 points; output drops the first
        assert x_hat.shape == (8, B, obs)
        assert bool(jnp.all(jnp.isfinite(x_hat)))

    def test_real_benchmark_decoders(self):
        B, obs, latent, T = 3, 5, 6, 12
        for ode_type in ("tlstm", "gruode"):
            spec = RealBenchmarkSpec(obs, latent, 1, 2, 8, t_max=T, step_size=1.0, t0=4, ode_type=ode_type)
            p = init_real_benchmark(jax.random.PRNGKey(0), spec)
            init = jnp.ones((B, latent)) * 0.1
            actions = jnp.ones((T, B, 1)) * 0.05
            statics = jnp.ones((T, B, 2))
            x_hat, h = real_benchmark_apply(p, spec, init, actions, statics)
            assert x_hat.shape == (8, B, obs), ode_type
            assert bool(jnp.all(jnp.isfinite(x_hat)))
