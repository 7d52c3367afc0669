"""Metric tests: CRPS estimator vs brute force, bootstrap, NNLS, e2e evaluate."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from hybridode.ensembles import learn_ensemble_weights, nnls, nnls2
from hybridode.eval import bootstrap_rmse, crps_ensemble, evaluate, evaluate_horizon


def crps_brute(truth, samples):
    m = len(samples)
    return np.mean(np.abs(samples - truth)) - 0.5 * np.mean(
        np.abs(samples[:, None] - samples[None, :])
    )


class TestCRPS:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            truth = rng.randn()
            samples = rng.randn(17)
            got = crps_ensemble(jnp.asarray(truth), jnp.asarray(samples))
            np.testing.assert_allclose(got, crps_brute(truth, samples), rtol=1e-5, atol=1e-6)

    def test_batched(self):
        rng = np.random.RandomState(1)
        truth = rng.randn(3, 4)
        samples = rng.randn(3, 4, 9)
        got = crps_ensemble(jnp.asarray(truth), jnp.asarray(samples))
        assert got.shape == (3, 4)
        for i in range(3):
            for j in range(4):
                np.testing.assert_allclose(got[i, j], crps_brute(truth[i, j], samples[i, j]),
                                           rtol=1e-5, atol=1e-6)

    def test_perfect_forecast(self):
        samples = jnp.full((50,), 2.0)
        got = crps_ensemble(jnp.asarray(2.0), samples)
        np.testing.assert_allclose(got, 0.0, atol=1e-6)


class TestBootstrap:
    def test_constant_errors_zero_sd(self):
        assert bootstrap_rmse(np.full(100, 0.25), rng=np.random.RandomState(0)) == 0.0

    def test_scale(self):
        rng = np.random.RandomState(0)
        err = rng.rand(500)
        sd = bootstrap_rmse(err, rng=np.random.RandomState(1))
        assert 0 < sd < 0.05


class TestNNLS:
    def test_nnls2_matches_scipy(self):
        rng = np.random.RandomState(0)
        for _ in range(20):
            A = rng.randn(30, 2)
            b = rng.randn(30)
            w_sp, _ = scipy.optimize.nnls(A, b)
            w1, w2 = nnls2(jnp.asarray(A[:, 0]), jnp.asarray(A[:, 1]), jnp.asarray(b))
            np.testing.assert_allclose([float(w1), float(w2)], w_sp, rtol=1e-4, atol=1e-5)

    def test_general_nnls_matches_scipy(self):
        rng = np.random.RandomState(1)
        for n in (2, 4, 6):
            A = rng.randn(40, n)
            b = rng.randn(40)
            w_sp, r_sp = scipy.optimize.nnls(A, b)
            w, r = nnls(A, b)
            np.testing.assert_allclose(w, w_sp, rtol=1e-6, atol=1e-8)
            np.testing.assert_allclose(r, r_sp, rtol=1e-6)

    def test_learn_ensemble_weights(self):
        rng = np.random.RandomState(0)
        T, B, D = 8, 16, 3
        xe = rng.randn(T, B, D).astype(np.float32)
        xm = rng.randn(T, B, D).astype(np.float32)
        # truth is 0.6*xe + 0.3*xm
        x = 0.6 * xe + 0.3 * xm
        we, wm = learn_ensemble_weights(jnp.asarray(x), jnp.asarray(xe), jnp.asarray(xm), t0=2)
        assert we.shape == (T, 1, D)
        np.testing.assert_allclose(we[2:, 0, 0], 0.6, atol=1e-4)
        np.testing.assert_allclose(wm[2:, 0, 0], 0.3, atol=1e-4)
        np.testing.assert_allclose(we[:2], 0.0)


class TestEvaluateE2E:
    def test_evaluate_runs(self):
        """End-to-end evaluate on a tiny randomly-initialized model."""
        from hybridode.inference import VIModel, init_vi
        from hybridode.models.decoders import SimDecoderSpec
        from hybridode.models.encoders import EncoderLSTMSpec

        obs, latent, T, N = 6, 4, 5, 16

        class Gen:
            expert_dim = 4
            test_size = N

            def __init__(self):
                k = jax.random.PRNGKey(0)
                self.data = {
                    "measurements": jax.random.normal(k, (T, N, obs)),
                    "actions": jnp.zeros((T, N, 1)).at[1, :, 0].set(0.4),
                    "masks": jnp.ones((T, N, obs)),
                    "latents": jnp.abs(jax.random.normal(k, (T, N, latent))) * 0.01,
                }

            def get_split(self, fold, bs, chunk):
                return {k: v[:, chunk * bs : (chunk + 1) * bs] for k, v in self.data.items()}

        enc = EncoderLSTMSpec(obs + 1, 8, latent)
        dec = SimDecoderSpec(obs, latent, 1, t_max=T - 1, step_size=1, roche=True,
                             method="rk4", ode_step_size=0.5)
        model = VIModel(kind="sim", encoder_spec=enc, decoder_spec=dec, prior="exponential", mc_size=3)
        params = init_vi(jax.random.PRNGKey(0), model)

        res = evaluate(params, model, Gen(), batch_size=8, t0=2, mc_itr=4, verbose=False)
        rmse_z0, rmse_z0_sd, cprs_z0, rmse_x, rmse_x_sd, cprs_x = res
        assert all(np.isfinite(v) for v in res)

        d = evaluate_horizon(params, model, Gen(), batch_size=8, t0=2, mc_itr=3)
        assert d["rmse_x"].shape == (T - 2,)
        assert np.all(np.isfinite(d["rmse_x"]))
