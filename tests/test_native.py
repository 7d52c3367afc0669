"""Native C++ library: NNLS vs scipy, cohort integrator vs the JAX path."""

import numpy as np
import pytest
import scipy.optimize

from hybridode import native
from hybridode.config import ROCHE_PARAM_NAMES, RocheConfig

pytestmark = pytest.mark.skipif(not native.available(), reason="native build unavailable")


class TestNativeNNLS:
    def test_matches_scipy(self):
        rng = np.random.RandomState(0)
        for n in (2, 3, 5):
            for _ in range(10):
                A = rng.randn(30, n)
                b = rng.randn(30)
                x_sp, r_sp = scipy.optimize.nnls(A, b)
                x, r = native.nnls(A, b)
                np.testing.assert_allclose(x, x_sp, rtol=1e-8, atol=1e-10)
                np.testing.assert_allclose(r, r_sp, rtol=1e-8)


class TestNativeCohortSolve:
    def test_matches_lsoda(self):
        cfg = RocheConfig(kel=1)
        rng = np.random.RandomState(7)
        B, D = 12, 6
        y0 = rng.exponential(0.01, (B, D))
        dose_times = rng.randint(0, 14, (B, 1)).astype(np.float64)
        dose_amounts = rng.rand(B) * 10
        ml_coef = rng.randn(D, D - 4) * rng.binomial(1, 0.5, (D, D - 4)) / D
        params = np.array([getattr(cfg, n) for n in ROCHE_PARAM_NAMES], np.float64)
        ts = np.arange(0.0, 15.0)

        out = native.roche_dopri5_batch(y0, dose_times, dose_amounts, params, ml_coef, ts,
                                        rtol=1e-9, atol=1e-11)
        assert out.shape == (15, B, D)
        assert np.all(np.isfinite(out))

        import scipy.integrate

        def rhs(t, y, dt_, da_):
            D_, IR, IM, D2 = y[0], y[1], y[2], y[3]
            active = t >= dt_
            dose = da_ * np.sum(np.exp(cfg.kel * (dt_ - t) * active) * active)
            d1 = D_ * 1 - D_ * np.abs(IM) ** 2 - D_ * IR
            d2 = D_ - IR + D_ * IR + (IR**2) / (1 + IR**2) - D2 * IR
            d3 = IR
            d4 = dose - D2
            ml = np.tanh(y @ ml_coef)
            return np.concatenate([[d1, d2, d3, d4], ml])

        for b in (0, 5, 11):
            sol = scipy.integrate.solve_ivp(rhs, (0, 14), y0[b], t_eval=ts, method="LSODA",
                                            rtol=1e-10, atol=1e-12,
                                            args=(dose_times[b], dose_amounts[b]))
            np.testing.assert_allclose(out[:, b, :], sol.y.T, rtol=2e-5, atol=1e-8)

    def test_matches_jax_generator(self):
        """Native generation path == JAX generation path on the same cohort."""
        import jax.numpy as jnp

        from hybridode.fields import DoseContext, roche_field
        from hybridode.solvers import odeint

        cfg = RocheConfig(kel=1)
        rng = np.random.RandomState(3)
        B, D = 8, 6
        y0 = rng.exponential(0.01, (B, D))
        dose_times = rng.randint(0, 14, (B, 1)).astype(np.float64)
        dose_amounts = rng.rand(B) * 10
        ml_coef = rng.randn(D, D - 4) / D
        params13 = np.array([getattr(cfg, n) for n in ROCHE_PARAM_NAMES], np.float64)
        ts = np.arange(0.0, 15.0)

        out_native = native.roche_dopri5_batch(y0, dose_times, dose_amounts, params13,
                                               ml_coef, ts, rtol=1e-9, atol=1e-11)

        params = {"expert": {n: jnp.asarray(getattr(cfg, n), jnp.float32) for n in ROCHE_PARAM_NAMES},
                  "ml_net": [{"w": jnp.asarray(ml_coef, jnp.float32), "b": jnp.zeros(D - 4, jnp.float32)}]}
        ctx = DoseContext(times=jnp.asarray(dose_times, jnp.float32),
                          amounts=jnp.asarray(dose_amounts, jnp.float32))
        out_jax = odeint(roche_field, jnp.asarray(y0, jnp.float32), jnp.asarray(ts, jnp.float32),
                         (params, ctx), rtol=1e-6, atol=1e-8, max_steps=2048)
        np.testing.assert_allclose(out_native, np.asarray(out_jax), rtol=5e-3, atol=5e-4)
