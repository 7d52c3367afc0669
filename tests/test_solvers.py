"""Solver unit tests against closed-form ODEs (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridode.solvers import odeint, odeint_with_stats


def exp_decay(t, y, args):
    return -args * y


def oscillator(t, y, args):
    # y = (x, v): x'' = -w^2 x
    w = args
    x, v = y[..., 0], y[..., 1]
    return jnp.stack([v, -(w**2) * x], axis=-1)


TS = jnp.linspace(0.0, 5.0, 11)


class TestDopri5:
    def test_exponential_decay_batched(self):
        y0 = jnp.array([[1.0, 2.0], [3.0, 0.5]])
        lam = 0.7
        ys = odeint(exp_decay, y0, TS, lam, method="dopri5", rtol=1e-7, atol=1e-9)
        expected = y0[None] * jnp.exp(-lam * TS)[:, None, None]
        np.testing.assert_allclose(ys, expected, rtol=2e-5, atol=1e-7)

    def test_harmonic_oscillator(self):
        w = 2.0
        y0 = jnp.array([[1.0, 0.0]])
        ys = odeint(oscillator, y0, TS, w, rtol=1e-8, atol=1e-10, max_steps=512)
        np.testing.assert_allclose(ys[:, 0, 0], jnp.cos(w * TS), atol=5e-5)
        np.testing.assert_allclose(ys[:, 0, 1], -w * jnp.sin(w * TS), atol=1e-4)

    def test_first_output_is_y0(self):
        y0 = jnp.array([[1.0, 2.0]])
        ys = odeint(exp_decay, y0, TS, 1.0)
        np.testing.assert_array_equal(ys[0], y0)

    def test_stats_success(self):
        y0 = jnp.ones((4, 3))
        ys, stats = odeint_with_stats(exp_decay, y0, TS, 1.0)
        assert bool(stats.success)
        assert int(stats.n_accepted) > 0
        assert jnp.all(jnp.isfinite(ys))

    def test_max_steps_exhaustion_yields_nan(self):
        # Force failure with a tiny step budget: unreached grid points are NaN
        # (the reference's solver-RuntimeError analog, training_utils.py:43-47).
        y0 = jnp.ones((2, 2))
        ys, stats = odeint_with_stats(oscillator, y0, jnp.linspace(0.0, 100.0, 5), 50.0, rtol=1e-12, atol=1e-14,
                                      max_steps=4)
        assert not bool(stats.success)
        assert bool(jnp.any(jnp.isnan(ys[-1])))

    def test_gradient_through_solver(self):
        # Backprop-through-solver: d/dlam of y(T) = y0*exp(-lam*T).
        y0 = jnp.array([[1.0]])
        T = 2.0

        def loss(lam):
            ys = odeint(exp_decay, y0, jnp.array([0.0, T]), lam, rtol=1e-9, atol=1e-11)
            return ys[-1, 0, 0]

        g = jax.grad(loss)(0.5)
        expected = -T * np.exp(-0.5 * T)
        np.testing.assert_allclose(g, expected, rtol=1e-4)

    def test_gradient_wrt_y0(self):
        def loss(y0):
            ys = odeint(exp_decay, y0, jnp.array([0.0, 1.0]), 1.0)
            return jnp.sum(ys[-1] ** 2)

        y0 = jnp.array([[1.0, 2.0]])
        g = jax.grad(loss)(y0)
        expected = 2 * y0 * np.exp(-2.0)
        np.testing.assert_allclose(g, expected, rtol=1e-4)

    def test_jit_compatible(self):
        f = jax.jit(lambda y0: odeint(exp_decay, y0, TS, 1.0))
        ys = f(jnp.ones((2, 3)))
        assert ys.shape == (11, 2, 3)

    def test_matches_scipy_reference(self):
        # Cross-check against scipy's RK45 on the nonlinear logistic equation.
        import scipy.integrate as si

        def logistic(t, y, args):
            return y * (1 - y)

        y0 = jnp.array([[0.1, 0.25]])
        ts = jnp.linspace(0.0, 4.0, 9)
        ys = odeint(logistic, y0, ts, None, rtol=1e-9, atol=1e-11, max_steps=512)
        sol = si.solve_ivp(lambda t, y: y * (1 - y), (0, 4), np.array([0.1, 0.25]),
                           t_eval=np.asarray(ts), rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(ys[:, 0, :], sol.y.T, rtol=1e-5, atol=1e-7)


class TestAdjoint:
    """Custom-VJP integrator parity vs the bounded-scan one."""

    def test_values_match_scan_integrator(self):
        from hybridode.solvers import odeint_dopri5, odeint_dopri5_adjoint

        y0 = jnp.array([[1.0, 2.0], [3.0, 0.5]])
        ys_scan, st_scan = odeint_dopri5(exp_decay, y0, TS, 0.7, rtol=1e-7, atol=1e-9)
        ys_adj, st_adj = odeint_dopri5_adjoint(exp_decay, y0, TS, 0.7, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(ys_adj, ys_scan, rtol=1e-6, atol=1e-8)
        assert int(st_adj.n_accepted) == int(st_scan.n_accepted)
        assert bool(st_adj.success)

    def test_grads_match_scan_integrator(self):
        from hybridode.solvers import odeint_dopri5, odeint_dopri5_adjoint

        # nonlinear field with both y0 and args gradients, mid-grid outputs
        def field(t, y, args):
            lam, w = args
            return -lam * y + w * jnp.sin(t) * y**2

        y0 = jnp.array([[0.3, 0.8]])
        args = (jnp.float32(0.9), jnp.float32(0.2))
        ts = jnp.linspace(0.0, 3.0, 7)

        def make_loss(solver):
            def loss(y0, args):
                ys, _ = solver(field, y0, ts, args, rtol=1e-8, atol=1e-10, max_steps=512)
                return jnp.sum(ys[1:] ** 2) + jnp.sum(ys[3] * 0.5)

            return loss

        g_scan = jax.grad(make_loss(odeint_dopri5), argnums=(0, 1))(y0, args)
        g_adj = jax.grad(make_loss(odeint_dopri5_adjoint), argnums=(0, 1))(y0, args)
        np.testing.assert_allclose(g_adj[0], g_scan[0], rtol=2e-4, atol=1e-7)
        for a, b in zip(g_adj[1], g_scan[1]):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-7)

    def test_max_record_overflow_flagged(self):
        # When the record buffer is smaller than the accepted-step count the
        # backward pass drops the overflow steps: stats.recorded_all must be
        # False (and n_accepted must still report the TRUE accepted count).
        from hybridode.solvers import odeint_dopri5, odeint_dopri5_adjoint

        y0 = jnp.array([[1.0, 2.0]])
        _, st_full = odeint_dopri5(exp_decay, y0, TS, 0.7, rtol=1e-7, atol=1e-9)
        n_acc = int(st_full.n_accepted)
        assert n_acc > 3
        assert bool(st_full.recorded_all)  # scan path: always True

        ys, st = odeint_dopri5_adjoint(exp_decay, y0, TS, 0.7, rtol=1e-7, atol=1e-9,
                                       max_record=3)
        assert not bool(st.recorded_all)
        assert int(st.n_accepted) == n_acc
        assert bool(st.success)  # forward solution itself is unaffected

        _, st_ok = odeint_dopri5_adjoint(exp_decay, y0, TS, 0.7, rtol=1e-7, atol=1e-9,
                                         max_record=n_acc)
        assert bool(st_ok.recorded_all)

    def test_max_record_overflow_warns_at_runtime(self):
        # Truncated-gradient training must not pass silently: with
        # max_record < max_steps, overflowing the record raises a
        # RuntimeWarning from a host callback — through jit and grad.
        import warnings

        from hybridode.solvers import odeint_dopri5_adjoint

        def loss(y0):
            ys, _ = odeint_dopri5_adjoint(exp_decay, y0, TS, 0.7, rtol=1e-7,
                                          atol=1e-9, max_steps=64, max_record=3)
            return jnp.sum(ys**2)

        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            g = jax.jit(jax.grad(loss))(jnp.array([[1.0, 2.0]]))
            jax.block_until_ready(g)
            jax.effects_barrier()
        assert any("max_record" in str(w.message) for w in caught)

        # Safe sizing (max_record defaults to max_steps): no warning at all.
        def loss_ok(y0):
            ys, _ = odeint_dopri5_adjoint(exp_decay, y0, TS, 0.7, rtol=1e-7,
                                          atol=1e-9, max_steps=64)
            return jnp.sum(ys**2)

        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            g = jax.jit(jax.grad(loss_ok))(jnp.array([[1.0, 2.0]]))
            jax.block_until_ready(g)
            jax.effects_barrier()
        assert not any("max_record" in str(w.message) for w in caught)

    def test_grad_analytic(self):
        from hybridode.solvers import odeint_dopri5_adjoint

        y0 = jnp.array([[1.0]])
        T = 2.0

        def loss(lam):
            ys, _ = odeint_dopri5_adjoint(exp_decay, y0, jnp.array([0.0, T]), lam,
                                          rtol=1e-9, atol=1e-11)
            return ys[-1, 0, 0]

        g = jax.grad(loss)(0.5)
        np.testing.assert_allclose(g, -T * np.exp(-0.5 * T), rtol=1e-4)

    def test_grad_wrt_y0_includes_identity_term(self):
        from hybridode.solvers import odeint_dopri5_adjoint

        def loss(y0):
            ys, _ = odeint_dopri5_adjoint(exp_decay, y0, jnp.array([0.0, 1.0]), 1.0)
            return jnp.sum(ys[0] ** 2) + jnp.sum(ys[-1] ** 2)

        y0 = jnp.array([[1.0, 2.0]])
        g = jax.grad(loss)(y0)
        expected = 2 * y0 + 2 * y0 * np.exp(-2.0)
        np.testing.assert_allclose(g, expected, rtol=1e-4)

    def test_vmap_per_sample(self):
        from hybridode.solvers import odeint_dopri5_adjoint

        def solve_one(y0_i, lam_i):
            ys, _ = odeint_dopri5_adjoint(exp_decay, y0_i, TS, lam_i, rtol=1e-7, atol=1e-9)
            return ys

        y0 = jnp.array([[1.0, 2.0], [3.0, 0.5], [0.2, 0.9]])
        lam = jnp.array([0.5, 0.9, 1.3])
        ys = jax.vmap(solve_one, out_axes=1)(y0, lam)  # (T, B, D)
        expected = y0[None] * jnp.exp(-lam[None, :, None] * TS[:, None, None])
        np.testing.assert_allclose(ys, expected, rtol=3e-5, atol=1e-7)

        def loss(lam):
            return jnp.sum(jax.vmap(solve_one, out_axes=1)(y0, lam)[-1])

        g = jax.grad(loss)(lam)
        expected_g = np.sum(np.asarray(y0) * (-TS[-1]) * np.exp(-np.asarray(lam)[:, None] * float(TS[-1])), axis=1)
        np.testing.assert_allclose(g, expected_g, rtol=1e-4)

    def test_max_steps_exhaustion_yields_nan(self):
        from hybridode.solvers import odeint_dopri5_adjoint

        ys, stats = odeint_dopri5_adjoint(oscillator, jnp.ones((2, 2)), jnp.linspace(0.0, 100.0, 5),
                                          50.0, rtol=1e-12, atol=1e-14, max_steps=4)
        assert not bool(stats.success)
        assert bool(jnp.any(jnp.isnan(ys[-1])))


class TestFixedStep:
    @pytest.mark.parametrize("method,tol", [("euler", 2e-2), ("midpoint", 1e-4), ("rk4", 1e-6),
                                            ("explicit_adams", 1e-5)])
    def test_convergence_exp(self, method, tol):
        y0 = jnp.array([[1.0]])
        ts = jnp.linspace(0.0, 1.0, 3)
        ys = odeint(exp_decay, y0, ts, 1.0, method=method, n_substeps=64)
        expected = jnp.exp(-ts)
        np.testing.assert_allclose(ys[:, 0, 0], expected, rtol=tol, atol=tol)

    def test_rk4_order(self):
        # Halving step size should cut error ~16x for RK4.
        y0 = jnp.array([[1.0]])
        ts = jnp.array([0.0, 1.0])
        errs = []
        for n in (4, 8):
            ys = odeint(exp_decay, y0, ts, 1.0, method="rk4", n_substeps=n)
            errs.append(abs(float(ys[-1, 0, 0]) - np.exp(-1.0)))
        assert errs[0] / max(errs[1], 1e-16) > 10

    def test_step_size_resolution(self):
        y0 = jnp.array([[1.0]])
        ts = jnp.linspace(0.0, 2.0, 5)  # interval 0.5
        ys = odeint(exp_decay, y0, ts, 1.0, method="rk4", step_size=0.1)  # 5 substeps
        np.testing.assert_allclose(ys[:, 0, 0], jnp.exp(-ts), rtol=1e-5)

    def test_adams_gradient(self):
        def loss(lam):
            ys = odeint(exp_decay, jnp.ones((1, 1)), jnp.array([0.0, 1.0]), lam,
                        method="explicit_adams", n_substeps=32)
            return ys[-1, 0, 0]

        g = jax.grad(loss)(1.0)
        np.testing.assert_allclose(g, -np.exp(-1.0), rtol=1e-3)

    def test_time_dependent_field(self):
        # y' = cos(t) -> y = sin(t); exercises substep time bookkeeping.
        def f(t, y, args):
            return jnp.broadcast_to(jnp.cos(t), y.shape)

        ts = jnp.linspace(0.0, 3.0, 7)
        ys = odeint(f, jnp.zeros((1, 1)), ts, None, method="rk4", n_substeps=16)
        np.testing.assert_allclose(ys[:, 0, 0], jnp.sin(ts), atol=1e-6)


class TestCalibrate:
    def test_calibrated_budget_covers_demand(self):
        """Budget from the probe finishes the same solves; margin and chunk
        rounding hold."""
        from hybridode.solvers import calibrate_trial_budget, odeint_dopri5
        from hybridode.solvers.dopri5 import _CHUNK_SIZE

        def exp_decay(t, y, k):
            return -k * y

        y0 = jnp.linspace(0.5, 2.0, 8)[:, None]  # (8, 1)
        ks = jnp.linspace(0.2, 3.0, 8)  # stiffer lanes need more steps
        ts = jnp.linspace(0.0, 5.0, 11)
        budget = calibrate_trial_budget(exp_decay, y0, ts, ks, rtol=1e-6, atol=1e-9)
        assert budget % _CHUNK_SIZE == 0

        def solve_one(y, k):
            ys, st = odeint_dopri5(exp_decay, y, ts, k, rtol=1e-6, atol=1e-9, max_steps=budget)
            return st.success

        ok = jax.vmap(solve_one)(y0, ks)
        assert bool(jnp.all(ok))

    def test_probe_exhaustion_raises(self):
        from hybridode.solvers import calibrate_trial_budget

        def stiff(t, y, k):
            return -k * y

        y0 = jnp.ones((2, 1))
        ks = jnp.asarray([1.0, 400.0])
        ts = jnp.linspace(0.0, 5.0, 11)
        try:
            calibrate_trial_budget(stiff, y0, ts, ks, rtol=1e-9, atol=1e-12, probe_budget=64)
            assert False, "expected RuntimeError"
        except RuntimeError:
            pass
