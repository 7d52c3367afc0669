"""Vector-field tests: dose kernels, expert dynamics vs an independent NumPy
oracle, and solver integration parity with SciPy LSODA (the reference's
ground-truth integrator, dataloader.py:151-161)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.integrate

from hybridode.config import ROCHE_PARAM_NAMES, RocheConfig
from hybridode.fields import (
    CumDoseContext,
    DoseContext,
    cumulative_dose,
    doses_from_actions,
    exp_decay_dose,
    impulse_dose,
    init_neural_field,
    init_neural_real_2nd_field,
    init_neural_real_field,
    init_roche_field,
    init_roche_real_field,
    neural_field,
    neural_real_2nd_field,
    neural_real_field,
    roche_field,
    roche_real_field,
)
from hybridode.solvers import odeint


def numpy_roche_rhs(t, y, cfg: RocheConfig, dose_times, dose_amount, ml_coef=None):
    """Independent oracle for the expert ODE (formulas from the paper's
    PK/PD model; see reference dataloader.py:105-149)."""
    Disease, ImmuneReact, Immunity, Dose2 = y[0], y[1], y[2], y[3]
    active = t >= dose_times
    Dose = dose_amount * np.sum(np.exp(cfg.kel * (dose_times - t) * active) * active)
    dxdt1 = (
        Disease * cfg.k_disprog
        - Disease * Immunity**cfg.HillCure * cfg.k_discure_immunity
        - Disease * ImmuneReact * cfg.k_discure_immunereact
    )
    dxdt2 = (
        Disease * cfg.k_immune_disease
        - ImmuneReact * cfg.k_immune_off
        + Disease * ImmuneReact * cfg.k_immune_feedback
        + (ImmuneReact**cfg.HillPatho * cfg.emax_patho) / (cfg.ec50_patho**cfg.HillPatho + ImmuneReact**cfg.HillPatho)
        - Dose2 * ImmuneReact * cfg.k_dexa
    )
    dxdt3 = ImmuneReact * cfg.k_immunity
    dxdt4 = cfg.kel * Dose - cfg.kel * Dose2
    out = [dxdt1, dxdt2, dxdt3, dxdt4]
    if ml_coef is not None:
        out = out + list(np.tanh(y @ ml_coef))
    return np.array(out)


class TestDoseKernels:
    def test_doses_from_actions(self):
        T, B = 15, 3
        a = np.zeros((T, B, 1), np.float32)
        a[4, 0, 0] = 0.7
        a[9, 1, 0] = 0.3
        # patient 2: no dose
        ctx = doses_from_actions(jnp.asarray(a), step_size=1.0)
        np.testing.assert_allclose(ctx.amounts, [0.7, 0.3, 0.0])
        assert float(ctx.times[0, 0]) == 4.0
        assert float(ctx.times[1, 0]) == 9.0
        assert float(ctx.times[2, 0]) > 1e20  # sentinel

    def test_doses_from_actions_multi_dose(self):
        # max_doses > 1: earliest nonzero actions become dose times, all
        # sharing the max-over-time amount (model.py:495-507 semantics).
        T, B = 15, 2
        a = np.zeros((T, B, 1), np.float32)
        a[2, 0, 0] = 0.5
        a[5, 0, 0] = 1.5  # amount = max over time = 1.5
        a[7, 1, 0] = 0.4
        # patient 1: single dose, second slot must carry the sentinel
        ctx = doses_from_actions(jnp.asarray(a), step_size=1.0, max_doses=2)
        np.testing.assert_allclose(ctx.amounts, [1.5, 0.4])
        np.testing.assert_allclose(np.sort(np.asarray(ctx.times[0])), [2.0, 5.0])
        assert float(ctx.times[1, 0]) == 7.0
        assert float(ctx.times[1, 1]) > 1e20  # sentinel

        # both doses contribute to the depot after the second dose time
        kel = 1.0
        expect0 = 1.5 * (np.exp(kel * (2.0 - 6.0)) + np.exp(kel * (5.0 - 6.0)))
        expect1 = 0.0  # t < dose time for patient 1
        np.testing.assert_allclose(
            exp_decay_dose(6.0, ctx, kel), [expect0, expect1], rtol=1e-5
        )

    def test_exp_decay_dose_values(self):
        ctx = DoseContext(times=jnp.array([[2.0], [1e30]]), amounts=jnp.array([1.5, 2.0]))
        kel = 1.0
        # before dose
        np.testing.assert_allclose(exp_decay_dose(1.0, ctx, kel), [0.0, 0.0])
        # at dose time: exp(0) = 1
        np.testing.assert_allclose(exp_decay_dose(2.0, ctx, kel), [1.5, 0.0])
        # after: 1.5 * exp(kel*(2-3)) = 1.5/e
        np.testing.assert_allclose(exp_decay_dose(3.0, ctx, kel), [1.5 * np.exp(-1.0), 0.0], rtol=1e-5)

    def test_impulse_dose(self):
        ctx = DoseContext(times=jnp.array([[5.0]]), amounts=jnp.array([0.9]))
        np.testing.assert_allclose(impulse_dose(5.0, ctx), [0.9])
        np.testing.assert_allclose(impulse_dose(5.0001, ctx), [0.0])

    def test_cumulative_dose(self):
        a = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2, 1))
        ctx = CumDoseContext(actions=a)
        # t=2.5 -> floor 2 -> cumsum rows 0..2
        np.testing.assert_allclose(cumulative_dose(2.5, ctx)[:, 0], [0 + 2 + 4, 1 + 3 + 5])
        # past horizon
        np.testing.assert_allclose(cumulative_dose(4.0, ctx), np.zeros((2, 1)))


class TestRocheField:
    def test_matches_numpy_oracle(self):
        cfg = RocheConfig()
        rng = np.random.RandomState(0)
        y = rng.exponential(0.1, size=(5, 4)).astype(np.float32)
        ctx = DoseContext(times=jnp.asarray(rng.randint(0, 10, (5, 1)).astype(np.float32)),
                          amounts=jnp.asarray(rng.rand(5).astype(np.float32)))
        params = init_roche_field(jax.random.PRNGKey(0), latent_dim=4, roche_config=cfg)
        t = 3.7
        got = roche_field(t, jnp.asarray(y), (params, ctx))
        for b in range(5):
            want = numpy_roche_rhs(t, y[b].astype(np.float64), cfg,
                                   np.asarray(ctx.times)[b], float(ctx.amounts[b]))
            np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-6)

    def test_hybrid_ml_dim(self):
        params = init_roche_field(jax.random.PRNGKey(1), latent_dim=6)
        y = jnp.ones((3, 6)) * 0.1
        ctx = DoseContext(times=jnp.full((3, 1), 1e30), amounts=jnp.zeros(3))
        dy = roche_field(0.5, y, (params, ctx))
        assert dy.shape == (3, 6)
        # ml part is tanh-bounded
        assert bool(jnp.all(jnp.abs(dy[:, 4:]) <= 1.0))

    def test_integration_matches_lsoda(self):
        """Our dopri5 on the expert field vs SciPy LSODA (the reference's
        ground-truth generator integrator) — trajectory-level parity."""
        cfg = RocheConfig()
        rng = np.random.RandomState(42)
        init = rng.exponential(0.01, size=4)
        dose_times = np.array([5.0])
        dose_amount = 0.8

        params = init_roche_field(jax.random.PRNGKey(0), latent_dim=4, roche_config=cfg)
        ctx = DoseContext(times=jnp.array([dose_times], dtype=jnp.float32),
                          amounts=jnp.array([dose_amount], dtype=jnp.float32))
        ts = jnp.arange(0.0, 15.0, 1.0)
        ys = odeint(roche_field, jnp.asarray(init, jnp.float32)[None], ts, (params, ctx),
                    rtol=1e-7, atol=1e-9, max_steps=512)

        ode = scipy.integrate.ode(lambda t, y: numpy_roche_rhs(t, y, cfg, dose_times, dose_amount))
        ode.set_integrator("lsoda", rtol=1e-10, atol=1e-12)
        ode.set_initial_value(init, 0.0)
        ref = [init]
        for tt in np.asarray(ts[1:]):
            # .copy(): modern scipy returns its internal state array aliased.
            ref.append(ode.integrate(tt).copy())
        ref = np.stack(ref)
        np.testing.assert_allclose(ys[:, 0, :], ref, rtol=5e-4, atol=5e-5)

    def test_ablate_field(self):
        params = init_roche_field(jax.random.PRNGKey(0), latent_dim=4, ablate=True)
        y = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        ctx = DoseContext(times=jnp.full((1, 1), 1e30), amounts=jnp.zeros(1))
        dy = roche_field(0.0, y, (params, ctx))
        np.testing.assert_allclose(dy[0], [2.0, -1.0, 4.0, -6.0])


class TestNeuralField:
    def test_shapes_and_bounds(self):
        params = init_neural_field(jax.random.PRNGKey(0), latent_dim=6)
        y = jnp.ones((4, 6))
        ctx = DoseContext(times=jnp.full((4, 1), 3.0), amounts=jnp.ones(4))
        dy = neural_field(3.0, y, (params, ctx))
        assert dy.shape == (4, 6)
        assert bool(jnp.all(jnp.abs(dy) <= 1.0))


class TestRealFields:
    def test_roche_real_shapes(self):
        B, T, latent = 3, 10, 10
        params = init_roche_real_field(jax.random.PRNGKey(0), latent_dim=latent, hidden_dim=8)
        ctx = CumDoseContext(actions=jnp.ones((T, B, 1)) * 0.1)
        y = jnp.ones((B, latent)) * 0.2
        dy = roche_real_field(4.5, y, (params, ctx))
        assert dy.shape == (B, latent)
        assert bool(jnp.all(jnp.isfinite(dy)))

    def test_roche_real_expert_only(self):
        params = init_roche_real_field(jax.random.PRNGKey(0), latent_dim=4, hidden_dim=8)
        assert "lin_hr" not in params
        ctx = CumDoseContext(actions=jnp.zeros((5, 2, 1)))
        dy = roche_real_field(1.0, jnp.ones((2, 4)), (params, ctx))
        assert dy.shape == (2, 4)

    def test_neural_real_and_2nd(self):
        B, T, latent = 2, 8, 6
        ctx = CumDoseContext(actions=jnp.ones((T, B, 1)))
        p1 = init_neural_real_field(jax.random.PRNGKey(0), latent, 1, 16)
        dy1 = neural_real_field(2.0, jnp.zeros((B, latent)), (p1, ctx))
        assert dy1.shape == (B, latent)

        p2 = init_neural_real_2nd_field(jax.random.PRNGKey(0), latent, 1, 16)
        y = jnp.arange(B * latent, dtype=jnp.float32).reshape(B, latent)
        dy2 = neural_real_2nd_field(2.0, y, (p2, ctx))
        assert dy2.shape == (B, latent)
        # position half integrates velocity half
        np.testing.assert_allclose(dy2[:, latent // 2:], y[:, : latent // 2])
