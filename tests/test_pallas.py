"""Pallas fused-RK4 kernel vs the lax.scan fixed-step solver (interpret mode
on CPU; the same kernel compiles natively on TPU).

Tolerances: summation-order differences (~1 ulp/step) amplify near the
|x|**p kink when random-init trajectories cross zero, so comparisons use
rtol=2e-3 (observed max deviation ~1e-3 at the final grid point)."""

import jax
import jax.numpy as jnp
import numpy as np

from hybridode.fields import DoseContext, init_roche_field, roche_field
from hybridode.ops.pallas import roche_rk4_trajectory
from hybridode.solvers import odeint


def _reference_traj(params, ctx, y0, ts, n_sub):
    return odeint(roche_field, y0, ts, (params, ctx), method="rk4", n_substeps=n_sub)


class TestRocheKernel:
    def _setup(self, latent, B=20, seed=0):
        rng = np.random.RandomState(seed)
        params = init_roche_field(jax.random.PRNGKey(seed), latent)
        if "ml_net" in params:
            # Tame the random remainder net: divergent trajectories make the
            # kernel-vs-scan comparison ill-posed.
            params["ml_net"][0]["w"] = params["ml_net"][0]["w"] * 0.2
            params["ml_net"][0]["b"] = params["ml_net"][0]["b"] * 0.0
        y0 = jnp.asarray(rng.exponential(0.02, (B, latent)).astype(np.float32))
        times = jnp.asarray(rng.randint(0, 5, B).astype(np.float32))
        amounts = jnp.asarray((rng.rand(B) * 2).astype(np.float32))
        ctx = DoseContext(times=times[:, None], amounts=amounts)
        # Short horizon: some random inits blow up superexponentially past
        # t~6, where comparing two f32 integrators is ill-posed.
        ts = jnp.arange(0.0, 6.0)
        return params, ctx, y0, ts

    def test_hybrid_matches_scan_solver(self):
        params, ctx, y0, ts = self._setup(latent=6)
        ml = params["ml_net"][0]
        got = roche_rk4_trajectory(y0, ctx.times[:, 0], ctx.amounts, params["expert"],
                                   ml["w"], ml["b"], ts, n_substeps=2, interpret=True)
        want = _reference_traj(params, ctx, y0, ts, n_sub=2)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)

    def test_expert_only(self):
        params, ctx, y0, ts = self._setup(latent=4)
        got = roche_rk4_trajectory(y0, ctx.times[:, 0], ctx.amounts, params["expert"],
                                   None, None, ts, n_substeps=2, interpret=True)
        want = _reference_traj(params, ctx, y0, ts, n_sub=2)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)

    def test_full_width_no_pad(self):
        # latent=8 -> ml_dim=4 -> zero pad rows: the concatenate must not
        # emit a zero-sized block (Mosaic rejects 0-width vectors; caught on
        # real TPU by bench_scale.py, round 3).
        params, ctx, y0, ts = self._setup(latent=8)
        ml = params["ml_net"][0]
        got = roche_rk4_trajectory(y0, ctx.times[:, 0], ctx.amounts, params["expert"],
                                   ml["w"], ml["b"], ts, n_substeps=2, interpret=True)
        want = _reference_traj(params, ctx, y0, ts, n_sub=2)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)

    def test_batch_padding(self):
        # B not a multiple of 128: padded lanes must not contaminate outputs.
        params, ctx, y0, ts = self._setup(latent=6, B=7)
        ml = params["ml_net"][0]
        got = roche_rk4_trajectory(y0, ctx.times[:, 0], ctx.amounts, params["expert"],
                                   ml["w"], ml["b"], ts, n_substeps=1, interpret=True)
        assert got.shape == (len(ts), 7, 6)
        want = _reference_traj(params, ctx, y0, ts, n_sub=1)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)
