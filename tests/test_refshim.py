"""Accuracy of the torchdiffeq/properscoring shims (.ref_shim/) that the
reference-code control experiments run under (results/ref_seed_spread.md,
results/real_headtohead/*): the reference's numbers are only evidence if the
shim integrates as well as the real torchdiffeq would.

Checks the shim's adaptive DOPRI5 against scipy's RK45 on a stiff-ish
nonlinear system at the reference's tolerances, and the CRPS stand-in
against the closed-form ensemble estimator.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".ref_shim"))

torch = pytest.importorskip("torch")
scipy_integrate = pytest.importorskip("scipy.integrate")


def test_shim_dopri5_matches_scipy():
    from torchdiffeq import odeint  # the shim

    def f_torch(t, y):
        return torch.stack([-0.5 * y[0] + 0.2 * y[1] * y[1], -1.5 * y[1] + torch.sin(t)])

    def f_np(t, y):
        return [-0.5 * y[0] + 0.2 * y[1] * y[1], -1.5 * y[1] + np.sin(t)]

    y0 = torch.tensor([1.0, 0.5], dtype=torch.float64)
    ts = torch.linspace(0.0, 10.0, 21, dtype=torch.float64)
    got = odeint(f_torch, y0, ts, rtol=1e-7, atol=1e-8).numpy()
    want = scipy_integrate.solve_ivp(
        f_np, (0.0, 10.0), [1.0, 0.5], t_eval=np.asarray(ts), rtol=1e-9, atol=1e-10
    ).y.T
    # The shim evaluates output points with the DP5 4th-order dense-output
    # polynomial (same P matrix as scipy RK45.dense_output); before that
    # upgrade, linear interpolation capped grid accuracy at ~1e-3.
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)


@pytest.mark.slow
def test_shim_dopri5_raises_on_budget_exhaustion():
    """A stalled integration must raise (mirroring torchdiffeq's
    max_num_steps assertion), not silently pad the output grid with the
    last reached state — padded trajectories would corrupt the control
    experiments the parity claims rest on."""
    from torchdiffeq import odeint  # the shim

    def blowup(t, y):
        return y * y  # finite-time singularity at t=1 for y0=1

    y0 = torch.tensor([1.0], dtype=torch.float64)
    ts = torch.linspace(0.0, 2.0, 5, dtype=torch.float64)
    with pytest.raises(RuntimeError, match="budget"):
        odeint(blowup, y0, ts, rtol=1e-7, atol=1e-8)


def test_shim_crps_matches_bruteforce():
    from properscoring import crps_ensemble  # the shim

    rng = np.random.RandomState(0)
    obs = rng.randn(7)
    ens = rng.randn(7, 25)
    got = crps_ensemble(obs, ens)
    for i in range(7):
        term1 = np.abs(ens[i] - obs[i]).mean()
        spread = np.abs(ens[i][:, None] - ens[i][None, :]).mean()
        np.testing.assert_allclose(got[i], term1 - 0.5 * spread, rtol=1e-12)
