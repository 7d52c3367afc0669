"""Synthetic cohort generator tests, incl. LSODA parity of the ground truth."""

import numpy as np
import scipy.integrate

from hybridode.config import RocheConfig
from hybridode.data import SyntheticCohort, add_noise, make_train_cohort


def small_cohort(seed=666, n=40, latent=6, **kw):
    kwargs = dict(
        n_sample=n,
        obs_dim=10,
        t_max=14,
        step_size=1,
        roche_config=RocheConfig(kel=1),
        output_sigma=0.2,
        dose_max=10,
        latent_dim=latent,
        sparsity=0.5,
        output_sparsity=0.5,
        p_remove=0.5,
        val_size=8,
        test_size=8,
    )
    kwargs.update(kw)
    dg = SyntheticCohort(rng=np.random.RandomState(seed), **kwargs)
    dg.generate_data()
    dg.split_sample()
    return dg


class TestGeneration:
    def test_shapes_and_layout(self):
        dg = small_cohort()
        T = 15
        assert dg.measurements.shape == (T, 40, 10)
        assert dg.actions.shape == (T, 40, 1)
        assert dg.latents.shape == (T, 40, 6)
        assert dg.masks.shape == (T, 40, 10)

    def test_normalization(self):
        dg = small_cohort()
        np.testing.assert_allclose(dg.measurements.mean(axis=(0, 1)), 0.0, atol=1e-4)
        np.testing.assert_allclose(dg.measurements.std(axis=(0, 1)), 1.0, atol=1e-3)

    def test_one_dose_per_patient(self):
        dg = small_cohort()
        n_doses = (dg.actions[..., 0] != 0).sum(axis=0)
        assert np.all(n_doses == 1)
        amounts = dg.actions[..., 0].max(axis=0)
        assert np.all(amounts >= 0) and np.all(amounts <= 10)

    def test_mask_rate(self):
        dg = small_cohort(p_remove=0.5)
        rate = dg.masks.mean()
        assert 0.4 < rate < 0.6

    def test_ground_truth_matches_lsoda(self):
        """Per-patient LSODA (the reference's generator, dataloader.py:96-161)
        vs our batched dopri5 ground truth."""
        dg = small_cohort(n=20)
        cfg = dg.roche_config
        ml_coef = dg.ml_coef

        def rhs(t, y, dose_times, dose_amount):
            Disease, ImmuneReact, Immunity, Dose2 = y[0], y[1], y[2], y[3]
            active = t >= dose_times
            Dose = dose_amount * np.sum(np.exp(cfg.kel * (dose_times - t) * active) * active)
            d1 = (Disease * cfg.k_disprog - Disease * Immunity**cfg.HillCure * cfg.k_discure_immunity
                  - Disease * ImmuneReact * cfg.k_discure_immunereact)
            d2 = (Disease * cfg.k_immune_disease - ImmuneReact * cfg.k_immune_off
                  + Disease * ImmuneReact * cfg.k_immune_feedback
                  + (ImmuneReact**cfg.HillPatho * cfg.emax_patho)
                  / (cfg.ec50_patho**cfg.HillPatho + ImmuneReact**cfg.HillPatho)
                  - Dose2 * ImmuneReact * cfg.k_dexa)
            d3 = ImmuneReact * cfg.k_immunity
            d4 = cfg.kel * Dose - cfg.kel * Dose2
            ml = np.tanh(y @ ml_coef)
            return np.concatenate([[d1, d2, d3, d4], ml])

        ts = np.arange(0.0, 15.0)
        for b in [0, 7, 13]:
            dose_times = dg.dose_time[b].astype(np.float64)
            dose_amount = float(dg.dose_amount[b])
            y0 = dg.latents[0, b].astype(np.float64)
            sol = scipy.integrate.solve_ivp(
                rhs, (0, 14), y0, t_eval=ts, method="LSODA", rtol=1e-9, atol=1e-11,
                args=(dose_times, dose_amount),
            )
            np.testing.assert_allclose(dg.latents[:, b, :], sol.y.T, rtol=2e-3, atol=2e-4)

    def test_noise_variant(self):
        dg = small_cohort()
        base = dg.measurements.copy()
        add_noise(dg, 0.4, seed=123)
        delta = dg.measurements - base
        np.testing.assert_allclose(delta.std(), 0.2, atol=0.02)


class TestSplitsAndBatching:
    def test_split_sizes(self):
        dg = small_cohort()
        assert dg.data_train["measurements"].shape[1] == 24
        assert dg.data_val["measurements"].shape[1] == 8
        assert dg.data_test["measurements"].shape[1] == 8

    def test_set_train_size(self):
        dg = small_cohort()
        dg.set_train_size(26)  # 26 - 8 - 8 = 10 train
        assert dg.data_train["measurements"].shape[1] == 10

    def test_minibatch_and_split(self):
        dg = small_cohort()
        rng = np.random.RandomState(0)
        b = dg.get_mini_batch("train", 4, rng)
        assert b["measurements"].shape == (15, 4, 10)
        s = dg.get_split("test", 4, 1)
        np.testing.assert_array_equal(np.asarray(s["measurements"]),
                                      np.asarray(dg.data_test["measurements"][:, 4:8]))

    def test_save_load_roundtrip(self, tmp_path):
        dg = small_cohort()
        p = str(tmp_path / "cohort.pkl")
        dg.save(p)
        dg2 = SyntheticCohort.load(p)
        np.testing.assert_array_equal(dg2.measurements, dg.measurements)
        assert dg2.data_train["measurements"].shape[1] == dg.data_train["measurements"].shape[1]

    def test_determinism(self):
        a = small_cohort(seed=666)
        b = small_cohort(seed=666)
        np.testing.assert_array_equal(a.measurements, b.measurements)
        np.testing.assert_array_equal(a.actions, b.actions)
