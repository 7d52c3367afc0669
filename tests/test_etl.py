"""Real-data ETL pipeline tests on synthetic long-format records."""

import numpy as np
import pandas as pd

from hybridode.data import RealCohort
from hybridode.data.etl import (
    build_static_array,
    build_temporal_arrays,
    build_treatment_array,
    filter_los_cohort,
    run_etl,
)


def make_long_df(n_patients=6, t_max=20, features=("hr", "spo2", "map"), seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for p in range(n_patients):
        span = rng.randint(5, t_max)
        for t in range(span):
            for f in features:
                if rng.rand() < 0.6:
                    rows.append(dict(patient_id=p, hour=t + rng.rand() * 0.5, feature=f,
                                     value=rng.randn() * 10 + 50))
    return pd.DataFrame(rows)


class TestETL:
    def test_los_filter(self):
        df = pd.DataFrame({
            "patient_id": [1, 1, 2, 2, 3, 3],
            "hour": [0, 100, 0, 10, 0, 800],
        })
        out = filter_los_cohort(df, min_los=50, max_los=500)
        assert set(out.patient_id) == {1}

    def test_temporal_arrays(self):
        df = make_long_df()
        x, mask, patients = build_temporal_arrays(df, ["hr", "spo2", "map"], t_max=20)
        assert x.shape == (20, 6, 3) and mask.shape == (20, 6, 3)
        # normalized over observed entries
        obs = x[:, :, 0][mask[:, :, 0] > 0]
        np.testing.assert_allclose(obs.mean(), 0.0, atol=1e-4)
        np.testing.assert_allclose(obs.std(), 1.0, atol=1e-3)
        # unobserved entries are zero
        assert np.all(x[mask == 0] == 0)

    def test_median_aggregation(self):
        df = pd.DataFrame({
            "patient_id": [0, 0, 0],
            "hour": [1.1, 1.7, 1.9],
            "feature": ["hr"] * 3,
            "value": [1.0, 5.0, 100.0],
        })
        x, mask, _ = build_temporal_arrays(df, ["hr"], t_max=3, normalize=False)
        assert x[1, 0, 0] == 5.0  # median, not mean

    def test_static_array(self):
        df = pd.DataFrame({"patient_id": [0, 1, 2], "age": [60, 70, np.nan], "bmi": [25, 30, 28]})
        s = build_static_array(df, ["age", "bmi"], patients=[0, 1, 2])
        assert s.shape == (3, 2)
        assert np.all(np.isfinite(s))  # NaN imputed

    def test_treatment_array(self):
        df = pd.DataFrame({"patient_id": [0, 0, 1], "hour": [2.2, 2.8, 5.0], "dose": [4.0, 4.0, 6.0]})
        a = build_treatment_array(df, t_max=8, patients=[0, 1])
        assert a.shape == (8, 2, 1)
        assert a[2, 0, 0] > 0 and a[5, 1, 0] > 0  # doses summed per bucket

    def test_run_etl_roundtrip(self, tmp_path):
        temporal = make_long_df(n_patients=8, t_max=30)
        static = pd.DataFrame({"patient_id": range(8), "age": np.arange(8) * 5 + 40,
                               "male": [0, 1] * 4})
        treatment = pd.DataFrame({"patient_id": [0, 2, 4], "hour": [3, 7, 9], "dose": [6.0, 6.0, 6.0]})
        out = str(tmp_path)
        x, a, mask, s, patients = run_etl(temporal, static, treatment,
                                          features=["hr", "spo2", "map"], covariates=["age", "male"],
                                          t_max=30, out_dir=out, data_type="5",
                                          min_los=4, max_los=100)
        # the written pickles load through RealCohort
        dg = RealCohort(data_path=out, data_type="5", latent_dim=10, val_size=2, test_size=2)
        dg.split_sample()
        assert dg.obs_dim == 3 and dg.static_dim == 2
        b = dg.get_split("train", 2, 0)
        assert b["statics"].shape[0] == dg.t_max


class TestRealCohort:
    def test_standin_deterministic(self, tmp_path):
        from hybridode.data import make_real_standin

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        make_real_standin(a, n_sample=32, t_max=20, obs_dim=5, static_dim=3)
        make_real_standin(b, n_sample=32, t_max=20, obs_dim=5, static_dim=3)
        import pickle

        for name in ("array_xt5.pkl", "array_at5.pkl", "array_x_constant.pkl"):
            xa = pickle.load(open(f"{a}/{name}", "rb"))
            xb = pickle.load(open(f"{b}/{name}", "rb"))
            np.testing.assert_array_equal(xa, xb)

    def test_split_and_train_size(self, tmp_path):
        from hybridode.data import RealCohort, make_real_standin

        p = str(tmp_path)
        make_real_standin(p, n_sample=40, t_max=12, obs_dim=4, static_dim=2)
        dg = RealCohort(data_path=p, data_type="5", latent_dim=6, val_size=8, test_size=8)
        dg.split_sample()
        assert dg.train_size == 24
        assert dg.data_test["measurements"].shape == (12, 8, 4)
        assert dg.data_train["statics"].shape == (12, 24, 2)
        assert dg.data_train["latents"].shape == (12, 24, 6)
        dg.set_train_size(10)
        assert dg.data_train["measurements"].shape[1] == 10
        b = dg.get_mini_batch("train", 4)
        assert b["measurements"].shape == (12, 4, 4)

    def test_train_size_bounds(self, tmp_path):
        from hybridode.data import RealCohort, make_real_standin

        p = str(tmp_path)
        make_real_standin(p, n_sample=20, t_max=8, obs_dim=3, static_dim=2)
        dg = RealCohort(data_path=p, data_type="5", latent_dim=4, val_size=4, test_size=4)
        dg.split_sample()
        try:
            dg.set_train_size(0)
            assert False, "expected ValueError"
        except ValueError:
            pass
        # over-ask clamps to the pool (reference real.sh passes sample=1000
        # against a 997-patient pool)
        dg.set_train_size(13)
        assert dg.train_size == 12
        assert dg.data_train["measurements"].shape[1] == 12
