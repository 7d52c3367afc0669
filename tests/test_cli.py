"""End-to-end CLI smoke tests (tiny cohorts, few iterations)."""

import os
import pickle

import numpy as np
import pytest

from hybridode.config import DataConfig, EvalConfig, OptimConfig, RocheConfig
from hybridode.data import SyntheticCohort


@pytest.fixture(scope="module")
def small_data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("data")
    dg = SyntheticCohort(
        n_sample=48, obs_dim=8, t_max=14, step_size=1, roche_config=RocheConfig(kel=1),
        output_sigma=0.2, dose_max=10, latent_dim=6, sparsity=0.5, output_sparsity=0.5,
        p_remove=0.5, val_size=8, test_size=16, rng=np.random.RandomState(666),
    )
    dg.generate_data()
    dg.split_sample()
    path = str(tmp / "cohort.pkl")
    dg.save(path)
    return path, tmp


DC = DataConfig(obs_dim=8, latent_dim=6)


class TestRunSimulation:
    @pytest.mark.parametrize("method", [
        pytest.param("expert", marks=pytest.mark.slow),
        pytest.param("hybrid", marks=pytest.mark.slow),
        "neural",  # one end-to-end train+eval stays in the fast tier
    ])
    def test_train_and_eval(self, small_data, method, tmp_path):
        from hybridode.cli.run_simulation import run

        data_path, _ = small_data
        params, model = run(
            seed=1, elbo=True, eval_only=False, init_path=None, data_path=data_path,
            sample=40, data_config=DC, model_method=method, path=str(tmp_path) + "/",
            optim_config=OptimConfig(shuffle=False, n_restart=1, batch_size=8, niters=4, test_freq=2,
                                     early_stop=10),
            eval_config=EvalConfig(t0=5),
        )
        assert os.path.exists(str(tmp_path) + "/" + model.model_name)


class TestEnsembleResidual:
    @pytest.mark.slow
    def test_ensemble_pipeline(self, small_data, tmp_path):
        from hybridode.cli.run_simulation import run as run_sim
        from hybridode.cli.run_simulation_ensemble import run as run_ens

        data_path, _ = small_data
        path = str(tmp_path) + "/"
        oc = OptimConfig(shuffle=False, n_restart=1, batch_size=8, niters=2, test_freq=2, early_stop=10)
        for m in ("expert", "neural"):
            run_sim(seed=1, elbo=True, eval_only=False, init_path=None, data_path=data_path,
                    sample=40, data_config=DC, model_method=m, path=path,
                    optim_config=oc, eval_config=EvalConfig(t0=5))
        run_ens(seed=1, data_path=data_path, sample=8, data_config=DC, path=path,
                optim_config=OptimConfig(batch_size=8), eval_config=EvalConfig(t0=5))

    @pytest.mark.slow
    def test_residual_pipeline(self, small_data, tmp_path):
        from hybridode.cli.run_simulation import run as run_sim
        from hybridode.cli.run_simulation_residual import run as run_res

        data_path, _ = small_data
        path = str(tmp_path) + "/"
        oc = OptimConfig(shuffle=False, n_restart=1, batch_size=8, niters=2, test_freq=2, early_stop=10)
        run_sim(seed=1, elbo=True, eval_only=False, init_path=None, data_path=data_path,
                sample=40, data_config=DC, model_method="expert", path=path,
                optim_config=oc, eval_config=EvalConfig(t0=5))
        run_res(seed=1, eval_only=False, data_path=data_path, sample=8, data_config=DC,
                path=path, res_path=path + "res", optim_config=oc, eval_config=EvalConfig(t0=5))


class TestFlow:
    @pytest.mark.slow
    def test_flow_training(self, small_data, tmp_path):
        from hybridode.cli.run_simulation_flow import run

        data_path, _ = small_data
        run(seed=1, eval_only=False, data_path=data_path, sample=40, data_config=DC,
            path=str(tmp_path) + "/",
            optim_config=OptimConfig(shuffle=False, n_restart=1, batch_size=8, niters=2, test_freq=2),
            eval_config=EvalConfig(t0=5), num_flows=2, mc_size=4, arg_itr=2)


class TestRunEval:
    @pytest.mark.slow
    def test_horizon_eval(self, small_data, tmp_path):
        from hybridode.cli.run_eval import run as run_eval
        from hybridode.cli.run_simulation import run as run_sim

        data_path, _ = small_data
        path = str(tmp_path) + "/"
        run_sim(seed=1, elbo=True, eval_only=False, init_path=None, data_path=data_path,
                sample=40, data_config=DC, model_method="hybrid", path=path,
                optim_config=OptimConfig(shuffle=False, n_restart=1, batch_size=8, niters=2, test_freq=2),
                eval_config=EvalConfig(t0=5))
        result_path = path + "horizon.pkl"
        res = run_eval(seed=1, data_path=data_path, data_config=DC, model_method="hybrid",
                       path=path, optim_config=OptimConfig(batch_size=8),
                       eval_config=EvalConfig(t0=5), result_path=result_path)
        assert os.path.exists(result_path)
        with open(result_path, "rb") as f:
            d = pickle.load(f)
        assert d["rmse_x"].shape == (10,)


class TestRunReal:
    def test_real_standin_pipeline(self, tmp_path):
        from hybridode.cli.run_real import run

        data_path = str(tmp_path / "realdata") + "/"
        params, model = run(
            seed=1, train_sample_size=None, method="gruode", niters=2, eval_only=False,
            data_path=data_path, standin=True, batch_size=16, val_size=16, test_size=32,
            standin_kwargs=dict(n_sample=96, t_max=40, obs_dim=6, static_dim=3),
            model_dir=str(tmp_path / "m") + "/",
        )

    @pytest.mark.slow
    def test_real_ode_pipeline(self, tmp_path):
        from hybridode.cli.run_real import run

        data_path = str(tmp_path / "realdata") + "/"
        params, model = run(
            seed=1, train_sample_size=None, method="hybrid", niters=2, eval_only=False,
            data_path=data_path, standin=True, batch_size=16, val_size=16, test_size=32,
            standin_kwargs=dict(n_sample=96, t_max=40, obs_dim=6, static_dim=3),
            model_dir=str(tmp_path / "m") + "/",
        )


class TestEvalMesh:
    @pytest.mark.slow  # ~22 s: trains then re-evals via the CLI twice; the
    # sharded-eval parity itself is covered in-process by tests/test_parallel.py
    def test_eval_mesh_cli_path(self, small_data, tmp_path, capsys):
        """--eval_mesh DPxMC: the CLI's sharded-eval branch produces the same
        CSV metrics as the single-device eval (same key schedule)."""
        from hybridode.cli.run_simulation import run

        data_path, _ = small_data
        oc = OptimConfig(shuffle=False, n_restart=1, batch_size=8, niters=2, test_freq=2,
                         early_stop=10)
        run(seed=1, elbo=True, eval_only=False, init_path=None, data_path=data_path,
            sample=40, data_config=DC, model_method="expert", path=str(tmp_path) + "/",
            optim_config=oc, eval_config=EvalConfig(t0=5))
        single = [l for l in capsys.readouterr().out.splitlines() if l.startswith(("rmse", "cprs"))]
        run(seed=1, elbo=True, eval_only=True, init_path=None, data_path=data_path,
            sample=40, data_config=DC, model_method="expert", path=str(tmp_path) + "/",
            optim_config=oc, eval_config=EvalConfig(t0=5), eval_mesh=(4, 2))
        sharded = [l for l in capsys.readouterr().out.splitlines() if l.startswith(("rmse", "cprs"))]
        assert len(sharded) == 4
        # point metrics (col 2) match; bootstrap SEs (col 3) use fresh resamples
        for s, g in zip(single, sharded):
            assert s.split(",")[:2] == g.split(",")[:2]
