"""NNLS ensemble of pre-trained expert + neural models.

Re-design of experiments/run_simulation_ensemble.py: loads both checkpoints,
learns per-time-step NNLS weights on the val fold (130-138) — here one
vectorized closed-form solve — then evaluate_ensemble (or horizon + pickle).
"""

from __future__ import annotations

import argparse
import pickle

import jax
import jax.numpy as jnp

from ..config import EvalConfig, OptimConfig
from ..data import SyntheticCohort
from ..ensembles import learn_ensemble_weights
from ..eval import evaluate_ensemble, evaluate_ensemble_horizon
from ..inference import init_vi, load_checkpoint
from ..inference.elbo import decode, encode
from ..utils.hostrng import host_key, host_split
from . import common


def init_and_load(method, data_config, optim_config, key, init_path=None):
    """Build + optionally restore one member (run_simulation_ensemble.py:13-53)."""
    model = common.build_sim_model(method, data_config, elbo=True, ode_method=optim_config.ode_method)
    params = init_vi(key, model)
    if init_path is not None:
        params, _, _ = load_checkpoint(init_path, model.model_name)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, model


def predict_mean(params, model, data):
    x, a, mask = data["measurements"], data["actions"], data["masks"]
    mu, _ = encode(params, model, x, a, mask)
    x_hat, _ = decode(params, model, mu, data)
    return x_hat


def run(seed, data_path, sample, data_config, path, optim_config, eval_config,
        horizon=False, result_path=None):
    common.enable_compile_cache()
    key = host_key(seed)

    dg = SyntheticCohort.load(data_path)

    k1, k2 = host_split(key)
    params_e, model_e = init_and_load("expert", data_config, optim_config, k1, init_path=path)
    params_m, model_m = init_and_load("neural", data_config, optim_config, k2, init_path=path)

    val = {k: v[:, :sample] for k, v in dg.data_val.items()}
    x_hat_e = predict_mean(params_e, model_e, val)
    x_hat_m = predict_mean(params_m, model_m, val)
    weights_e, weights_m = learn_ensemble_weights(val["measurements"], x_hat_e, x_hat_m, eval_config.t0)
    print("Ensemble weights learned.")

    if not horizon:
        evaluate_ensemble(params_e, model_e, params_m, model_m, dg, optim_config.batch_size,
                          eval_config.t0, weight_expert=weights_e, weight_ml=weights_m)
    else:
        res = evaluate_ensemble_horizon(params_e, model_e, params_m, model_m, dg, optim_config.batch_size,
                                        eval_config.t0, weight_expert=weights_e, weight_ml=weights_m)
        with open(result_path, "wb") as f:
            pickle.dump(res, f)


def main(argv=None):
    parser = argparse.ArgumentParser("PKPD simulation ensemble")
    parser.add_argument("--method", choices=["ensemble"], default="ensemble", type=str)
    parser.add_argument("--device", choices=["0", "1", "c"], default="1", type=str)
    parser.add_argument("--seed", default=666, type=int)
    parser.add_argument("--sample", default=1000, type=int)
    parser.add_argument("--path", default=None, type=str)
    parser.add_argument("--t0", default=5, type=int)
    parser.add_argument("--restart", default=5, type=int)
    parser.add_argument("--eval", default="n", type=str)
    parser.add_argument("--data_path", default="data/datafile_dose_exp.pkl", type=str)
    parser.add_argument("--data_config", default=None, type=str)
    parser.add_argument("--horizon", default=False, type=bool)
    parser.add_argument("--result_path", default=None, type=str)
    args = parser.parse_args(argv)

    data_config = common.resolve_data_config(args.data_config, args.sample)
    optim_config = OptimConfig(shuffle=False, n_restart=args.restart)
    run(args.seed, args.data_path, args.sample, data_config, args.path, optim_config,
        EvalConfig(t0=args.t0), args.horizon, args.result_path)


if __name__ == "__main__":
    main()
