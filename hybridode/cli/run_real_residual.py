"""Real-data residual hybrid: gruode trained on scaled expert residuals.

Re-design of experiments/run_real_residual.py: subtract 0.1 * expert
prediction from the train fold past t0 (run_real_residual.py:96-113), set
data_val = data_train, train a gruode model on the residual, then evaluate
x_hat = 0.1 * expert + gruode on the test fold.
"""

from __future__ import annotations

import argparse
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..data import RealCohort, make_real_standin
from ..inference import init_vi, variational_training_loop
from ..utils.hostrng import host_key, host_split
from . import common
from .run_real import horizon_report
from .run_real_ensemble import _predict, init_and_load

MULTIPLIER = 0.1  # run_real_residual.py:100


def run(seed=666, train_sample_size=None, ode_method="explicit_adams", niters=1500, ode_step_div=1,
        encoder_output_dim=20, encoder_latent_ratio=1.2, init_path="model/",
        data_path="data/", standin=False, model_dir="model/", expert_actions_quirk=True):
    common.enable_compile_cache()
    key = host_key(seed)

    if standin:
        make_real_standin(data_path, data_type="5")
    dg = RealCohort(data_path=data_path, data_type="5", latent_dim=10, val_size=100, test_size=1000)
    dg.split_sample()
    if train_sample_size is not None:
        dg.set_train_size(train_sample_size)
        init_path = init_path + str(train_sample_size)

    t0 = 24
    key, k_e = host_split(key)
    params_e, model_e = init_and_load(dg, 4, encoder_latent_ratio, ode_step_div, "expert",
                                      ode_method, init_path, k_e, t0)

    # Residualize the train fold past t0 (run_real_residual.py:96-113); note
    # the expert here encodes the FULL sequence and decodes with [a, s] as
    # actions — the same quirk as the ensemble CLI.
    train = dg.data_train
    x_hat = _predict(params_e, model_e, train, train["measurements"].shape[0],
                     expert_quirk=expert_actions_quirk)
    x = train["measurements"]
    residual = x.at[t0:].set(x[t0:] - x_hat * MULTIPLIER)
    dg.data_train = dict(dg.data_train)
    dg.data_train["measurements"] = residual
    dg.data_val = dg.data_train
    dg.val_size = dg.train_size

    path = model_dir if train_sample_size is None else model_dir + str(train_sample_size)

    key, k_init, k_train = host_split(key, 3)
    model_ml = common.build_real_model(
        "gruode", dg.obs_dim, dg.action_dim, dg.static_dim, dg.t_max, dg.step_size,
        encoder_output_dim=encoder_output_dim, encoder_latent_ratio=encoder_latent_ratio,
        ode_method=ode_method, ode_step_div=ode_step_div, t0=t0,
    )
    params_ml = init_vi(k_init, model_ml)
    params_ml, _, _ = variational_training_loop(
        niters=niters, data_generator=dg, model=model_ml, params=params_ml, batch_size=100,
        lr=0.01, test_freq=100, key=k_train, path=path + "res", best_on_disk=1e9,
        early_stop=10, shuffle=False, train_expert=True,
    )

    data = dg.data_test
    x_hat1 = _predict(params_e, model_e, data, t0, expert_quirk=expert_actions_quirk)
    x_hat2 = _predict(params_ml, model_ml, data, t0, expert_quirk=False)
    x_hat = x_hat1 * MULTIPLIER + x_hat2

    eval_dict = {"x": np.asarray(data["measurements"]), "x_hat": np.asarray(x_hat),
                 "mask": np.asarray(data["masks"]), "name": "residual", "model_path": None}
    with open(init_path + "residual" + "eval.pkl", "wb") as f:
        pickle.dump(eval_dict, f)

    horizon_report(np.asarray(data["measurements"]), np.asarray(x_hat), np.asarray(data["masks"]), t0)


def main(argv=None):
    parser = argparse.ArgumentParser("Real data residual")
    parser.add_argument("--method", choices=["residual"], default="residual", type=str)
    parser.add_argument("--seed", default=666, type=int)
    parser.add_argument("--ode_method", default="explicit_adams", type=str)
    parser.add_argument("--ode_step_div", default=1, type=int)
    parser.add_argument("--encoder_output_dim", default=20, type=int)
    parser.add_argument("--encoder_latent_ratio", default=1.2, type=float)
    parser.add_argument("--niters", default=1500, type=int)
    parser.add_argument("--init_path", default="model/", type=str)
    parser.add_argument("--sample", default=None, type=int)
    parser.add_argument("--data_path", default="data/", type=str)
    parser.add_argument("--standin", default="n", type=str)
    parser.add_argument("--expert_actions_quirk", choices=["y", "n"], default="y", type=str,
                        help="y (reference parity): the expert residualizer decodes with [a, s] "
                             "as actions — the committed reference pipeline diverges through "
                             "this (VALIDATION.md); n: plain dose actions (bounded residuals)")
    args = parser.parse_args(argv)

    run(seed=args.seed, train_sample_size=args.sample, ode_method=args.ode_method, niters=args.niters,
        ode_step_div=args.ode_step_div, encoder_output_dim=args.encoder_output_dim,
        encoder_latent_ratio=args.encoder_latent_ratio, init_path=args.init_path,
        data_path=args.data_path, standin=args.standin == "y",
        expert_actions_quirk=args.expert_actions_quirk == "y")


if __name__ == "__main__":
    main()
