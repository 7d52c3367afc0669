"""Real-data NNLS ensemble of pre-trained expert + gruode models.

Re-design of experiments/run_real_ensemble.py. Reproduced reference quirks,
documented: the expert member decodes with `[a, s]` concatenated as its
action array (run_real_ensemble.py:98-101, 133) — the depot kernel then sums
statics as if they were doses; weights are learned on the val fold past t0
with one NNLS per time step (here a single vectorized closed-form solve).
"""

from __future__ import annotations

import argparse
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..data import RealCohort, make_real_standin
from ..ensembles.nnls import nnls2
from ..inference import init_vi, load_checkpoint
from ..inference.elbo import decode, encode
from ..utils.hostrng import host_key, host_split
from . import common
from .run_real import horizon_report


def init_and_load(dg, encoder_output_dim, encoder_latent_ratio, ode_step_div, method, ode_method,
                  init_path, key, t0=24):
    model = common.build_real_model(
        method, dg.obs_dim, dg.action_dim, dg.static_dim, dg.t_max, dg.step_size,
        encoder_output_dim=encoder_output_dim, encoder_latent_ratio=encoder_latent_ratio,
        ode_method=ode_method, ode_step_div=ode_step_div, t0=t0,
    )
    params = init_vi(key, model)
    if init_path is not None:
        params, _, _ = load_checkpoint(init_path, model.model_name)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, model


def _predict(params, model, data, t0, expert_quirk: bool):
    x, a, mask, s = data["measurements"], data["actions"], data["masks"], data["statics"]
    a_in = jnp.concatenate([a, s], axis=-1)
    mu, _ = encode(params, model, x[:t0], a_in[:t0], mask[:t0])
    dec_batch = dict(data)
    if expert_quirk:
        dec_batch["actions"] = a_in  # reference passes [a, s] to the expert decoder
    x_hat, _ = decode(params, model, mu, dec_batch)
    return x_hat


def run(seed=666, train_sample_size=None, ode_method="explicit_adams", ode_step_div=1,
        encoder_output_dim=20, encoder_latent_ratio=1.2, init_path="model/",
        data_path="data/", standin=False, expert_actions_quirk=True):
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
    k1, k2 = host_split(key)
    params_e, model_e = init_and_load(dg, 4, encoder_latent_ratio, ode_step_div, "expert",
                                      ode_method, init_path, k1, t0)
    params_m, model_m = init_and_load(dg, encoder_output_dim, encoder_latent_ratio, ode_step_div,
                                      "gruode", ode_method, init_path, k2, t0)

    # Learn ensemble weights on the val fold (run_real_ensemble.py:89-117):
    # the reference encodes the FULL sequence here (not just [:t0]).
    val = dg.data_val
    x_hat_e = _predict(params_e, model_e, val, val["measurements"].shape[0],
                       expert_quirk=expert_actions_quirk)
    x_hat_m = _predict(params_m, model_m, val, val["measurements"].shape[0], expert_quirk=False)

    x_post = val["measurements"][t0:]  # (T', B, D)
    Tp, B, D = x_post.shape
    w1, w2 = nnls2(
        jnp.reshape(x_hat_e[:Tp], (Tp, B * D)),
        jnp.reshape(x_hat_m[:Tp], (Tp, B * D)),
        jnp.reshape(x_post, (Tp, B * D)),
    )
    weights_e = jnp.broadcast_to(w1[:, None, None], (Tp, 1, D))
    weights_m = jnp.broadcast_to(w2[:, None, None], (Tp, 1, D))
    print("Ensemble weights learned.")

    data = dg.data_test
    x_hat1 = _predict(params_e, model_e, data, t0, expert_quirk=expert_actions_quirk)
    x_hat2 = _predict(params_m, model_m, data, t0, expert_quirk=False)
    x_hat = x_hat1 * weights_e + x_hat2 * weights_m

    eval_dict = {"x": np.asarray(data["measurements"]), "x_hat": np.asarray(x_hat),
                 "mask": np.asarray(data["masks"]), "name": "ensemble", "model_path": None}
    with open(init_path + "ensemble" + "eval.pkl", "wb") as f:
        pickle.dump(eval_dict, f)

    horizon_report(np.asarray(data["measurements"]), np.asarray(x_hat), np.asarray(data["masks"]), t0)


def main(argv=None):
    parser = argparse.ArgumentParser("Real data ensemble")
    parser.add_argument("--method", choices=["ensemble"], default="ensemble", type=str)
    parser.add_argument("--seed", default=666, type=int)
    parser.add_argument("--ode_method", default="explicit_adams", type=str)
    parser.add_argument("--ode_step_div", default=1, type=int)
    parser.add_argument("--encoder_output_dim", default=20, type=int)
    parser.add_argument("--encoder_latent_ratio", default=1.2, type=float)
    parser.add_argument("--weight", default="n", type=str)
    parser.add_argument("--niters", default=1500, type=int)
    parser.add_argument("--init_path", default="model/", type=str)
    parser.add_argument("--sample", default=None, type=int)
    parser.add_argument("--data_path", default="data/", type=str)
    parser.add_argument("--standin", default="n", type=str)
    parser.add_argument("--expert_actions_quirk", choices=["y", "n"], default="y", type=str,
                        help="y (reference parity): the expert member decodes with [a, s] "
                             "concatenated as its action array (run_real_ensemble.py:98-101); "
                             "n: plain dose actions")
    args = parser.parse_args(argv)

    run(seed=args.seed, train_sample_size=args.sample, ode_method=args.ode_method,
        ode_step_div=args.ode_step_div, encoder_output_dim=args.encoder_output_dim,
        encoder_latent_ratio=args.encoder_latent_ratio, init_path=args.init_path,
        data_path=args.data_path, standin=args.standin == "y",
        expert_actions_quirk=args.expert_actions_quirk == "y")


if __name__ == "__main__":
    main()
