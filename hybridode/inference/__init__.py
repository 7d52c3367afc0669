"""Variational inference: losses, checkpointing, training loop."""

from .checkpoint import load_checkpoint, save_checkpoint
from .elbo import PRIORS, VIModel, flow_loss, init_vi, loss_fn, mc_kl, real_loss, sim_loss
from .train import make_eval_loss, make_optimizer, make_train_step, param_labels, variational_training_loop

__all__ = [
    "VIModel",
    "init_vi",
    "loss_fn",
    "sim_loss",
    "real_loss",
    "flow_loss",
    "mc_kl",
    "PRIORS",
    "save_checkpoint",
    "load_checkpoint",
    "variational_training_loop",
    "make_train_step",
    "make_eval_loss",
    "make_optimizer",
    "param_labels",
]
