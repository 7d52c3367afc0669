"""Pytree checkpointing with the reference's best-on-disk semantics.

Reference: model.py:1135-1148 (`save` writes {itr, encoder_state_dict,
decoder_state_dict, best_loss} to path + model_name) and
training_utils.py:75-93 (save only on cross-restart improvement, reload best
at the end, save-at-itr-0 fallback).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, model_name: str, params, itr: int, best_loss: float) -> str:
    full = path + model_name
    os.makedirs(os.path.dirname(full) or ".", exist_ok=True)
    payload = {
        "itr": int(itr),
        "encoder_state_dict": _to_host(params["encoder"]),
        "decoder_state_dict": _to_host(params["decoder"]),
        "best_loss": float(best_loss),
    }
    with open(full, "wb") as f:
        pickle.dump(payload, f)
    return full


def load_checkpoint(path: str, model_name: str):
    with open(path + model_name, "rb") as f:
        payload = pickle.load(f)
    params = {
        "encoder": jax.tree_util.tree_map(lambda x: x, payload["encoder_state_dict"]),
        "decoder": jax.tree_util.tree_map(lambda x: x, payload["decoder_state_dict"]),
    }
    return params, payload["itr"], payload["best_loss"]
