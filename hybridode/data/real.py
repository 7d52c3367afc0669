"""Real-data (ICU cohort) loader + synthetic stand-in generator.

Re-design of `DataGeneratorReal` (reference dataloader.py:344-464): loads the
four DDW pickles — `array_xt{type}.pkl` (measurements, (T, B, D)),
`array_xt_mask{type}.pkl`, `array_at{type}.pkl` (doses, (T, B, 1)) and
`array_x_constant.pkl` (statics, (B, S)) — tiles statics over the time axis
(dataloader.py:392-393), zero-fills the latents placeholder
(dataloader.py:397), and exposes the same fold-split / chunked-batch API as
:class:`SyntheticCohort` so the training loop is generator-agnostic.

The true DDW arrays are license-restricted; :func:`make_real_standin` writes
deterministic synthetic arrays of the same shapes/pickle names so the whole
real-data track (8 methods x 4 sample sizes, run_real.py) can be validated
end-to-end without the private data.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax.numpy as jnp
import numpy as np

_FILES = ("array_xt{}.pkl", "array_xt_mask{}.pkl", "array_at{}.pkl", "array_x_constant.pkl")


def _load(path: str, name: str) -> np.ndarray:
    with open(os.path.join(path, name), "rb") as f:
        return np.asarray(pickle.load(f), np.float32)


class RealCohort:
    """Fold-split view over the DDW arrays (dataloader.py:344-464).

    Unlike the reference (which keeps the full tensors on the torch device and
    re-slices per batch), the folds are materialized once as JAX arrays; the
    chunked `get_split` access pattern the training loop uses (shuffle=False,
    run_real.py regime) then hits static shapes only — one XLA compile.
    """

    _KEYS = ("measurements", "actions", "latents", "masks", "statics")

    def __init__(
        self,
        data_path: str = "data/",
        data_type: str = "5",
        latent_dim: int = 10,
        val_size: int = 100,
        test_size: int = 1000,
    ):
        self.measurements = _load(data_path, f"array_xt{data_type}.pkl")
        self.masks = _load(data_path, f"array_xt_mask{data_type}.pkl")
        self.actions = _load(data_path, f"array_at{data_type}.pkl")
        statics = _load(data_path, "array_x_constant.pkl")  # (B, S)

        t, b, d = self.masks.shape
        self.time_dim = t
        # Reference quirk kept: t_max IS the time dimension for real data and
        # the grid step is one hour (dataloader.py:387-389).
        self.t_max = t
        self.step_size = 1.0
        self.n_sample = b
        self.obs_dim = d
        self.action_dim = self.actions.shape[2]
        self.latent_dim = int(latent_dim)
        self.static_dim = statics.shape[1]

        # Statics tiled over time so every batch key is (T, B, ·)
        # (dataloader.py:392-393).
        self.statics = np.broadcast_to(statics[None, :, :], (t, b, self.static_dim))
        self.latents = np.zeros((t, b, self.latent_dim), np.float32)

        assert self.measurements.shape == (t, b, d)
        assert self.actions.shape[:2] == (t, b)

        self.val_size = int(val_size)
        self.test_size = int(test_size)
        self.train_size = int(b - val_size - test_size)
        self.rng = np.random.RandomState()
        self.data_train = self.data_val = self.data_test = None

    # --- splits / batching (same protocol as SyntheticCohort) ---------------

    def _tensors(self):
        return {k: getattr(self, k) for k in self._KEYS}

    def split_sample(self):
        t = self._tensors()
        tr, va = self.train_size, self.val_size
        self.data_train = {k: jnp.asarray(v[:, :tr]) for k, v in t.items()}
        self.data_val = {k: jnp.asarray(v[:, tr : tr + va]) for k, v in t.items()}
        self.data_test = {k: jnp.asarray(v[:, tr + va :]) for k, v in t.items()}

    def set_train_size(self, train_sample_size: int):
        """Restrict training to the first N patients (run_real.py:34-36).

        The reference only re-points `self.train_size` (dataloader.py:463-464)
        and relies on chunked sequential batching to never reach past it;
        re-slicing `data_train` is behaviorally identical under that access
        pattern and keeps `get_mini_batch` consistent too. A request larger
        than the available train pool clamps to the pool (the reference's
        real.sh passes sample=1000 against a 997-patient pool and silently
        trains on what exists).
        """
        if train_sample_size <= 0:
            raise ValueError(f"train_sample_size={train_sample_size} out of range")
        avail = self.n_sample - self.val_size - self.test_size
        if train_sample_size > avail:
            print(f"set_train_size: clamping {train_sample_size} -> {avail} (pool size)")
            train_sample_size = avail
        self.train_size = int(train_sample_size)
        self.data_train = {k: v[:, : self.train_size] for k, v in self.data_train.items()}

    def set_val_size(self, n_val: int):
        self.val_size = int(n_val)
        self.data_val = {k: v[:, :n_val] for k, v in self.data_val.items()}

    def _fold(self, fold: str):
        assert fold in ("train", "val", "test")
        return {"train": self.data_train, "val": self.data_val, "test": self.data_test}[fold]

    def get_mini_batch(self, fold: str, batch_size: int, rng: Optional[np.random.RandomState] = None):
        data = self._fold(fold)
        n = data["measurements"].shape[1]
        r = rng if rng is not None else self.rng
        idx = jnp.asarray(r.choice(n, batch_size, replace=False))
        return {k: jnp.take(v, idx, axis=1) for k, v in data.items()}

    def get_split(self, fold: str, batch_size: int, chunk: int = 0):
        data = self._fold(fold)
        lo, hi = chunk * batch_size, (chunk + 1) * batch_size
        return {k: v[:, lo:hi] for k, v in data.items()}


def make_real_standin(
    data_path: str,
    data_type: str = "5",
    n_sample: int = 2097,
    t_max: int = 97,
    obs_dim: int = 28,
    static_dim: int = 11,
    latent_dim: int = 6,
    mask_rate: float = 0.3,
    seed: int = 2021,
) -> None:
    """Write deterministic stand-in DDW arrays under `data_path`.

    Shapes default to the real cohort's ((97, 2097, 28) temporal, (2097, 11)
    statics — reference real_data/data_utils.py output regime). The dynamics
    are a stable nonlinear latent system driven by dose impulses and statics,
    observed through a random linear head — learnable structure so the
    8-method real track (run_real.py) trains and orders sensibly, while
    containing no DDW-derived content.
    """
    rng = np.random.RandomState(seed)
    os.makedirs(data_path, exist_ok=True)

    # Dose schedule: 1-3 doses/patient, uniform hour in the first 70% of stay,
    # amounts uniform (0, 1] (the real pipeline normalizes doses).
    actions = np.zeros((t_max, n_sample, 1), np.float64)
    n_doses = rng.randint(1, 4, size=n_sample)
    for i in range(n_sample):
        hours = rng.choice(max(int(t_max * 0.7), 1), size=n_doses[i], replace=False)
        actions[hours, i, 0] += rng.rand(n_doses[i])

    # Statics: ~half binary, half continuous (z-scored below).
    n_bin = static_dim // 2
    statics = np.concatenate(
        [rng.binomial(1, 0.4, (n_sample, n_bin)).astype(np.float64),
         rng.randn(n_sample, static_dim - n_bin)], axis=1,
    )

    # Latent dynamics: h' = tanh(W h + u b + s c) - decay * h, Euler dt=1.
    W = rng.randn(latent_dim, latent_dim) * (0.4 / np.sqrt(latent_dim))
    b_dose = rng.randn(latent_dim) * 0.8
    C = rng.randn(static_dim, latent_dim) * 0.15
    h = rng.randn(n_sample, latent_dim) * 0.5
    drive = statics @ C
    traj = np.empty((t_max, n_sample, latent_dim), np.float64)
    for t in range(t_max):
        traj[t] = h
        pre = h @ W.T + actions[t] * b_dose[None, :] + drive
        h = h + 0.5 * (np.tanh(pre) - 0.3 * h)

    # Observation head + noise, z-normalized per feature over (T, B)
    # (the real ETL z-scores observed values the same way).
    H = rng.randn(latent_dim, obs_dim) / np.sqrt(latent_dim)
    x = traj @ H + rng.randn(t_max, n_sample, obs_dim) * 0.15
    x = (x - x.mean(axis=(0, 1))) / np.maximum(x.std(axis=(0, 1)), 1e-8)

    masks = (rng.rand(t_max, n_sample, obs_dim) < mask_rate).astype(np.float32)

    out = {
        f"array_xt{data_type}.pkl": x.astype(np.float32),
        f"array_xt_mask{data_type}.pkl": masks,
        f"array_at{data_type}.pkl": actions.astype(np.float32),
        "array_x_constant.pkl": ((statics - statics.mean(0)) / np.maximum(statics.std(0), 1e-8)).astype(np.float32),
    }
    for name, arr in out.items():
        with open(os.path.join(data_path, name), "wb") as f:
            pickle.dump(arr, f)
