"""Synthetic PK/PD cohort generator — vectorized, JAX-native.

Re-design of `DataGeneratorRoche` (dataloader.py:10-341). The reference
integrates each patient separately with SciPy LSODA in a Python loop
(dataloader.py:247-252, the generation hot loop); here the whole cohort is a
single batched dopri5 solve at tight tolerances on device — the ground-truth
dynamics (expert ODE + tanh-linear "ml" latents, dataloader.py:105-149) are
exactly the hybrid `roche_field` with the random sparse `ml_coef` installed
as the ml-net weights.

RNG: a host `numpy.random.RandomState` drives all randomness in the same
draw order and distributions as the reference (seed-666 regime). Parity is
statistical (same data law), not bitwise (different generators).
"""

from __future__ import annotations

import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE, RocheConfig
from ..fields import DoseContext, roche_field
from ..solvers import odeint

EXPERT_DIM = 4


class SyntheticCohort:
    """Holds the generated (T, B, D) tensors and fold splits.

    API mirrors the reference generator: generate_data, split_sample,
    get_mini_batch, get_split, set_train_size, set_val_size.
    """

    def __init__(
        self,
        n_sample: int,
        obs_dim: int,
        t_max: float,
        step_size: float,
        roche_config: RocheConfig,
        output_sigma: float,
        dose_max: float = 0.0,
        latent_dim: int = 4,
        sparsity: float = 0.5,
        output_sparsity: float = 0.0,
        val_size: int = 100,
        test_size: int = 200,
        p_remove: float = 0.0,
        rng: Optional[np.random.RandomState] = None,
        dtype=DTYPE,
    ):
        self.rng = rng if rng is not None else np.random.RandomState()
        self.dtype = dtype

        self.n_sample = n_sample
        self.obs_dim = obs_dim
        self.latent_dim = int(latent_dim)
        self.expert_dim = EXPERT_DIM
        self.ml_dim = self.latent_dim - self.expert_dim
        self.sparsity = sparsity
        self.action_dim = 1
        self.t_max = t_max
        self.step_size = step_size
        self.time_dim = int(t_max / step_size + 1)
        self.roche_config = roche_config
        self.dose_max = dose_max
        self.p_remove = p_remove
        self.output_sparsity = output_sparsity
        self.output_sigma = output_sigma

        # Random sparse observation head and ml mixing (dataloader.py:51-59).
        self.output_coef = self.rng.randn(obs_dim, self.latent_dim + self.action_dim) * self.rng.binomial(
            1, 1 - self.output_sparsity, (obs_dim, self.latent_dim + self.action_dim)
        )
        self.ml_coef = (
            self.rng.randn(self.latent_dim, self.ml_dim)
            * self.rng.binomial(1, 1 - self.sparsity, (self.latent_dim, self.ml_dim))
            / self.latent_dim
        )

        self.val_size = int(val_size)
        self.test_size = int(test_size)
        self.train_size = int(n_sample - val_size - test_size)

        self.measurements = None
        self.actions = None
        self.latents = None
        self.masks = None
        self.data_train, self.data_val, self.data_test = None, None, None

    # --- generation ---------------------------------------------------------

    def _ground_truth_params(self, dtype=None):
        dtype = dtype or self.dtype
        expert = {k: jnp.asarray(v, dtype) for k, v in self.roche_config.as_dict().items()}
        params = {"expert": expert}
        if self.ml_dim > 0:
            params["ml_net"] = [{"w": jnp.asarray(self.ml_coef, dtype), "b": jnp.zeros((self.ml_dim,), dtype)}]
        return params

    def get_initial_conditions(self):
        """Exp(scale=0.01) initial latents (dataloader.py:200-205)."""
        return self.rng.exponential(scale=0.01, size=(self.n_sample, self.latent_dim))

    def get_action(self):
        """One dose per patient: uniform time in [0, t_max), uniform amount
        in [0, dose_max] (dataloader.py:207-222)."""
        dose_time = np.sort(
            np.stack([self.rng.choice(int(self.t_max), size=1, replace=False) for _ in range(self.n_sample)], axis=0)
        )
        dose_amount = self.rng.rand(self.n_sample) * self.dose_max
        return dose_time, dose_amount

    def generate_data(self, rtol: float = 1e-8, atol: float = 1e-10, max_steps: int = 4096,
                      backend: str = "jax"):
        init = self.get_initial_conditions()
        dose_time, dose_amount = self.get_action()
        self.dose_time = dose_time
        self.dose_amount = dose_amount

        ts = np.arange(0.0, self.t_max + self.step_size, self.step_size, dtype=np.float64)

        # One batched solve for the entire cohort (vs. the reference's
        # per-patient LSODA loop, dataloader.py:247-252). Ground truth is
        # computed in float64 — the same numerical regime as the reference's
        # f64 LSODA; the tight 1e-8/1e-10 tolerances are unreachable in f32.
        # backend="jax": batched dopri5 on the host CPU backend.
        # backend="native": the C++ integrator (hybridode/native).
        if backend == "native":
            from .. import native
            from ..config import ROCHE_PARAM_NAMES

            params13 = np.array([getattr(self.roche_config, n) for n in ROCHE_PARAM_NAMES], np.float64)
            latents = native.roche_dopri5_batch(
                init, dose_time.astype(np.float64), dose_amount, params13,
                self.ml_coef if self.ml_dim > 0 else None, ts,
                rtol=rtol, atol=atol, max_steps=100000,
            )
        else:
            cpu = jax.devices("cpu")[0]
            with jax.enable_x64(), jax.default_device(cpu):
                params = self._ground_truth_params(dtype=jnp.float64)
                ctx = DoseContext(
                    times=jnp.asarray(dose_time, jnp.float64),
                    amounts=jnp.asarray(dose_amount, jnp.float64),
                )
                solve = jax.jit(
                    lambda y0: odeint(
                        roche_field, y0, jnp.asarray(ts), (params, ctx), rtol=rtol, atol=atol, max_steps=max_steps
                    )
                )
                latents = np.asarray(solve(jnp.asarray(init, jnp.float64)))  # (T, B, D)
        assert np.all(np.isfinite(latents)), "ground-truth solve failed"

        # Linear observation head + Gaussian noise (dataloader.py:169-172).
        # The trailing output_coef column multiplies a constant 1 (a bias
        # term — reference quirk: it is sized by action_dim but fed ones).
        W = self.output_coef[:, : self.latent_dim]
        b = self.output_coef[:, self.latent_dim :].sum(axis=-1)
        output = latents @ W.T + b  # (T, B, obs)
        noise = self.rng.randn(*output.shape) * self.output_sigma
        measurements = output + noise

        # Discrete action array: amount at the dose grid index
        # (dataloader.py:176-180 dose_at_time_discrete).
        is_dose = (ts[None, :, None] == dose_time[:, None, :]).any(-1)  # (B, T)
        actions = (is_dose * dose_amount[:, None]).T[..., None]  # (T, B, 1)

        self.latents = np.asarray(latents, np.float32)
        self.actions = np.asarray(actions, np.float32)

        # z-normalize measurements over (T, B) per dim (dataloader.py:261).
        m = measurements
        m = (m - m.mean(axis=(0, 1))) / m.std(axis=(0, 1))
        self.measurements = np.asarray(m, np.float32)

        # Bernoulli missingness (dataloader.py:264-266).
        selected = (self.rng.rand(*self.measurements.shape) > self.p_remove) * 1.0
        self.masks = np.asarray(np.ones_like(self.measurements) * selected, np.float32)

        assert self.measurements.shape == (self.time_dim, self.n_sample, self.obs_dim)
        assert self.actions.shape == (self.time_dim, self.n_sample, self.action_dim)
        assert self.latents.shape == (self.time_dim, self.n_sample, self.latent_dim)

    # --- splits / batching ----------------------------------------------------

    _KEYS = ("measurements", "actions", "latents", "masks")

    def _tensors(self):
        return {
            "measurements": self.measurements,
            "actions": self.actions,
            "latents": self.latents,
            "masks": self.masks,
        }

    def split_sample(self):
        t = self._tensors()
        tr, va = self.train_size, self.val_size
        self.data_train = {k: jnp.asarray(v[:, :tr]) for k, v in t.items()}
        self.data_val = {k: jnp.asarray(v[:, tr : tr + va]) for k, v in t.items()}
        self.data_test = {k: jnp.asarray(v[:, tr + va :]) for k, v in t.items()}

    def set_train_size(self, n_sample: int):
        train_sample_size = n_sample - self.val_size - self.test_size
        if train_sample_size <= 0:
            raise ValueError(
                f"sample={n_sample} leaves no training data "
                f"(val={self.val_size} + test={self.test_size})"
            )
        self.train_size = train_sample_size
        self.n_sample = n_sample
        self.data_train = {k: v[:, :train_sample_size] for k, v in self.data_train.items()}

    def set_val_size(self, n_val: int):
        self.val_size = n_val
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

    # --- persistence ------------------------------------------------------------

    def save(self, path: str):
        state = {k: v for k, v in self.__dict__.items() if k not in ("data_train", "data_val", "data_test", "rng")}
        state = jax.tree_util.tree_map(lambda x: np.asarray(x) if isinstance(x, jnp.ndarray) else x, state)
        with open(path, "wb") as f:
            pickle.dump({"class": "SyntheticCohort", "state": state}, f)

    @classmethod
    def load(cls, path: str):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        obj = cls.__new__(cls)
        obj.__dict__.update(payload["state"])
        obj.rng = np.random.RandomState()
        obj.data_train = obj.data_val = obj.data_test = None
        obj.split_sample()
        return obj


def make_train_cohort(seed: int = 666, n_sample: int = 1300, **overrides) -> SyntheticCohort:
    """The seed-666 training cohort (generated_data/generate_data_train.py)."""
    kwargs = dict(
        n_sample=n_sample,
        obs_dim=20,
        t_max=14,
        step_size=1,
        roche_config=RocheConfig(kel=1),
        output_sigma=0.2,
        dose_max=10,
        latent_dim=6,
        sparsity=0.5,
        output_sparsity=0.5,
        p_remove=0.5,
        val_size=100,
        test_size=200,
    )
    kwargs.update(overrides)
    dg = SyntheticCohort(rng=np.random.RandomState(seed), **kwargs)
    dg.generate_data()
    dg.split_sample()
    return dg


def make_test_cohort(seed: int = 666, **overrides) -> SyntheticCohort:
    """The seed-666 test cohort, n=2100 (generate_data_test.py)."""
    overrides.setdefault("n_sample", 2100)
    overrides.setdefault("val_size", 100)
    overrides.setdefault("test_size", 1000)
    return make_train_cohort(seed=seed, **overrides)


def make_dim_cohort(dim: int, seed: int = 666, **overrides) -> SyntheticCohort:
    """dim8 / dim12 cohorts (generate_data_dim8.py / generate_data_dim12.py)."""
    presets = {
        8: dict(obs_dim=40, latent_dim=8, output_sparsity=1 - 0.375),
        12: dict(obs_dim=80, latent_dim=12, output_sparsity=1 - 0.25),
    }
    kwargs = dict(presets[dim])
    kwargs.update(overrides)
    kwargs.setdefault("n_sample", 2100)
    kwargs.setdefault("val_size", 100)
    kwargs.setdefault("test_size", 1000)
    return make_train_cohort(seed=seed, **kwargs)


def add_noise(cohort: SyntheticCohort, noise_level: float, seed: int = 666) -> SyntheticCohort:
    """Noise variant of a test cohort: measurements += N(0, noise-0.2)
    (generate_data_noise.py:14-23)."""
    rng = np.random.RandomState(seed)
    noise = rng.randn(*cohort.measurements.shape).astype(np.float32) * (noise_level - 0.2)
    cohort.measurements = cohort.measurements + noise
    cohort.split_sample()
    return cohort
