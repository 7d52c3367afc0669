"""Host-resident PRNG keys: JAX threefry keys kept on the CPU backend.

On this environment the TPU is reached through a tunnel whose FIRST
device-to-host transfer permanently degrades dispatch throughput ~10x
(measured: experiments/tunnel_pathology.py, PERFORMANCE.md round 3). The
training loop needs one host integer per restart to seed the numpy
mini-batch RNG (mirroring reference training_utils.py's np/torch seeding) —
deriving it from a TPU-resident key would be exactly such a transfer.

These helpers keep key construction and splitting on the CPU backend and
return plain numpy uint32 arrays. Threefry is backend-deterministic, so the
key *values* (and everything derived from them) are identical to
TPU-resident keys; passing a numpy key into a TPU-jitted function is an
ordinary host-to-device transfer, which is safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_CPU = None


def _cpu():
    global _CPU
    if _CPU is None:
        _CPU = jax.devices("cpu")[0]
    return _CPU


def host_key(seed: int) -> np.ndarray:
    """PRNGKey(seed) computed on the CPU backend, returned as numpy."""
    with jax.default_device(_cpu()):
        return np.asarray(jax.random.PRNGKey(seed))


def host_split(key, num: int = 2) -> np.ndarray:
    """jax.random.split on the CPU backend; rows index the subkeys."""
    with jax.default_device(_cpu()):
        return np.asarray(jax.random.split(jnp.asarray(np.asarray(key)), num))


def host_randint(key, minval: int, maxval: int) -> int:
    """jax.random.randint as a python int, without touching the accelerator."""
    with jax.default_device(_cpu()):
        return int(jax.random.randint(jnp.asarray(np.asarray(key)), (), minval, maxval))
