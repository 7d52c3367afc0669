"""hybridode: TPU-native latent hybrid ODE framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
"Integrating Expert ODEs into Neural ODEs" (NeurIPS 2021) codebase: latent
hybrid models coupling an expert PK/PD ODE with neural latent dynamics,
trained variationally over irregularly-sampled clinical time series.
"""

import jax as _jax

# TPU matmuls default to bfloat16 multiply precision on the MXU (~4e-4
# relative noise). This framework's matmuls are tiny latent-dim contractions
# inside ODE vector fields — bf16 noise there poisons the adaptive solver's
# embedded error estimate (measured: the error estimator reads ~2000 ulp of
# noise and the controller collapses the step size chasing it). Full-f32
# ("highest") precision costs nothing at these sizes and restores h^5 error
# scaling.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import config  # noqa: E402

__version__ = "0.1.0"
__all__ = ["config", "__version__"]
