"""hybridode: TPU-native latent hybrid ODE framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
"Integrating Expert ODEs into Neural ODEs" (NeurIPS 2021) codebase: latent
hybrid models coupling an expert PK/PD ODE with neural latent dynamics,
trained variationally over irregularly-sampled clinical time series.
"""

from . import config

__version__ = "0.1.0"
__all__ = ["config", "__version__"]
