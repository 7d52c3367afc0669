"""Encoders, decoders, flows, priors — functional modules (init/apply pairs)."""

from . import nn

__all__ = ["nn"]
