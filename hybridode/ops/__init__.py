"""Custom ops (Pallas TPU kernels with interpret-mode fallbacks)."""
