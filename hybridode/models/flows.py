"""Normalizing flows with amortized parameters.

Reference: flow.py (Planar at flow.py:8-59; Sylvester flow.py:62-138;
TriangularSylvester flow.py:141-219). Batched linear algebra maps onto the
MXU via einsum; no per-sample Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tanh_deriv(x):
    return 1.0 - jnp.tanh(x) ** 2


def planar_flow(zk, u, w, b):
    """z' = z + u_hat * tanh(w^T z + b); returns (z', log|det J|).

    Shapes: zk (B, D); u (B, D, 1); w (B, 1, D); b (B, 1, 1).
    The invertibility reparameterization of u follows flow.py:43-47.
    """
    zk3 = zk[..., None]  # (B, D, 1)

    uw = jnp.einsum("bod,bdo->bo", w, u)[..., None]  # (B, 1, 1)
    m_uw = -1.0 + jax.nn.softplus(uw)
    w_norm_sq = jnp.sum(w**2, axis=2, keepdims=True)  # (B, 1, 1)
    u_hat = u + (m_uw - uw) * jnp.swapaxes(w, 1, 2) / w_norm_sq

    wzb = jnp.einsum("bod,bdo->bo", w, zk3)[..., None] + b  # (B, 1, 1)
    z = zk3 + u_hat * jnp.tanh(wzb)
    z = z[..., 0]

    psi = w * _tanh_deriv(wzb)  # (B, 1, D)
    log_det = jnp.log(jnp.abs(1.0 + jnp.einsum("bod,bdo->bo", psi, u_hat)))
    return z, log_det[..., 0]


def sylvester_flow(zk, r1, r2, q_ortho, b, sum_ldj: bool = True):
    """z' = z + Q R1 tanh(R2 Q^T z + b); reference flow.py:86-138.

    Shapes: zk (B, D); r1, r2 (B, M, M); q_ortho (B, D, M); b (B, 1, M).
    """
    zk1 = zk[:, None, :]  # (B, 1, D)
    diag_r1 = jnp.diagonal(r1, axis1=-2, axis2=-1)
    diag_r2 = jnp.diagonal(r2, axis1=-2, axis2=-1)

    qr2 = jnp.einsum("bdm,bnm->bdn", q_ortho, r2)  # (B, D, M)
    qr1 = jnp.einsum("bdm,bmn->bdn", q_ortho, r1)  # (B, D, M)

    r2qzb = jnp.einsum("bod,bdm->bom", zk1, qr2) + b  # (B, 1, M)
    z = jnp.einsum("bom,bdm->bod", jnp.tanh(r2qzb), qr1) + zk1
    z = z[:, 0, :]

    diag_j = _tanh_deriv(r2qzb)[:, 0, :] * diag_r1 * diag_r2 + 1.0
    log_diag_j = jnp.log(jnp.abs(diag_j))
    return z, (jnp.sum(log_diag_j, axis=-1) if sum_ldj else log_diag_j)


def triangular_sylvester_flow(zk, r1, r2, b, permute_z=None, sum_ldj: bool = True):
    """Sylvester flow with Q a permutation (or identity); flow.py:160-215."""
    zk1 = zk[:, None, :]
    diag_r1 = jnp.diagonal(r1, axis1=-2, axis2=-1)
    diag_r2 = jnp.diagonal(r2, axis1=-2, axis2=-1)

    z_per = zk1[:, :, permute_z] if permute_z is not None else zk1

    r2qzb = jnp.einsum("bod,bnd->bon", z_per, r2) + b
    z = jnp.einsum("bon,bdn->bod", jnp.tanh(r2qzb), r1)
    if permute_z is not None:
        z = z[:, :, permute_z]
    z = (z + zk1)[:, 0, :]

    diag_j = _tanh_deriv(r2qzb)[:, 0, :] * diag_r1 * diag_r2 + 1.0
    log_diag_j = jnp.log(jnp.abs(diag_j))
    return z, (jnp.sum(log_diag_j, axis=-1) if sum_ldj else log_diag_j)
