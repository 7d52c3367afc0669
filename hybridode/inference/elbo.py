"""Variational inference losses (the reference's L3 loss layer).

Re-design of `VariationalInference` (model.py:1124-1214),
`VariationalInferenceReal` (model.py:1217-1261) and
`VariationalInferenceFlow` (model.py:1299-1380) as pure loss functions of
(params, batch, key) with all model structure static in a `VIModel` spec.
The Monte-Carlo KL (mc_size samples, model.py:1198-1214) is a single vmap —
not a Python loop — so it fuses into one batched program on the MXU.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoders, encoders, priors

EPSILON = float(np.finfo(np.float32).eps)

PRIORS: dict[str, Callable] = {
    "normal": priors.standard_normal_log_density,
    "exponential": priors.exponential_log_density,
}


class VIModel(NamedTuple):
    """Static description of an encoder/decoder pair + loss settings."""

    kind: str  # "sim" | "real" | "flow"
    encoder_spec: NamedTuple
    decoder_spec: NamedTuple
    elbo: bool = True
    prior: Optional[str] = None  # None -> analytic Gaussian KL
    mc_size: int = 100
    t0: int = 24  # real-data only
    weight: bool = False  # real-data only

    @property
    def model_name(self) -> str:
        # Reference checkpoint naming (model.py:1133, 1306).
        tag = "VI_FLOW" if self.kind == "flow" else "VI"
        return f"{tag}_{self.encoder_spec.model_name}_{self.decoder_spec.model_name}.pkl"


def init_vi(key, model: VIModel):
    ke, kd = jax.random.split(key)
    if model.kind == "flow":
        enc = encoders.init_encoder_planar_lstm(ke, model.encoder_spec)
    elif model.kind == "real":
        enc = encoders.init_encoder_lstm_real(ke, model.encoder_spec)
    else:
        enc = encoders.init_encoder_lstm(ke, model.encoder_spec)

    if isinstance(model.decoder_spec, decoders.RealDecoderSpec):
        dec = decoders.init_real_decoder(kd, model.decoder_spec)
    elif isinstance(model.decoder_spec, decoders.RealBenchmarkSpec):
        dec = decoders.init_real_benchmark(kd, model.decoder_spec)
    else:
        dec = decoders.init_sim_decoder(kd, model.decoder_spec)
    return {"encoder": enc, "decoder": dec}


# --- shared pieces ----------------------------------------------------------------


def _analytic_gaussian_kl(mu, log_var):
    """KL(q || N(0, I)) averaged over the batch (model.py:1188)."""
    return jnp.mean(-0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=-1))


def mc_kl(key, mu, log_var, prior_log_pdf, mc_size: int):
    """Monte-Carlo KL with the z<=0 -> eps clamp (model.py:1198-1214)."""

    def one_sample(k):
        z = priors.gaussian_reparameterize(k, mu, log_var)
        z = jnp.where(z <= 0.0, EPSILON, z)
        return priors.gaussian_log_density(mu, log_var, z) - prior_log_pdf(z)

    samples = jax.vmap(one_sample)(jax.random.split(key, mc_size))  # (mc, B)
    return jnp.mean(samples, axis=0)  # (B,)


def decode(params, model: VIModel, z, batch):
    spec = model.decoder_spec
    if isinstance(spec, decoders.RealDecoderSpec):
        return decoders.real_decoder_apply(params["decoder"], spec, z, batch["actions"], batch["statics"])
    if isinstance(spec, decoders.RealBenchmarkSpec):
        return decoders.real_benchmark_apply(params["decoder"], spec, z, batch["actions"], batch["statics"])
    return decoders.sim_decoder_apply(params["decoder"], spec, z, batch["actions"])


def encode(params, model: VIModel, x, a, mask):
    if model.kind == "flow":
        return encoders.encoder_planar_lstm_apply(params["encoder"], model.encoder_spec, x, a, mask)
    if model.kind == "real":
        return encoders.encoder_lstm_real_apply(params["encoder"], model.encoder_spec, x, a, mask)
    return encoders.encoder_lstm_apply(params["encoder"], model.encoder_spec, x, a, mask)


# --- losses -----------------------------------------------------------------------


def sim_loss(params, model: VIModel, batch, key):
    """ELBO for the simulation track (model.py:1150-1193)."""
    x, a, mask = batch["measurements"], batch["actions"], batch["masks"]
    k_rep, k_kl = jax.random.split(key)

    mu, log_var = encode(params, model, x, a, mask)
    z = priors.gaussian_reparameterize(k_rep, mu, log_var) if model.elbo else mu
    x_hat, _ = decode(params, model, z, batch)

    lik = jnp.sum((x - x_hat) ** 2 * mask) / x.shape[1]
    if not model.elbo:
        return lik

    if model.prior is None:
        kld = _analytic_gaussian_kl(mu, log_var)
    else:
        kld = jnp.mean(mc_kl(k_kl, mu, log_var, PRIORS[model.prior], model.mc_size))
    return lik + kld


def real_loss(params, model: VIModel, batch, key):
    """t0-conditioned masked-MSE / ELBO for the real track (model.py:1223-1261)."""
    x, a, mask, s = batch["measurements"], batch["actions"], batch["masks"], batch["statics"]
    t0 = model.t0
    k_rep, k_kl = jax.random.split(key)

    a_in = jnp.concatenate([a, s], axis=-1)
    mu, log_var = encode(params, model, x[:t0], a_in[:t0], mask[:t0])
    z = priors.gaussian_reparameterize(k_rep, mu, log_var) if model.elbo else mu
    x_hat, _ = decode(params, model, z, batch)

    if model.weight:
        t_len = model.decoder_spec.t_max - t0
        weight = (1.0 / jnp.arange(1, t_len + 1, dtype=x.dtype))[:, None, None]
    else:
        weight = 1.0
    lik = jnp.sum((x[t0:] - x_hat) ** 2 * mask[t0:] * weight) / x[t0:].shape[1]

    if not model.elbo:
        return lik

    if log_var.ndim == 2:
        if model.prior is None:
            kld = _analytic_gaussian_kl(mu, log_var)
        else:
            kld = jnp.mean(mc_kl(k_kl, mu, log_var, PRIORS[model.prior], model.mc_size))
    else:
        kld = jnp.mean(-0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=-1))
    return lik + kld


def flow_mc_kl(key, encoder_out, model: VIModel, prior_log_pdf):
    """MC KL through the flow posterior (model.py:1366-1380)."""
    num_flows = model.encoder_spec.num_flows

    def one_sample(k):
        mu, log_var, z, log_det_j, z0 = encoders.planar_reparameterize(k, encoder_out, num_flows)
        log_q = encoders.planar_log_density(mu, log_var, z, log_det_j, z0)
        return log_q - prior_log_pdf(z)

    samples = jax.vmap(one_sample)(jax.random.split(key, model.mc_size))
    return jnp.mean(samples, axis=0)


def flow_loss(params, model: VIModel, batch, key):
    """Flow-posterior ELBO (model.py:1323-1361).

    Deviation from the reference, documented: the reference's mc_size==1
    shortcut computes `mean(log_p - log_q)` (model.py:1350-1353) — a sign
    flip relative to its own mc_kl. That branch is dead in every experiment
    (run_simulation_flow.py uses mc_size=50); we use the correct sign.
    """
    x, a, mask = batch["measurements"], batch["actions"], batch["masks"]
    k_rep, k_kl = jax.random.split(key)

    encoder_out = encode(params, model, x, a, mask)
    num_flows = model.encoder_spec.num_flows
    mu, log_var, z, log_det_j, z0 = encoders.planar_reparameterize(k_rep, encoder_out, num_flows)
    x_hat, _ = decode(params, model, z, batch)

    lik = jnp.sum((x - x_hat) ** 2 * mask) / x.shape[1]
    if not model.elbo:
        return lik

    prior_log_pdf = PRIORS[model.prior]
    if model.mc_size == 1:
        log_q = encoders.planar_log_density(mu, log_var, z, log_det_j, z0)
        kld = jnp.mean(log_q - prior_log_pdf(z))
    else:
        kld = jnp.mean(flow_mc_kl(k_kl, encoder_out, model, prior_log_pdf))
    return lik + kld


def forecast_loss_terms(params, model: VIModel, batch, t0: int):
    """(masked squared-error sum, mask count) behind forecast_loss.

    Exposed separately so the data-parallel fused loop can psum the two
    terms across shards and divide once — pmean of per-shard ratios is NOT
    the global masked MSE when shards carry different mask counts.
    """
    x, a, mask = batch["measurements"], batch["actions"], batch["masks"]
    if model.kind == "real":
        a_in = jnp.concatenate([a, batch["statics"]], axis=-1)
        enc_out = encode(params, model, x[:t0], a_in[:t0], mask[:t0])
    else:
        enc_out = encode(params, model, x[:t0], a[:t0], mask[:t0])
    if model.kind == "flow":
        # point estimate through the flow with a fixed key (deterministic-ish)
        import jax as _jax

        _, _, z, _, _ = encoders.planar_reparameterize(_jax.random.PRNGKey(0), enc_out, model.encoder_spec.num_flows)
    else:
        z = enc_out[0]
    x_hat, _ = decode(params, model, z, batch)
    # sim decoders emit the full grid; real decoders already emit x[t0:].
    pred = x_hat[: x.shape[0] - t0] if model.kind == "real" else x_hat[t0:]
    num = jnp.sum((x[t0:] - pred) ** 2 * mask[t0:])
    den = jnp.sum(mask[t0:])
    return num, den


def forecast_loss(params, model: VIModel, batch, t0: int):
    """Deterministic forecast error: encode x[:t0] (posterior mean), decode,
    masked MSE on x[t0:] — the test protocol applied as a validation
    criterion.

    Documented deviation from the reference: its validation loss is the
    training ELBO with FULL-sequence encoding (training_utils.py:60-67),
    which keeps improving while forecast skill degrades — the reference is
    implicitly protected only by its slow optimizer. Selecting on the actual
    figure of merit is the robust replacement at our training speed.
    """
    num, den = forecast_loss_terms(params, model, batch, t0)
    return num / jnp.maximum(den, 1.0)


def loss_fn(params, model: VIModel, batch, key):
    if model.kind == "sim":
        return sim_loss(params, model, batch, key)
    if model.kind == "real":
        return real_loss(params, model, batch, key)
    if model.kind == "flow":
        return flow_loss(params, model, batch, key)
    raise ValueError(model.kind)
