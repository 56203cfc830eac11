"""Training losses (reference GenericNNetWrapper.py:89-93,171-183).

Four terms: masked policy cross-entropy, per-player value MSE, and the
score-difference head trained both as a PDF cross-entropy and a CDF L2
(weights 0.02 each, value loss weighted by ``vl_weight``)."""

from __future__ import annotations

import jax.numpy as jnp


def loss_pi(target_pi, log_pi):
    return -jnp.sum(target_pi * log_pi) / target_pi.shape[0]


def loss_v(target_v, v):
    return jnp.sum((target_v - v) ** 2) / (target_v.shape[0] * target_v.shape[-1])


def scdiff_targets(scdiff, num_scdiffs, max_diff):
    """scdiff: (B, P) int score differences -> one-hot (B, num_scdiffs, 2D+1).
    Only the first ``num_scdiffs`` player slots are populated, mirroring the
    reference's (B, 31, P) target tensor."""
    bins = jnp.clip(scdiff + max_diff, 0, 2 * max_diff)
    onehot = jnp.eye(2 * max_diff + 1)[bins]                 # (B, P, 31)
    return onehot[:, :num_scdiffs, :]


def loss_scdiff_pdf(target, log_sdiff):
    b, nsd = target.shape[0], target.shape[1]
    return 0.02 * (-jnp.sum(target * log_sdiff)) / (b * nsd)


def loss_scdiff_cdf(target, log_sdiff):
    b, nsd = target.shape[0], target.shape[1]
    diff = jnp.cumsum(target, axis=-1) - jnp.cumsum(jnp.exp(log_sdiff), axis=-1)
    return 0.02 * jnp.sum(diff ** 2) / (b * nsd)


def total_loss(outputs, targets, vl_weight):
    """outputs: (log_pi, v, log_sdiff); targets: dict with pi, v, scdiff_onehot.
    Returns (loss, metrics dict)."""
    log_pi, v, log_sd = outputs
    l_pi = loss_pi(targets["pi"], log_pi)
    l_v = loss_v(targets["v"], v)
    l_cdf = loss_scdiff_cdf(targets["scdiff"], log_sd)
    l_pdf = loss_scdiff_pdf(targets["scdiff"], log_sd)
    total = l_pi + vl_weight * l_v + l_cdf + l_pdf
    # value-head OUTPUT statistics ride along so collapse/saturation is
    # visible in metrics.jsonl: a head stuck at the target mean shows
    # v_out_std ~ 0, a saturated tanh shows v_out_absmean ~ 1 (the 4P
    # failure mode — constant prediction gives exactly l_v = 0.75 for
    # +1/-1 winner vectors, N=4)
    return total, {"loss": total, "pi": l_pi, "v": l_v,
                   "scdiff": l_cdf + l_pdf,
                   "v_out_mean": v.mean(), "v_out_std": v.std(),
                   "v_out_absmean": jnp.abs(v).mean()}
