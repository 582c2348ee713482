"""Transmit diversity: SFBC (Alamouti) precoding and combining, TM2.

Reference parity: openair1/PHY/LTE_TRANSPORT/dlsch_modulation.c
(layer1prec2A :108 — 36.211 §6.3.4.3 two-port SFBC over frequency-adjacent
RE pairs) and dlsch_demodulation.c:3067 (dlsch_alamouti combine after MF
compensation).

36.211 precoder for ports (0,1), symbol pair (x0, x1) on adjacent REs
(k, k+1):
    port0: [ x0,  x1 ] / sqrt(2)... (power split across ports)
    port1: [-x1*, x0*] / sqrt(2)
Receiver (per RX antenna r, channels h0r/h1r assumed equal on the pair):
    x0_hat = h0r* y_k     + h1r y_{k+1}*
    x1_hat = h0r* y_{k+1} - h1r y_k*
=> x_hat = (|h0r|^2 + |h1r|^2)/sqrt(2) * x + noise; MRC adds over r.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_INV_SQRT2 = 0.7071067811865476


def sfbc_encode(x):
    """x [B, N] (N even) -> (port0 [B, N], port1 [B, N]).

    Pairs are (x[2i], x[2i+1]) on frequency-adjacent data REs, matching the
    reference's RE-pair walk in allocate_REs_in_RB."""
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    p0 = jnp.stack([x0, x1], axis=-1).reshape(x.shape)
    p1 = jnp.stack([-jnp.conj(x1), jnp.conj(x0)], axis=-1).reshape(x.shape)
    return p0 * _INV_SQRT2, p1 * _INV_SQRT2


def sfbc_combine(y, h0, h1, n0):
    """Alamouti combine + MRC over RX antennas.

    y, h0, h1: [B, R, N] (R = RX antennas; h_p = channel of TX port p).
    Returns (x_hat [B, N] unit-gain equalized symbols,
             n0_eff [B, N] post-combining noise variance for the demapper).
    """
    yk = y[..., 0::2]
    yk1 = y[..., 1::2]
    h0k = h0[..., 0::2]
    h1k = h1[..., 0::2]          # pair assumed flat: use the even-RE channel
    x0 = jnp.conj(h0k) * yk + h1k * jnp.conj(yk1)
    x1 = jnp.conj(h0k) * yk1 - h1k * jnp.conj(yk)
    g = jnp.abs(h0k) ** 2 + jnp.abs(h1k) ** 2          # [B, R, N/2]
    # MRC over RX antennas
    x0 = jnp.sum(x0, axis=1)
    x1 = jnp.sum(x1, axis=1)
    g_sum = jnp.sum(g, axis=1) + 1e-12                 # [B, N/2]
    # normalize to unit gain: x_hat = x / (g/sqrt(2)); noise var = n0/(g/2)
    scale = 1.0 / (g_sum * _INV_SQRT2)
    x_hat = jnp.stack([x0 * scale, x1 * scale], axis=-1)
    x_hat = x_hat.reshape(x_hat.shape[0], -1)
    n0_eff = 2.0 * n0 / g_sum
    n0_eff = jnp.repeat(n0_eff, 2, axis=-1)
    return x_hat, n0_eff
