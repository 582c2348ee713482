"""PHY abstraction: effective-SINR link-to-system mapping (EESM / MIESM).

Reference parity: openair1/PHY/LTE_TRANSPORT/dlsch_decoding.c:524
(dlsch_abstraction_EESM) and :573 (MIESM), SIMULATION/TOOLS/abstraction.c
(compute_sinr :190, per-MCS BLER table lookup + coin flip) — the oaisim
abstraction mode that replaces bit-level decoding in system simulation.

EESM:  sinr_eff = -beta * ln( mean_i exp(-sinr_i / beta) )
MIESM: sinr_eff = MI^-1( mean_i MI(sinr_i) ) with the per-Qm mutual
information curve (precomputed numerically on a grid).

BLER tables come from this framework's own dlsim AWGN sweeps
(`calibrate_bler_table`) — the same way the reference's AWGN_results corpus
was produced. Lookup is log-linear in SNR(dB).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def eesm(sinrs, beta: float):
    """sinrs [.., N] linear -> effective SINR [..] (linear)."""
    s = jnp.mean(jnp.exp(-sinrs / beta), axis=-1)
    return -beta * jnp.log(jnp.maximum(s, 1e-30))


@functools.lru_cache(maxsize=None)
def _mi_grid(Qm: int):
    """Numeric per-symbol mutual information MI(snr) for a Qm-QAM
    constellation, Monte-Carlo on a fixed grid (host precompute)."""
    from ..tables.modulation import mod_table
    pts = mod_table(Qm).astype(np.complex128)
    snr_db = np.linspace(-20.0, 30.0, 101)
    rng = np.random.default_rng(0)
    n_mc = 512
    noise = (rng.normal(size=n_mc) + 1j * rng.normal(size=n_mc)) / np.sqrt(2)
    mi = np.zeros_like(snr_db)
    M = len(pts)
    for i, sdb in enumerate(snr_db):
        snr = 10 ** (sdb / 10)
        sigma = np.sqrt(1.0 / snr)
        acc = 0.0
        for x in pts[: M]:
            y = x + sigma * noise
            d = np.abs(y[:, None] - pts[None, :]) ** 2
            num = np.exp(-(np.abs(y - x) ** 2) / sigma ** 2)
            den = np.exp(-d / sigma ** 2).sum(axis=1)
            acc += np.mean(np.log2(M * num / np.maximum(den, 1e-300)))
        mi[i] = max(acc / M, 0.0)
    return snr_db, mi


def miesm(sinrs, Qm: int):
    """Mutual-information ESM: sinr_eff [..] linear."""
    snr_db_grid, mi_grid = _mi_grid(Qm)
    g_db = jnp.asarray(snr_db_grid)
    g_mi = jnp.asarray(mi_grid)
    sdb = 10.0 * jnp.log10(jnp.maximum(sinrs, 1e-30))
    mi = jnp.interp(sdb, g_db, g_mi)
    mi_bar = jnp.mean(mi, axis=-1)
    # invert the (monotone) MI curve
    eff_db = jnp.interp(mi_bar, g_mi, g_db)
    return 10.0 ** (eff_db / 10.0)


class BlerTable:
    """Per-MCS AWGN BLER curve with log-linear interpolation."""

    def __init__(self, snr_db: np.ndarray, bler: np.ndarray):
        order = np.argsort(snr_db)
        self.snr_db = np.asarray(snr_db, np.float64)[order]
        b = np.clip(np.asarray(bler, np.float64)[order], 1e-6, 1.0)
        self.log_bler = np.log(b)

    def lookup(self, sinr_eff):
        sdb = 10.0 * jnp.log10(jnp.maximum(sinr_eff, 1e-30))
        lb = jnp.interp(sdb, jnp.asarray(self.snr_db),
                        jnp.asarray(self.log_bler),
                        left=0.0, right=self.log_bler[-1])
        return jnp.exp(lb)


def draw_block_errors(key, bler):
    """Coin-flip block errors from per-trial BLER [..] (abstraction.c's
    uniform draw)."""
    u = jax.random.uniform(key, bler.shape)
    return u < bler


def calibrate_bler_table(sim, snrs, n_frames: int, seed: int = 0
                         ) -> BlerTable:
    """Run the bit-level sim once to produce the abstraction's BLER table —
    the reference's AWGN_results corpus generation flow."""
    rows = []
    for s in snrs:
        errs, trials = sim.run_snr(float(s), n_frames, seed)
        e = np.atleast_1d(np.asarray(errs))[0]
        t = np.atleast_1d(np.asarray(trials))[0]
        rows.append((float(s), e / max(t, 1)))
    arr = np.asarray(rows)
    return BlerTable(arr[:, 0], arr[:, 1])
