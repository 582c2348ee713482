"""PRACH: random-access preamble generation and detection, 36.211 §5.7.

Reference parity: openair1/PHY/LTE_TRANSPORT/prach.c (compute_prach_seq
:1536 — ZC839 roots + cyclic shifts NCS :50-52; generate_prach :598 —
839-pt DFT into the 1.25 kHz PRACH grid via dft1536/24576 :901-996;
rx_prach :1061 — frequency-domain conjugate correlation + IDFT energy/delay
per preamble).

TPU-native: the reference needs hand-written 24576/1536-pt SIMD FFTs because
it detects in the time domain of the full sample stream. Here detection runs
directly on the 839 PRACH bins: correlation IDFT is one [B, 839] x [839, 839]
complex matmul on the MXU (a dense DFT matrix beats Bluestein at this size on
TPU — it is a single systolic pass), then per-preamble windowed energy. The
odd-length transforms never touch XLA's power-of-2 FFT limitation.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

N_ZC = 839

# NCS configurations, unrestricted set (36.211 Table 5.7.2-2)
NCS_UNRESTRICTED = (13, 15, 18, 22, 26, 32, 38, 46, 59, 76, 93, 119, 167,
                    279, 419, 838)


@functools.lru_cache(maxsize=None)
def zc_root(u: int) -> np.ndarray:
    """x_u(n) = exp(-j pi u n(n+1) / 839), n = 0..838."""
    n = np.arange(N_ZC, dtype=np.float64)
    return np.exp(-1j * np.pi * u * n * (n + 1) / N_ZC).astype(np.complex64)


def preamble(u: int, v: int, ncs: int) -> np.ndarray:
    """x_{u,v}(n) = x_u((n + C_v) mod N_ZC), C_v = v * NCS."""
    cv = v * ncs
    x = zc_root(u)
    return np.roll(x, -cv)


@functools.lru_cache(maxsize=None)
def _dft839() -> np.ndarray:
    """[839, 839] unitary DFT matrix (host constant; ~11 MB complex64)."""
    n = np.arange(N_ZC)
    W = np.exp(-2j * np.pi * np.outer(n, n) / N_ZC) / np.sqrt(N_ZC)
    return W.astype(np.complex64)


def preamble_freq(u: int, v: int, ncs: int) -> np.ndarray:
    """Frequency-domain preamble (what the 1.25 kHz PRACH grid carries)."""
    return (_dft839() @ preamble(u, v, ncs)).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _root_freq_conj(u: int) -> np.ndarray:
    return np.conj(_dft839() @ zc_root(u)).astype(np.complex64)


def n_preambles(ncs: int) -> int:
    """Cyclic-shift preambles available per root (unrestricted set)."""
    return N_ZC // ncs if ncs else 1


def prach_detect(rx_freq, u: int, ncs: int, threshold: float = 15.0):
    """Detect preambles on the 839 PRACH bins.

    rx_freq: [B, 839] received frequency-domain PRACH (after CP removal and
    the big DFT — or directly, in an RE-level sim).
    Returns (energy [B, n_pre] per-preamble peak energy normalized by the
    noise floor, delay [B, n_pre] peak position in ZC samples, detected
    [B, n_pre] energy > threshold).

    corr(n) = IDFT(rx .* conj(X_u)) — one MXU matmul; preamble v owns the
    cyclic-shift window [v*ncs, (v+1)*ncs).
    """
    B = rx_freq.shape[0]
    npre = n_preambles(ncs)
    prod = rx_freq * jnp.asarray(_root_freq_conj(u))
    # IDFT = conj(W) @ x (unitary)
    Winv = np.conj(_dft839()).T
    corr = prod @ jnp.asarray(Winv)                      # [B, 839]
    e = jnp.abs(corr) ** 2
    # noise floor: mean energy (the few true peaks bias it negligibly over
    # 839 bins); threshold ~15 gives ~1e-4 false-alarm per occasion
    floor = jnp.mean(e, axis=-1, keepdims=True) + 1e-12
    # x_{u,v}(n) = x_u(n + C_v); a delay-d arrival peaks at
    # m = (d - C_v) mod 839, so preamble v owns window {j - C_v, j in [0,ncs)}
    # and the in-window argmax IS the delay estimate.
    e_wins, d_wins = [], []
    for v in range(npre):
        lo = v * ncs
        win = (np.arange(ncs) - lo) % N_ZC               # positions of v
        ew = e[:, jnp.asarray(win)]                      # [B, ncs]
        pk = jnp.argmax(ew, axis=-1)
        e_wins.append(jnp.max(ew, axis=-1) / floor[:, 0])
        d_wins.append(pk)
    energy = jnp.stack(e_wins, axis=1)                   # [B, npre]
    delay = jnp.stack(d_wins, axis=1)
    return energy, delay, energy > threshold
