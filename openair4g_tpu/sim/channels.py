"""Fading channel models (EPA/EVA/ETU/Rayleigh/AWGN), 36.101 Annex B profiles.

Reference parity: openair1/SIMULATION/TOOLS/random_channel.c (tap tables
:156-163, per-tap complex Gaussian draws + AR(1) forgetting-factor fade
:866-1000, sinc interpolation to a sampled FIR) and multipath_channel.c:152
(time-domain convolution).

TPU-native design: instead of sinc-interpolating taps onto a FIR and
convolving in time (O(L*N) per subframe), the channel is applied **in the
frequency domain**: under the cyclic prefix a time-invariant multipath
channel is exactly a per-subcarrier complex gain
    H(k) = sum_t a_t * exp(-j*2*pi*f_k*tau_t),
so one elementwise multiply on the resource grid replaces the convolution.
Tap draws are batched [B, T] and iid Rayleigh per draw (the reference's
default forgetting_factor=0 in dlsim); AR(1) evolution is available for
correlated fading.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FrameParms

# 36.101 Annex B.2 tap profiles: (delays us, powers dB) — same constants the
# reference carries at random_channel.c:156-163.
PROFILES = {
    "EPA": ((0, .03, .07, .09, .11, .19, .41),
            (0.0, -1.0, -2.0, -3.0, -8.0, -17.2, -20.8)),
    "EVA": ((0, .03, .15, .31, .37, .71, 1.09, 1.73, 2.51),
            (0.0, -1.5, -1.4, -3.6, -0.6, -9.1, -7.0, -12.0, -16.9)),
    "ETU": ((0, .05, .12, .2, .23, .5, 1.6, 2.3, 5.0),
            (-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, -3.0, -5.0, -7.0)),
    "Rayleigh1": ((0.0,), (0.0,)),
    "AWGN": ((0.0,), (0.0,)),
}


@dataclass(frozen=True)
class ChannelModel:
    name: str                 # key into PROFILES
    fp: FrameParms
    forgetting_factor: float = 0.0   # 0 = fresh fade per draw (dlsim default)

    @property
    def n_taps(self) -> int:
        return len(PROFILES[self.name][0])

    @functools.cached_property
    def amps(self) -> np.ndarray:
        """Per-tap linear powers, normalized to sum 1 (random_channel.c:357)."""
        _, p_db = PROFILES[self.name]
        a = 10.0 ** (0.1 * np.asarray(p_db))
        return (a / a.sum()).astype(np.float32)

    @functools.cached_property
    def phase_matrix(self) -> np.ndarray:
        """[T, n_sc] complex64: exp(-j*2*pi*f_k*tau_t) at occupied SCs."""
        delays_us, _ = PROFILES[self.name]
        fp = self.fp
        k = np.arange(fp.n_sc)
        half = 6 * fp.n_rb
        f_idx = np.where(k < half, k - half, k - half + 1)  # signed, DC skipped
        f_hz = f_idx * 15000.0
        tau = np.asarray(delays_us)[:, None] * 1e-6
        return np.exp(-2j * np.pi * f_hz[None, :] * tau).astype(np.complex64)

    def draw_taps(self, key, batch: int):
        """iid Rayleigh taps a [B, T] complex64, E sum|a|^2 = 1.

        `key` may be a single PRNG key (draws [batch, T]) or a [batch] key
        array (one independent key per trial — shards with the batch).
        """
        if self.name == "AWGN":
            return jnp.ones((batch, 1), jnp.complex64)
        import jax.dtypes
        is_typed_key = jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key)
        batched_keys = key.ndim == 2 or (is_typed_key and key.ndim == 1)
        if batched_keys:
            n = jax.vmap(lambda k: jax.random.normal(k, (self.n_taps, 2)))(key)
        else:
            n = jax.random.normal(key, (batch, self.n_taps, 2))
        scale = jnp.sqrt(jnp.asarray(self.amps) / 2.0)
        return (scale * (n[..., 0] + 1j * n[..., 1])).astype(jnp.complex64)

    def evolve_taps(self, a_prev, key):
        """AR(1) fade: a = sqrt(ff)*a_prev + sqrt(1-ff)*a_new
        (random_channel.c forgetting-factor update)."""
        ff = self.forgetting_factor
        a_new = self.draw_taps(key, a_prev.shape[0])
        return (np.sqrt(ff) * a_prev + np.sqrt(1.0 - ff) * a_new).astype(jnp.complex64)

    def freq_response(self, taps):
        """taps [B, T] -> H [B, n_sc] at occupied subcarriers."""
        if self.name == "AWGN":
            return jnp.ones((taps.shape[0], self.fp.n_sc), jnp.complex64)
        pm = jnp.asarray(self.phase_matrix)
        return jnp.matmul(taps, pm, preferred_element_type=jnp.complex64)

    def freq_response_at(self, taps, f_idx: tuple):
        """taps [B, T] -> H [B, len(f_idx)] at signed subcarrier indices
        (uplink allocations have no DC skip, so callers pass their own grid)."""
        if self.name == "AWGN":
            return jnp.ones((taps.shape[0], len(f_idx)), jnp.complex64)
        pm = jnp.asarray(self._phase_matrix_at(f_idx))
        return jnp.matmul(taps, pm, preferred_element_type=jnp.complex64)

    @functools.lru_cache(maxsize=None)
    def _phase_matrix_at(self, f_idx: tuple) -> np.ndarray:
        delays_us, _ = PROFILES[self.name]
        f_hz = np.asarray(f_idx, np.float64) * 15000.0
        tau = np.asarray(delays_us)[:, None] * 1e-6
        return np.exp(-2j * np.pi * f_hz[None, :] * tau).astype(np.complex64)


def apply_channel_grid(grid, H, fp: FrameParms):
    """grid [B, nsym, n_fft] x H [B, n_sc] -> faded grid (exact under CP)."""
    bins = fp.sc_to_bin(np.arange(fp.n_sc))
    return apply_channel_bins(grid, H, bins, fp.n_fft)


def apply_channel_bins(grid, H, bins: np.ndarray, n_fft: int):
    """grid [B, nsym, n_fft] x H [B, len(bins)] at explicit FFT bins."""
    mult = jnp.zeros((H.shape[0], n_fft), H.dtype)
    mult = mult.at[:, jnp.asarray(bins)].set(H)
    return grid * mult[:, None, :]
