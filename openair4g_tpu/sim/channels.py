"""Fading channel catalog (EPA/EVA/ETU/SCM/Rayleigh/Rice), 36.101 Annex B +
25.814 SCM profiles, with antenna correlation and Ricean LOS components.

Reference parity: openair1/SIMULATION/TOOLS/random_channel.c —
  * tap tables :153-163 (SCM-C/EPA/EVA/ETU delays+powers, default_amps_lin),
  * model catalog :222-846 (SCM_C/SCM_D/EPA/EVA/ETU/Rayleigh8/Rice8/
    Rayleigh1/Rice1 + *_corr/_anticorr variants; SCM_A/SCM_B are "not yet
    supported" in the reference and are therefore out of the capability map),
  * per-tap complex Gaussian scattered draws + Ricean LOS plane-wave term
    :884-901 (tap 0 gets sqrt(1-K)*exp(j*pi*(rx-tx)*sin(aoa))),
  * R_sqrt antenna-correlation matmul :920-928 (scm_corrmat.h R22/R21/R12_sqrt
    per tap triplet; R_sqrt_22_corr/anticorr for the Rayleigh1/Rice1 variants),
  * AR(1) forgetting-factor fade :939-955,
and multipath_channel.c:152 (time-domain convolution).

TPU-native design: instead of sinc-interpolating taps onto a FIR and
convolving in time (O(L*N) per subframe), the channel is applied **in the
frequency domain**: under the cyclic prefix a time-invariant multipath
channel is exactly a per-subcarrier complex gain
    H(k) = sum_t a_t * exp(-j*2*pi*f_k*tau_t),
so one elementwise multiply on the resource grid replaces the convolution.
Tap draws are batched [B, (n_rx, n_tx,) T]; antenna correlation is one
einsum against the R_sqrt stack; iid per draw matches the reference dlsim's
hold_channel=0 default (dlsim.c:2156 — a *fresh* channel every HARQ round),
while AR(1) evolution with a Jakes-derived forgetting factor models the
physical Doppler correlation across HARQ rounds (EVA5 at the 8 ms HARQ RTT
is 98% correlated; ETU70 is effectively uncorrelated).
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
_SCM_C_DELAYS = (0, 0.0125, 0.0250, 0.3625, 0.3750, 0.3875, 0.2500, 0.2625,
                 0.2750, 1.0375, 1.0500, 1.0625, 2.7250, 2.7375, 2.7500,
                 4.6000, 4.6125, 4.6250)
_SCM_C_AMPS_DB = (0.00, -2.22, -3.98, -1.86, -4.08, -5.84, -1.08, -3.30,
                  -5.06, -9.08, -11.30, -13.06, -15.14, -17.36, -19.12,
                  -20.64, -22.85, -24.62)
# random_channel.c:165 default_amps_lin (linear, ~sum 1) for Rayleigh8/Rice8,
# uniform delays i*Td/8 with Td=0.8us (fill_channel_desc delays==NULL branch).
_RAYLEIGH8_AMPS_LIN = (0.3868472, 0.3094778, 0.1547389, 0.0773694,
                       0.0386847, 0.0193424, 0.0096712, 0.0038685)
_RAYLEIGH8_DELAYS = tuple(0.1 * i for i in range(8))

PROFILES = {
    "EPA": ((0, .03, .07, .09, .11, .19, .41),
            (0.0, -1.0, -2.0, -3.0, -8.0, -17.2, -20.8)),
    "EVA": ((0, .03, .15, .31, .37, .71, 1.09, 1.73, 2.51),
            (0.0, -1.5, -1.4, -3.6, -0.6, -9.1, -7.0, -12.0, -16.9)),
    "ETU": ((0, .05, .12, .2, .23, .5, 1.6, 2.3, 5.0),
            (-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, -3.0, -5.0, -7.0)),
    "SCM_C": (_SCM_C_DELAYS, _SCM_C_AMPS_DB),
    "SCM_D": (_SCM_C_DELAYS, _SCM_C_AMPS_DB),   # SCM-C taps + Rice factor
    "Rayleigh1": ((0.0,), (0.0,)),
    "Rayleigh1_corr": ((0.0,), (0.0,)),
    "Rayleigh1_anticorr": ((0.0,), (0.0,)),
    "Rice1": ((0.0,), (0.0,)),
    "AWGN": ((0.0,), (0.0,)),
}

# Models whose power column is already linear amplitude (not dB).
_LINEAR_AMP_MODELS = {"Rayleigh8", "Rice8"}
PROFILES["Rayleigh8"] = (_RAYLEIGH8_DELAYS, _RAYLEIGH8_AMPS_LIN)
PROFILES["Rice8"] = (_RAYLEIGH8_DELAYS, _RAYLEIGH8_AMPS_LIN)

# Ricean scattered-power fraction K_s per model (reference `ricean_factor`,
# random_channel.c — 1.0 means pure Rayleigh; Rice/SCM-D use 0.1) and
# angle-of-arrival for the LOS plane wave.
_RICEAN = {"Rice1": (0.1, 0.03, True), "Rice8": (0.1, 0.03, True),
           "SCM_D": (0.1, 0.0, False)}

# --- antenna correlation (scm_corrmat.h + random_channel.c:169-191) --------
# Row-major [A*A] complex square roots of the antenna correlation matrix,
# A = n_tx*n_rx with vec index tx*n_rx + rx. SCM uses one matrix per tap
# triplet (R_sqrt[i/3], random_channel.c:928); the Rayleigh1 variants use one.
_SQ2 = 0.70711
R_SQRT_22_CORR = np.array(
    [[_SQ2, 0, _SQ2, 0], [0, _SQ2, 0, _SQ2],
     [_SQ2, 0, _SQ2, 0], [0, _SQ2, 0, _SQ2]], np.complex64)
R_SQRT_22_ANTICORR = np.array(
    [[_SQ2, 0, -_SQ2, 0], [0, _SQ2, 0, -_SQ2],
     [-_SQ2, 0, _SQ2, 0], [0, -_SQ2, 0, _SQ2]], np.complex64)
R_SQRT_21_CORR = np.full((2, 2), _SQ2, np.complex64)
R_SQRT_21_ANTICORR = np.array([[_SQ2, -_SQ2], [-_SQ2, _SQ2]], np.complex64)


def _c(rows, a):
    """Interleaved (re, im) row list -> [n, A, A] complex64."""
    arr = np.asarray(rows, np.float64)
    cx = arr[:, 0::2] + 1j * arr[:, 1::2]
    return cx.reshape(len(rows), a, a).astype(np.complex64)


# scm_corrmat.h: 6 matrices (one per 3-tap group) for 2x2 / 2x1 / 1x2.
R22_SQRT = _c([
    [0.921700, -0.000000, 0.010380, -0.027448, -0.250153, 0.294754, 0.005961, 0.010769, 0.010380, 0.027448, 0.921700, 0.000000, -0.011595, -0.004130, -0.250153, 0.294754, -0.250153, -0.294754, -0.011595, 0.004130, 0.921700, 0.000000, 0.010380, -0.027448, 0.005961, -0.010769, -0.250153, -0.294754, 0.010380, 0.027448, 0.921700, 0.000000],
    [0.923810, 0.000000, 0.004069, 0.027832, 0.151730, 0.350180, -0.009882, 0.006114, 0.004069, -0.027832, 0.923810, 0.000000, 0.011218, -0.003029, 0.151730, 0.350180, 0.151730, -0.350180, 0.011218, 0.003029, 0.923810, -0.000000, 0.004069, 0.027832, -0.009882, -0.006114, 0.151730, -0.350180, 0.004069, -0.027832, 0.923810, 0.000000],
    [0.927613, 0.000000, 0.014253, 0.025767, -0.061171, -0.367133, 0.009258, -0.007340, 0.014253, -0.025767, 0.927613, -0.000000, -0.011138, -0.003942, -0.061171, -0.367133, -0.061171, 0.367133, -0.011138, 0.003942, 0.927613, 0.000000, 0.014253, 0.025767, 0.009258, 0.007340, -0.061171, 0.367133, 0.014253, -0.025767, 0.927613, 0.000000],
    [0.869794, -0.000000, -0.010613, -0.001218, 0.399115, 0.289852, -0.004464, -0.004096, -0.010613, 0.001218, 0.869794, -0.000000, -0.005276, -0.002978, 0.399115, 0.289852, 0.399115, -0.289852, -0.005276, 0.002978, 0.869794, -0.000000, -0.010613, -0.001218, -0.004464, 0.004096, 0.399115, -0.289852, -0.010613, 0.001218, 0.869794, 0.000000],
    [0.919726, -0.000000, 0.038700, -0.111146, 0.217804, 0.300925, 0.045531, -0.013659, 0.038700, 0.111146, 0.919726, 0.000000, -0.027201, 0.038983, 0.217804, 0.300925, 0.217804, -0.300925, -0.027201, -0.038983, 0.919726, 0.000000, 0.038700, -0.111146, 0.045531, 0.013659, 0.217804, -0.300925, 0.038700, 0.111146, 0.919726, 0.000000],
    [0.867608, -0.000000, 0.194097, -0.112414, -0.418811, 0.095938, -0.081264, 0.075727, 0.194097, 0.112414, 0.867608, -0.000000, -0.106125, -0.032801, -0.418811, 0.095938, -0.418811, -0.095938, -0.106125, 0.032801, 0.867608, 0.000000, 0.194097, -0.112414, -0.081264, -0.075727, -0.418811, -0.095938, 0.194097, 0.112414, 0.867608, 0.000000],
], 4)
R21_SQRT = _c([
    [0.922167, 0.000000, -0.250280, 0.294903, -0.250280, -0.294903, 0.922167, 0.000000],
    [0.924238, 0.000000, 0.151801, 0.350342, 0.151801, -0.350342, 0.924238, 0.000000],
    [0.928080, 0.000000, -0.061202, -0.367318, -0.061202, 0.367318, 0.928080, 0.000000],
    [0.869860, 0.000000, 0.399145, 0.289874, 0.399145, -0.289874, 0.869860, 0.000000],
    [0.927225, 0.000000, 0.219580, 0.303378, 0.219580, -0.303378, 0.927225, 0.000000],
    [0.896133, 0.000000, -0.432581, 0.099092, -0.432581, -0.099092, 0.896133, 0.000000],
], 2)
R12_SQRT = _c([
    [0.999494, 0.000000, 0.011256, -0.029765, 0.011256, 0.029765, 0.999494, 0.000000],
    [0.999537, 0.000000, 0.004402, 0.030114, 0.004402, -0.030114, 0.999537, 0.000000],
    [0.999497, 0.000000, 0.015358, 0.027764, 0.015358, -0.027764, 0.999497, 0.000000],
    [0.999925, -0.000000, -0.012201, -0.001400, -0.012201, 0.001400, 0.999925, 0.000000],
    [0.991912, 0.000000, 0.041738, -0.119870, 0.041738, 0.119870, 0.991912, 0.000000],
    [0.968169, 0.000000, 0.216594, -0.125443, 0.216594, 0.125443, 0.968169, 0.000000],
], 2)


def bessel_j0(x) -> np.ndarray:
    """J0 via its integral form (host-side, used only for Doppler rho)."""
    th = np.linspace(0.0, np.pi, 2001)
    return np.trapz(np.cos(np.asarray(x)[..., None] * np.sin(th)),
                    th, axis=-1) / np.pi


def jakes_rho(doppler_hz: float, dt_s: float) -> float:
    """Fade autocorrelation over dt under the Jakes spectrum."""
    return float(bessel_j0(2.0 * np.pi * doppler_hz * dt_s))


def harq_forgetting_factor(doppler_hz: float, dt_s: float = 8e-3) -> float:
    """AR(1) forgetting factor reproducing the Jakes correlation at the HARQ
    RTT: evolve_taps gives corr sqrt(ff) per step, so ff = rho^2 (negative
    rho — past the first Jakes null — is clamped to iid, which is what the
    reference's fresh-draw dlsim behavior amounts to there)."""
    return max(jakes_rho(doppler_hz, dt_s), 0.0) ** 2


@dataclass(frozen=True)
class ChannelModel:
    name: str                 # key into PROFILES
    fp: FrameParms
    forgetting_factor: float = 0.0   # 0 = fresh fade per draw (dlsim default)
    n_tx: int = 1
    n_rx: int = 1
    delay_scale: float = 1.0  # multiplies every tap delay. 1.0 = the true
    #   36.101 profile. The *reference sims* effectively run with
    #   delay_scale = BW/f_s = 0.651: random_channel.c:988 places tap l at
    #   FIR sample position delays[l]*BW, but dlsim passes BW = the nominal
    #   channel bandwidth (10.0 for 50 PRB, dlsim.c:697) while the signal
    #   is sampled at f_s = ofdm_symbol_size*15 kHz (15.36 Msps at 50 PRB),
    #   so the reference's EVA/ETU delay spread is compressed by 0.651 at
    #   every LTE bandwidth. Use delay_scale=0.651 to reproduce the
    #   REFERENCE_DATA/pdsch.txt corpus; see VALIDATION.md root-cause note.

    @property
    def n_taps(self) -> int:
        return len(PROFILES[self.name][0])

    @functools.cached_property
    def amps(self) -> np.ndarray:
        """Per-tap linear powers, normalized to sum 1 (random_channel.c:357)."""
        _, p = PROFILES[self.name]
        a = np.asarray(p, np.float64)
        if self.name not in _LINEAR_AMP_MODELS:
            a = 10.0 ** (0.1 * a)
        return (a / a.sum()).astype(np.float32)

    @property
    def ricean(self):
        """(scattered fraction K_s, aoa, random_aoa) — (1, 0, False) = pure
        Rayleigh."""
        return _RICEAN.get(self.name, (1.0, 0.0, False))

    @functools.cached_property
    def r_sqrt_stack(self) -> np.ndarray | None:
        """[T, A, A] antenna-correlation square roots (A = n_tx*n_rx, vec
        index tx*n_rx + rx), or None for uncorrelated models."""
        a = self.n_tx * self.n_rx
        if a == 1:
            return None
        if self.name in ("SCM_C", "SCM_D"):
            if (self.n_tx, self.n_rx) == (2, 2):
                base = R22_SQRT
            elif (self.n_tx, self.n_rx) == (2, 1):
                base = R21_SQRT
            elif (self.n_tx, self.n_rx) == (1, 2):
                base = R12_SQRT
            else:
                return None   # identity (reference warns + uses identity)
            return base[np.arange(self.n_taps) // 3]
        if self.name.endswith("_corr") or self.name.endswith("_anticorr"):
            anti = self.name.endswith("_anticorr")
            if (self.n_tx, self.n_rx) == (2, 2):
                m = R_SQRT_22_ANTICORR if anti else R_SQRT_22_CORR
            elif (self.n_tx, self.n_rx) == (2, 1):
                m = R_SQRT_21_ANTICORR if anti else R_SQRT_21_CORR
            else:
                return None
            return m[None].repeat(self.n_taps, axis=0)
        return None

    @functools.cached_property
    def phase_matrix(self) -> np.ndarray:
        """[T, n_sc] complex64: exp(-j*2*pi*f_k*tau_t) at occupied SCs."""
        fp = self.fp
        k = np.arange(fp.n_sc)
        half = 6 * fp.n_rb
        f_idx = np.where(k < half, k - half, k - half + 1)  # signed, DC skipped
        return self._phase_matrix_at(tuple(int(i) for i in f_idx))

    def _mimo_normal(self, key, batch: int, per_key_shape):
        """Draw N(0,1) of shape [B, *per_key_shape]; `key` may be one key or
        a [batch] key array (one independent key per trial — shards with the
        batch)."""
        import jax.dtypes
        is_typed_key = jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key)
        batched_keys = key.ndim == 2 or (is_typed_key and key.ndim == 1)
        if batched_keys:
            return jax.vmap(lambda k: jax.random.normal(k, per_key_shape))(key)
        return jax.random.normal(key, (batch,) + per_key_shape)

    def draw_taps(self, key, batch: int):
        """Tap draw a, E sum_t |a|^2 = 1 per antenna pair.

        Returns [B, T] for a 1x1 model (back-compat) and
        [B, n_rx, n_tx, T] otherwise. Scattered part is iid complex Gaussian
        scaled by sqrt(K_s*amps/2); Ricean models add the LOS plane wave on
        tap 0; correlated models multiply the antenna vector by R_sqrt
        (random_channel.c:884-928 semantics).
        """
        if self.name == "AWGN":
            if self.n_tx == self.n_rx == 1:
                return jnp.ones((batch, 1), jnp.complex64)
            return jnp.ones((batch, self.n_rx, self.n_tx, 1), jnp.complex64)
        T, ntx, nrx = self.n_taps, self.n_tx, self.n_rx
        k_s, aoa, random_aoa = self.ricean
        n = self._mimo_normal(key, batch, (nrx, ntx, T, 2))
        scale = jnp.sqrt(k_s * jnp.asarray(self.amps) / 2.0)
        a = (scale * (n[..., 0] + 1j * n[..., 1])).astype(jnp.complex64)
        if k_s != 1.0:
            # LOS on tap 0: sqrt(1-K_s) * exp(j*pi*(rx - tx)*sin(aoa));
            # random_aoa draws aoa ~ U[0, 2pi) per trial (Rice1/Rice8).
            d = (jnp.arange(nrx)[:, None] - jnp.arange(ntx)[None, :]
                 ).astype(jnp.float32)
            if random_aoa:
                # Deterministic per-trial angle folded from the same normals
                # (keeps the single-key/batched-key contract without an extra
                # key): uniform via the Gaussian CDF of an extra draw.
                u = self._mimo_normal(key, batch, (1,))[..., 0]
                ang = 2.0 * jnp.pi * (0.5 * (1.0 + jax.lax.erf(
                    u / np.sqrt(2.0))))
                sin_aoa = jnp.sin(ang)[:, None, None]
            else:
                sin_aoa = jnp.float32(np.sin(aoa))
            los = jnp.sqrt(1.0 - k_s) * jnp.exp(
                1j * jnp.pi * d * sin_aoa).astype(jnp.complex64)
            a = a.at[..., 0].add(los)
        rs = self.r_sqrt_stack
        if rs is not None:
            # vec index tx*n_rx + rx: [B,rx,tx,T] -> [B,T,A]
            v = a.transpose(0, 3, 2, 1).reshape(batch, T, ntx * nrx)
            v = jnp.einsum("tij,btj->bti", jnp.asarray(rs), v)
            a = v.reshape(batch, T, ntx, nrx).transpose(0, 3, 2, 1)
        if ntx == nrx == 1:
            return a[:, 0, 0, :]
        return a

    def evolve_taps(self, a_prev, key, ff: float | None = None):
        """AR(1) fade: a = sqrt(ff)*a_prev + sqrt(1-ff)*a_new
        (random_channel.c:939-955 forgetting-factor update). Correlation
        between consecutive draws is sqrt(ff); use
        harq_forgetting_factor(doppler) for a Jakes-matched HARQ-round rho."""
        ff = self.forgetting_factor if ff is None else ff
        a_new = self.draw_taps(key, a_prev.shape[0])
        return (np.sqrt(ff) * a_prev
                + np.sqrt(1.0 - ff) * a_new).astype(jnp.complex64)

    def freq_response(self, taps):
        """taps [..., T] -> H [..., n_sc] at occupied subcarriers."""
        if self.name == "AWGN":
            return jnp.ones(taps.shape[:-1] + (self.fp.n_sc,), jnp.complex64)
        pm = jnp.asarray(self.phase_matrix)
        return jnp.matmul(taps, pm, preferred_element_type=jnp.complex64)

    def freq_response_at(self, taps, f_idx: tuple):
        """taps [..., T] -> H [..., len(f_idx)] at signed subcarrier indices
        (uplink allocations have no DC skip, so callers pass their own grid)."""
        if self.name == "AWGN":
            return jnp.ones(taps.shape[:-1] + (len(f_idx),), jnp.complex64)
        pm = jnp.asarray(self._phase_matrix_at(f_idx))
        return jnp.matmul(taps, pm, preferred_element_type=jnp.complex64)

    @functools.lru_cache(maxsize=None)
    def _phase_matrix_at(self, f_idx: tuple) -> np.ndarray:
        delays_us, _ = PROFILES[self.name]
        f_hz = np.asarray(f_idx, np.float64) * 15000.0
        tau = np.asarray(delays_us)[:, None] * 1e-6 * self.delay_scale
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


# ----------------------------------------------------- time-domain path --

FIR_PRE_RING = 8     # bulk delay giving the sinc placement room for its
#                      pre-ringing (the reference's NB_SAMPLES_CHANNEL_OFFSET)


def _fir_sinc_matrix(cm: "ChannelModel") -> np.ndarray:
    delays_us, _ = PROFILES[cm.name]
    fs = cm.fp.n_fft * 15000.0
    d = np.asarray(delays_us, np.float64) * 1e-6 * cm.delay_scale * fs \
        + FIR_PRE_RING
    L_ch = int(np.ceil(d.max())) + FIR_PRE_RING + 1
    k = np.arange(L_ch)
    return np.sinc(k[:, None] - d[None, :])         # [L_ch, T]


def _fir_from_taps(cm: "ChannelModel", taps):
    """taps [..., T] -> FIR [..., L_ch]: band-limited (sinc) placement of
    each tap at its fractional sample delay — the reference's
    multipath_channel FIR construction (random_channel.c:984-1005,
    desc->ch[k] = sum_l sinc(k - delays[l]*BW + offset) * a_l); the
    FIR_PRE_RING bulk delay is its NB_SAMPLES_CHANNEL_OFFSET (room for
    the sinc pre-ring; a pure in-CP linear phase the estimator absorbs).
    """
    S = _fir_sinc_matrix(cm)
    return jnp.matmul(taps, jnp.asarray(S.T, jnp.complex64),
                      preferred_element_type=jnp.complex64)


def fir_freq_response(cm: "ChannelModel", taps, n_fft: int | None = None):
    """The truncated FIR's exact response at the occupied subcarriers,
    with the FIR_PRE_RING bulk delay REMOVED (apply_channel_time
    compensates it at the receive window, so the effective channel stays
    causal within the estimators' [0, CP+2) delay support) — the
    genie-CE counterpart of apply_channel_time and its cross-check."""
    fir = _fir_from_taps(cm, taps)                  # [..., L_ch]
    fp = cm.fp
    sc = np.arange(fp.n_sc)
    half = 6 * fp.n_rb
    f_idx = np.where(sc < half, sc - half, sc - half + 1)
    k = np.arange(fir.shape[-1]) - FIR_PRE_RING
    F = np.exp(-2j * np.pi * f_idx[:, None] * k[None, :] / fp.n_fft)
    return jnp.matmul(fir, jnp.asarray(F.T, jnp.complex64),
                      preferred_element_type=jnp.complex64)


def apply_channel_time(t, cm: "ChannelModel", taps):
    """Time-domain FIR convolution of the subframe sample stream — the
    reference's multipath_channel (multipath_channel.c:152-219) rather
    than the per-subcarrier multiply (which is exact only while the
    delay spread fits the cyclic prefix; ETU at 25 PRB exceeds normal CP
    by ~2 samples, so the reference corpus carries real ISI this path
    reproduces). Linear (not circular) convolution via FFT with
    zero-padding; the tail beyond the subframe is dropped, as the
    reference's next-subframe spill is.

    t [B, S] complex time samples; taps [B, T] (single RX chain) ->
    [B, S].
    """
    if cm.name == "AWGN":
        return t
    fir = _fir_from_taps(cm, taps)                  # [B, L_ch]
    B, S = t.shape
    L = fir.shape[-1]
    n = S + L                                       # linear-conv length
    Tf = jnp.fft.fft(t, n=n, axis=-1)
    Ff = jnp.fft.fft(fir, n=n, axis=-1)
    # receive window starts FIR_PRE_RING samples in: the bulk pre-ring
    # offset is absorbed by timing (as the reference's sync absorbs its
    # NB_SAMPLES_CHANNEL_OFFSET), keeping the effective channel causal
    # within the estimators' CP-long delay support
    y = jnp.fft.ifft(Tf * Ff, axis=-1)[:, FIR_PRE_RING:FIR_PRE_RING + S]
    return y.astype(jnp.complex64)


# ----------------------------------------- intra-subframe Doppler fade --
# High-speed validation (VERDICT r4 missing #4): the reference's
# BLER_SIMULATIONS/bler_{66..550}.m speed corpus stresses the estimator's
# time interpolation (lte_dl_channel_estimation.c:643-665 high-speed
# mode). The catalog draws above are subframe-constant; these helpers add
# the real intra-TTI variation: per-OFDM-symbol tap states with the exact
# Jakes autocorrelation J0(2*pi*fd*dt) across the 14 symbol centers.

def symbol_center_times(fp: FrameParms) -> np.ndarray:
    """[nsym] center time (seconds) of each OFDM symbol in a subframe."""
    fs = fp.sample_rate_hz
    t, pos = [], 0
    for s in range(fp.symbols_per_subframe):
        cp = fp.cp0 if (s % fp.symbols_per_slot) == 0 else fp.cp
        t.append((pos + cp + fp.n_fft / 2) / fs)
        pos += cp + fp.n_fft
    return np.asarray(t)


@functools.lru_cache(maxsize=None)
def jakes_symbol_corr_sqrt(n_rb: int, doppler_hz: float,
                           normal_cp: bool = True) -> np.ndarray:
    """[nsym, nsym] Cholesky factor of the Jakes correlation matrix
    R[i,j] = J0(2*pi*fd*|t_i - t_j|) over the symbol centers: L @ iid
    unit-variance draws gives per-symbol tap states whose marginals match
    draw_taps and whose time correlation is exactly Jakes."""
    fp = FrameParms(n_rb=n_rb, normal_cp=normal_cp)
    t = symbol_center_times(fp)
    d = np.abs(t[:, None] - t[None, :])
    r = bessel_j0(2.0 * np.pi * doppler_hz * d)
    return np.linalg.cholesky(r + 1e-9 * np.eye(len(t))).astype(np.float32)


def draw_taps_timevar(cm: ChannelModel, key, batch: int,
                      doppler_hz: float):
    """[B, nsym, T] Jakes-correlated tap trajectories (SISO models)."""
    assert cm.n_tx == cm.n_rx == 1, "timevar: SISO catalog models"
    fp = cm.fp
    nsym = fp.symbols_per_subframe
    if cm.name == "AWGN":
        return jnp.ones((batch, nsym, 1), jnp.complex64)
    T = cm.n_taps
    n = cm._mimo_normal(key, batch, (nsym, T, 2))
    g = (n[..., 0] + 1j * n[..., 1]).astype(jnp.complex64)  # iid, var 2
    L = jnp.asarray(jakes_symbol_corr_sqrt(fp.n_rb, float(doppler_hz),
                                           fp.normal_cp))
    g = jnp.einsum("su,but->bst", L.astype(jnp.complex64), g)
    scale = jnp.sqrt(jnp.asarray(cm.amps) / 2.0)
    return (scale * g).astype(jnp.complex64)


def apply_channel_grid_timevar(grid, cm: ChannelModel, taps_sym,
                               fp: FrameParms):
    """grid [B, nsym, n_fft] x taps_sym [B, nsym, T] -> faded grid with a
    DIFFERENT channel on every OFDM symbol (exact under CP per symbol).
    Returns (faded grid, H_sym [B, nsym, n_sc])."""
    pm = jnp.asarray(cm.phase_matrix)                  # [T, n_sc]
    H_sym = jnp.matmul(taps_sym, pm,
                       preferred_element_type=jnp.complex64)
    bins = fp.sc_to_bin(np.arange(fp.n_sc))
    out = grid.at[:, :, jnp.asarray(bins)].multiply(H_sym)
    return out, H_sym
