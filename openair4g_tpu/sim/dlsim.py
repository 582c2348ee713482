"""dlsim equivalent: eNB TX -> channel -> UE RX PDSCH BLER Monte-Carlo.

Reference parity: openair1/SIMULATION/LTE_PHY/dlsim.c:233 (main loop
structure: SNR sweep x trials, TX chain dlsim.c:2553-2704, noise calibration
:2852, RX chain :2927-3364) and the AWGN BLER corpus
BLER_SIMULATIONS/AWGN/AWGN_results/*.csv.

TPU-native: one jitted trial step runs [batch] complete subframes — encode,
scramble, QAM-map, grid-fill, OFDM, channel, OFDM demod, demap, decode — and
the SNR sweep feeds different noise sigmas to the same compiled program.

Noise calibration (must match the reference, dlsim.c:2852): SNR is defined
per occupied subcarrier. With unitary FFTs and a unit-energy constellation,
Es = 1 per RE and time-domain per-sample noise variance N0 = 10^(-SNR/10)
yields exactly Es/N0 = SNR on every RE.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FrameParms
from ..phy.pdsch import DlschConfig, DlschCodec
from ..phy.resource_grid import make_grid_map, fill_grid, extract_data_res
from ..phy import ofdm
from ..ops.gold import gold_sequence, pdsch_cinit, scramble_bits, unscramble_llrs
from ..ops.llr import map_symbols, demap_llr


@dataclass(frozen=True)
class DlsimConfig:
    mcs: int = 4
    n_rb: int = 25
    n_pdcch_symbols: int = 1
    subframe: int = 7
    rnti: int = 0x1234
    n_id_cell: int = 0
    n_turbo_iter: int = 8
    batch: int = 64           # subframes per jitted step


class DlsimAwgn:
    """AWGN + perfect channel knowledge downlink link-level simulator."""

    def __init__(self, cfg: DlsimConfig):
        self.cfg = cfg
        self.dlsch = DlschCodec(DlschConfig(
            mcs=cfg.mcs, n_rb=cfg.n_rb,
            n_pdcch_symbols=cfg.n_pdcch_symbols,
            n_turbo_iter=cfg.n_turbo_iter))
        self.fp = FrameParms(n_rb=cfg.n_rb, n_id_cell=cfg.n_id_cell)
        self.gm = make_grid_map(cfg.n_rb, cfg.n_pdcch_symbols,
                                cfg.n_id_cell, cfg.subframe)
        G = self.dlsch.cfg.G
        assert self.gm.n_data_re * self.dlsch.cfg.Qm == G, \
            (self.gm.n_data_re, G)
        cinit = pdsch_cinit(cfg.rnti, 0, 2 * cfg.subframe, cfg.n_id_cell)
        self.scr_seq = gold_sequence(cinit, G)
        self._step = jax.jit(self._trial_step)

    def _trial_step(self, keys, n0):
        """One batched trial. `keys`: [B] PRNG keys — one per subframe trial,
        so the batch axis shards cleanly over a device mesh (DP over UE
        channels, SURVEY.md §2.12 P4)."""
        cfg = self.cfg
        codec = self.dlsch
        B = keys.shape[0]
        Qm = codec.cfg.Qm
        splits = jax.vmap(jax.random.split)(keys)       # [B, 2, key]
        k_bits, k_noise = splits[:, 0], splits[:, 1]
        tb = jax.vmap(lambda k: jax.random.bernoulli(
            k, 0.5, (codec.cfg.tbs,)))(k_bits).astype(jnp.int32)
        # --- TX chain -------------------------------------------------------
        e = codec.encode(tb)
        e = scramble_bits(e, self.scr_seq)
        sym = map_symbols(e, Qm)
        grid = fill_grid(sym.astype(jnp.complex64), self.gm)
        t = ofdm.ofdm_modulate(grid, self.fp)
        # --- channel: AWGN --------------------------------------------------
        nr = jax.vmap(lambda k: jax.random.normal(k, t.shape[1:] + (2,)))(k_noise)
        noise = jnp.sqrt(n0 / 2) * (nr[..., 0] + 1j * nr[..., 1])
        rx = t + noise
        # --- RX chain -------------------------------------------------------
        rgrid = ofdm.ofdm_demodulate(rx, self.fp)
        y = extract_data_res(rgrid, self.gm)
        llr = demap_llr(y, n0, Qm).reshape(B, -1)
        llr = unscramble_llrs(llr, self.scr_seq)
        tb_hat, tb_ok, _ = codec.decode(llr)
        bit_errs = jnp.sum(jnp.abs(tb_hat - tb), axis=1)
        return tb_ok, bit_errs

    def run_snr(self, snr_db: float, n_frames: int, seed: int = 0):
        """Round-0 BLER at one SNR. Returns (errors, trials)."""
        n0 = jnp.float32(10.0 ** (-snr_db / 10.0))
        errs = trials = 0
        key = jax.random.PRNGKey(seed)
        n_steps = -(-n_frames // self.cfg.batch)
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, self.cfg.batch)
            ok, _ = self._step(keys, n0)
            ok = np.asarray(ok)
            errs += int((~ok).sum())
            trials += len(ok)
        return errs, trials

    def sweep(self, snrs, n_frames: int, seed: int = 0, verbose: bool = True,
              early_exit: bool = True):
        """SNR sweep; returns list of (snr, errs, trials, bler)."""
        rows = []
        for s in snrs:
            errs, trials = self.run_snr(float(s), n_frames, seed)
            bler = errs / trials
            rows.append((float(s), errs, trials, bler))
            if verbose:
                print(f"SNR {s:+6.2f} dB: BLER {bler:.4f} ({errs}/{trials})")
            if early_exit and errs == 0:
                break
        return rows
