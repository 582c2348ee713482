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
from ..phy.channel_est import make_wiener_stack, estimate_channel
from ..phy.equalize import zf_equalize
from ..ops.gold import gold_sequence, pdsch_cinit, scramble_bits, unscramble_llrs
from ..ops.llr import map_symbols, demap_llr
from ..utils.rng import host_keys
from .channels import ChannelModel, apply_channel_grid


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
        n_steps = -(-n_frames // self.cfg.batch)
        for i in range(n_steps):
            keys = jnp.asarray(host_keys(seed, self.cfg.batch, stream=i))
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


@dataclass(frozen=True)
class DlsimFadingConfig:
    mcs: int = 5
    n_rb: int = 50
    channel: str = "EVA"          # PROFILES key; "AWGN" for flat
    n_harq_rounds: int = 4        # rv = round & 3 (dlsim.c:2175)
    perfect_ce: bool = False      # dlsim -F flag equivalent
    n_pdcch_symbols: int = 1
    subframe: int = 7
    rnti: int = 0x1234
    n_id_cell: int = 0
    n_turbo_iter: int = 8
    batch: int = 64


class DlsimFading:
    """Fading-channel downlink simulator with HARQ and channel estimation.

    Per trial and HARQ round: fresh iid channel draw (the reference dlsim's
    hold_channel=0 / forgetting_factor=0 default, dlsim.c:2156), rv cycling
    0,1,2,3, soft combining in the per-block circular buffers.
    """

    def __init__(self, cfg: DlsimFadingConfig):
        self.cfg = cfg
        self.dlsch = DlschCodec(DlschConfig(
            mcs=cfg.mcs, n_rb=cfg.n_rb,
            n_pdcch_symbols=cfg.n_pdcch_symbols,
            n_turbo_iter=cfg.n_turbo_iter))
        self.fp = FrameParms(n_rb=cfg.n_rb, n_id_cell=cfg.n_id_cell)
        self.gm = make_grid_map(cfg.n_rb, cfg.n_pdcch_symbols,
                                cfg.n_id_cell, cfg.subframe)
        self.chan = ChannelModel(name=cfg.channel, fp=self.fp)
        G = self.dlsch.cfg.G
        assert self.gm.n_data_re * self.dlsch.cfg.Qm == G
        cinit = pdsch_cinit(cfg.rnti, 0, 2 * cfg.subframe, cfg.n_id_cell)
        self.scr_seq = gold_sequence(cinit, G)
        self._step = jax.jit(self._trial_step)

    def wiener(self, snr_db: float):
        n0 = 10.0 ** (-snr_db / 10.0)
        return jnp.asarray(make_wiener_stack(self.gm, n0))

    def _trial_step(self, keys, n0, wiener_stack):
        """keys [B]; returns (errs [R], reached [R]) HARQ round statistics."""
        cfg = self.cfg
        codec = self.dlsch
        B = keys.shape[0]
        Qm = codec.cfg.Qm
        data_sym = jnp.asarray(self.gm.data_sym)
        data_sc = jnp.asarray(self.gm.data_sc)

        splits = jax.vmap(lambda k: jax.random.split(k, 2 + 2 * cfg.n_harq_rounds))(keys)
        tb = jax.vmap(lambda k: jax.random.bernoulli(
            k, 0.5, (codec.cfg.tbs,)))(splits[:, 0]).astype(jnp.int32)
        d_flats = codec.encode_to_d(tb)

        reached = jnp.ones(B, bool)
        ok_any = jnp.zeros(B, bool)
        w_soft = None
        errs, reach_counts = [], []
        for rnd in range(cfg.n_harq_rounds):
            rv = rnd & 3
            e = codec.select_e(d_flats, rv)
            e = scramble_bits(e, self.scr_seq)
            sym = map_symbols(e, Qm)
            grid = fill_grid(sym.astype(jnp.complex64), self.gm)
            # fresh fade per round (hold_channel=0)
            taps = self.chan.draw_taps(splits[:, 2 + 2 * rnd], B)
            H = self.chan.freq_response(taps)              # [B, n_sc]
            grid = apply_channel_grid(grid, H, self.fp)
            t = ofdm.ofdm_modulate(grid, self.fp)
            nr = jax.vmap(lambda k: jax.random.normal(
                k, t.shape[1:] + (2,)))(splits[:, 3 + 2 * rnd])
            rx = t + jnp.sqrt(n0 / 2) * (nr[..., 0] + 1j * nr[..., 1])
            rgrid = ofdm.ofdm_demodulate(rx, self.fp)
            if cfg.perfect_ce:
                H_data = H[:, data_sc]
            else:
                H_hat = estimate_channel(rgrid, self.gm, wiener_stack)
                H_data = H_hat[:, data_sym, data_sc]
            y = extract_data_res(rgrid, self.gm)
            x_hat, n0_eff = zf_equalize(y, H_data, n0)
            llr = demap_llr(x_hat, n0_eff, Qm).reshape(B, -1)
            llr = unscramble_llrs(llr, self.scr_seq)
            _, ok, w_soft = codec.decode(llr, w_soft=w_soft, rv=rv)
            ok_now = ok_any | ok
            err_r = reached & ~ok_now
            errs.append(err_r.sum())
            reach_counts.append(reached.sum())
            reached = err_r
            ok_any = ok_now
        return jnp.stack(errs), jnp.stack(reach_counts)

    def run_snr(self, snr_db: float, n_frames: int, seed: int = 0):
        """Returns per-round (errs [R], trials [R]) accumulated."""
        n0 = jnp.float32(10.0 ** (-snr_db / 10.0))
        W = self.wiener(snr_db)
        R = self.cfg.n_harq_rounds
        errs = np.zeros(R, np.int64)
        reach = np.zeros(R, np.int64)
        for i in range(-(-n_frames // self.cfg.batch)):
            keys = jnp.asarray(host_keys(seed, self.cfg.batch, stream=i))
            e, t = self._step(keys, n0, W)
            errs += np.asarray(e, np.int64)
            reach += np.asarray(t, np.int64)
        return errs, reach

    def sweep(self, snrs, n_frames: int, seed: int = 0, verbose: bool = True,
              early_exit: bool = True):
        rows = []
        for s in snrs:
            errs, reach = self.run_snr(float(s), n_frames, seed)
            bler = errs / np.maximum(reach, 1)
            rows.append((float(s), errs.copy(), reach.copy(), bler.copy()))
            if verbose:
                txt = " ".join(f"r{r}:{bler[r]:.3f}({errs[r]}/{reach[r]})"
                               for r in range(len(bler)))
                print(f"SNR {s:+6.2f} dB: {txt}", flush=True)
            if early_exit and errs[-1] == 0:
                break
        return rows
