"""PUSCH link-level BLER simulator (the reference's ulsim).

Reference parity: openair1/SIMULATION/LTE_PHY/ulsim.c:163 — UE TX
(ulsch_encoding -> scrambling -> SC-FDMA modulation with transform
precoding + DMRS) -> multipath/AWGN channel -> eNB RX (channel estimation,
MMSE frequency equalization, despread, LLR, turbo decode) with HARQ.

TPU-native: one jitted trial step batched over trials; the channel is a
per-subcarrier complex gain (exact under CP); BLER statistics accumulate
per HARQ round exactly like sim/dlsim.py.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FrameParms
from ..phy.pdsch import DlschCodec
from ..phy.pusch import (UlschConfig, ul_estimate_channel,
                         make_ul_wiener, scfdma_mmse_equalize)
from ..phy.scfdma import (make_pusch_map, pusch_fill_grid, pusch_extract,
                          transform_deprecode)
from ..phy.ulref import pusch_dmrs
from ..phy import ofdm
from ..ops.gold import gold_sequence, pusch_cinit, scramble_bits, unscramble_llrs
from ..ops.llr import map_symbols, demap_llr
from ..utils.rng import host_keys
from .channels import ChannelModel, apply_channel_bins


@dataclass(frozen=True)
class UlsimConfig:
    mcs: int = 10
    n_rb: int = 25                # system bandwidth
    n_rb_alloc: int = 25          # PUSCH allocation width
    rb_offset: int = 0
    channel: str = "AWGN"
    n_harq_rounds: int = 1
    perfect_ce: bool = False
    subframe: int = 0
    rnti: int = 0x1234
    n_id_cell: int = 0
    n_turbo_iter: int = 8
    batch: int = 64
    dmrs_group: int = 0           # u (group hopping off)
    dmrs_cyclic_shift: int = 0


class Ulsim:
    """Uplink link simulator with HARQ; mirrors sim/dlsim.DlsimFading."""

    def __init__(self, cfg: UlsimConfig):
        self.cfg = cfg
        ul = UlschConfig(mcs=cfg.mcs, n_rb_alloc=cfg.n_rb_alloc,
                         n_turbo_iter=cfg.n_turbo_iter)
        self.ulsch = ul
        self.codec = DlschCodec(ul)   # 36.212 chain is shared with DL-SCH
        self.fp = FrameParms(n_rb=cfg.n_rb, n_id_cell=cfg.n_id_cell)
        self.pm = make_pusch_map(cfg.n_rb, cfg.n_rb_alloc, cfg.rb_offset)
        self.dmrs = pusch_dmrs(self.pm.m_sc, u=cfg.dmrs_group,
                               cyclic_shift=cfg.dmrs_cyclic_shift)
        self.chan = ChannelModel(name=cfg.channel, fp=self.fp)
        self.f_idx = tuple(
            (cfg.rb_offset * 12 + np.arange(self.pm.m_sc) - 6 * cfg.n_rb
             ).tolist())
        cinit = pusch_cinit(cfg.rnti, 2 * cfg.subframe, cfg.n_id_cell)
        self.scr_seq = gold_sequence(cinit, ul.G)
        self._step = jax.jit(self._trial_step)

    def _trial_step(self, keys, n0, wiener):
        cfg = self.cfg
        codec = self.codec
        B = keys.shape[0]
        Qm = self.ulsch.Qm

        splits = jax.vmap(
            lambda k: jax.random.split(k, 1 + 2 * cfg.n_harq_rounds))(keys)
        tb = jax.vmap(lambda k: jax.random.bernoulli(
            k, 0.5, (self.ulsch.tbs,)))(splits[:, 0]).astype(jnp.int32)
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
            grid = pusch_fill_grid(sym.astype(jnp.complex64), self.pm,
                                   self.dmrs)
            taps = self.chan.draw_taps(splits[:, 1 + 2 * rnd], B)
            H = self.chan.freq_response_at(taps, self.f_idx)   # [B, M]
            grid = apply_channel_bins(grid, H, self.pm.sc_bins, self.fp.n_fft)
            t = ofdm.ofdm_modulate(grid, self.fp)
            nr = jax.vmap(lambda k: jax.random.normal(
                k, t.shape[1:] + (2,)))(splits[:, 2 + 2 * rnd])
            rx = t + jnp.sqrt(n0 / 2) * (nr[..., 0] + 1j * nr[..., 1])
            rgrid = ofdm.ofdm_demodulate(rx, self.fp)
            y, dmrs_rx = pusch_extract(rgrid, self.pm)         # [B,C,M],[B,2,M]
            if cfg.perfect_ce:
                H_data = jnp.broadcast_to(H[:, None, :], y.shape)
            else:
                H_data = ul_estimate_channel(dmrs_rx, self.dmrs, self.pm,
                                             wiener)
            xf, n0_eff = scfdma_mmse_equalize(y, H_data, n0)
            x_time = transform_deprecode(xf)                   # despread
            llr = demap_llr(x_time, n0_eff, Qm)                # [B,C,M,Qm]
            llr = self._deinterleave_llr(llr)
            llr = unscramble_llrs(llr, self.scr_seq)
            _, ok, w_soft = codec.decode(llr, w_soft=w_soft, rv=rv)
            ok_now = ok_any | ok
            err_r = reached & ~ok_now
            errs.append(err_r.sum())
            reach_counts.append(reached.sum())
            reached = err_r
            ok_any = ok_now
        return jnp.stack(errs), jnp.stack(reach_counts)

    def _deinterleave_llr(self, llr):
        """llr [B, C, M, Qm] -> serial bit order [B, G] undoing the channel
        interleaver (scfdma.PuschMap.interleave operates on symbols)."""
        B, C, M, Qm = llr.shape
        flat = llr.reshape(B, C * M, Qm)
        inv = np.empty_like(self.pm.interleave)
        inv[self.pm.interleave] = np.arange(len(self.pm.interleave),
                                            dtype=np.int32)
        return flat[:, jnp.asarray(inv)].reshape(B, -1)

    def run_snr(self, snr_db: float, n_frames: int, seed: int = 0):
        n0 = jnp.float32(10.0 ** (-snr_db / 10.0))
        wiener = jnp.asarray(make_ul_wiener(self.pm, 10.0 ** (-snr_db / 10.0)))
        R = self.cfg.n_harq_rounds
        errs = np.zeros(R, np.int64)
        reach = np.zeros(R, np.int64)
        for i in range(-(-n_frames // self.cfg.batch)):
            keys = jnp.asarray(host_keys(seed, self.cfg.batch, stream=i))
            e, t = self._step(keys, n0, wiener)
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
