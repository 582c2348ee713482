"""PUSCH link-level BLER simulator (the reference's ulsim).

Reference parity: openair1/SIMULATION/LTE_PHY/ulsim.c:163 — UE TX
(ulsch_encoding with UCI multiplexing -> scrambling -> SC-FDMA modulation
with transform precoding + DMRS) -> multipath/AWGN channel -> eNB RX
(channel estimation, MMSE frequency equalization, despread, LLR, control
demultiplex, turbo decode) with HARQ.

TPU-native: one jitted trial step batched over trials; the channel is a
per-subcarrier complex gain (exact under CP); BLER statistics accumulate
per HARQ round exactly like sim/dlsim.py. CQI/RI/ACK riding on PUSCH
(ops/uci.py) are multiplexed via static scatter maps and their round-0
detection errors are accumulated alongside the data BLER, mirroring
ulsim.c's cqi_errors/ack_errors counters.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FrameParms
from ..phy.pdsch import DlschCodec
from ..phy.pusch import (UlschConfig, ul_estimate_channel,
                         make_ul_wiener, scfdma_mmse_equalize)
from ..phy.scfdma import (make_pusch_map, pusch_fill_grid, pusch_fill_grid_x,
                          pusch_extract, transform_deprecode)
from ..phy.ulref import pusch_dmrs
from ..phy import ofdm
from ..ops.gold import gold_sequence, pusch_cinit, scramble_bits, unscramble_llrs
from ..ops.llr import map_symbols, demap_llr
from ..ops.segmentation import segment_tb
from ..ops.uci import (UciConfig, make_uci_maps, uci_multiplex,
                       uci_demultiplex, cqi_encode_device, cqi_decode,
                       uci1_symbols, uci2_symbols, uci1_decode, uci2_decode)
from ..tables.tbs import get_TBS_UL, get_Qm_ul
from ..utils.rng import host_keys
from .channels import (ChannelModel, apply_channel_bins,
                       apply_channel_time, fir_freq_response)


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
    uci: UciConfig = field(default_factory=UciConfig)
    # PUSCH frequency hopping (36.211 §5.3.4; VERDICT r3 item 10): the
    # DCI-0 hopping-bit value, or None = hopping off. The all-ones value
    # selects type 2 (pseudo-random sub-band hopping, n_sb/n_rb_ho from
    # SIB2 pusch-Config); others are type-1 explicit offsets.
    hopping_bits: int | None = None
    n_sb: int = 1
    n_rb_ho: int = 0
    time_domain_channel: bool = False   # convolve the SC-FDMA sample
    #   stream with the band-limited tap FIR (the reference's
    #   multipath_channel path ulsim.c:1202) instead of the
    #   per-subcarrier multiply; carries real ISI beyond the CP.
    #   Estimated-CE only (the estimator sees the same DMRS either way).


class Ulsim:
    """Uplink link simulator with HARQ; mirrors sim/dlsim.DlsimFading."""

    def __init__(self, cfg: UlsimConfig):
        self.cfg = cfg
        self.fp = FrameParms(n_rb=cfg.n_rb, n_id_cell=cfg.n_id_cell)
        rb2 = None
        if cfg.hopping_bits is not None:
            from ..phy.hopping import pusch_hopped_rb_start
            rb2 = pusch_hopped_rb_start(
                cfg.rb_offset, cfg.n_rb_alloc, cfg.n_rb, 1,
                cfg.hopping_bits, cfg.n_id_cell, cfg.n_sb, cfg.n_rb_ho)
        self.pm = make_pusch_map(cfg.n_rb, cfg.n_rb_alloc, cfg.rb_offset,
                                 rb_offset2=rb2)
        Qm = get_Qm_ul(cfg.mcs)
        C = len(self.pm.data_syms)

        self.uci_maps = None
        g_override = None
        if cfg.uci.any:
            tbs = get_TBS_UL(cfg.mcs, cfg.n_rb_alloc)
            sum_kr = sum(segment_tb(tbs + 24).block_sizes)
            u = cfg.uci
            self.uci_maps = make_uci_maps(
                self.pm.m_sc, C, Qm, sum_kr, u.o_cqi, u.o_ri, u.o_ack,
                u.beta_cqi, u.beta_ri, u.beta_ack, self.fp.normal_cp)
            g_override = self.uci_maps.G_data
        ul = UlschConfig(mcs=cfg.mcs, n_rb_alloc=cfg.n_rb_alloc,
                         n_turbo_iter=cfg.n_turbo_iter,
                         g_override=g_override)
        self.ulsch = ul
        self.codec = DlschCodec(ul)   # 36.212 chain is shared with DL-SCH

        self.dmrs = pusch_dmrs(self.pm.m_sc, u=cfg.dmrs_group,
                               cyclic_shift=cfg.dmrs_cyclic_shift)
        self.chan = ChannelModel(name=cfg.channel, fp=self.fp)
        self.f_idx = tuple(
            (cfg.rb_offset * 12 + np.arange(self.pm.m_sc) - 6 * cfg.n_rb
             ).tolist())
        self.f_idx2 = tuple(
            (self.pm.rb_offset2 * 12 + np.arange(self.pm.m_sc)
             - 6 * cfg.n_rb).tolist())
        cinit = pusch_cinit(cfg.rnti, 2 * cfg.subframe, cfg.n_id_cell)
        # scrambling sequence over the full interleaved grid (row-major
        # [C, M, Qm] = the 36.211 §5.3.1 output order); UCI positions carry
        # the x/y placeholder rules and bypass it.
        full = np.asarray(gold_sequence(cinit, C * self.pm.m_sc * Qm)
                          ).reshape(C * self.pm.m_sc, Qm)
        if self.uci_maps is not None:
            m = self.uci_maps
            self.scr_data = jnp.asarray(full[m.data_pos].reshape(-1))
            self.scr_cqi = jnp.asarray(full[m.cqi_pos].reshape(-1)) \
                if m.qp_cqi else None
        else:
            self.scr_data = jnp.asarray(full.reshape(-1)[:ul.G])
        self._step = jax.jit(self._trial_step)

    # ------------------------------------------------------------------ TX --
    def _tx_symbols(self, e_scrambled, uci_bits):
        """Map data (+UCI) to the [B, C, M] pre-DFT symbol grid."""
        Qm = self.ulsch.Qm
        data_sym = map_symbols(e_scrambled, Qm).astype(jnp.complex64)
        if self.uci_maps is None:
            B = data_sym.shape[0]
            x = data_sym[:, jnp.asarray(self.pm.interleave)]
            return x.reshape(B, len(self.pm.data_syms), self.pm.m_sc)
        m = self.uci_maps
        cqi_sym = ri_sym = ack_sym = None
        if m.qp_cqi:
            q = cqi_encode_device(uci_bits["cqi"], m.Q_cqi)
            q = scramble_bits(q, self.scr_cqi)
            cqi_sym = map_symbols(q, Qm).astype(jnp.complex64)
        if m.qp_ri:
            ri_sym = uci1_symbols(uci_bits["ri"][:, 0], Qm, m.qp_ri)
        if m.qp_ack:
            if self.cfg.uci.o_ack == 1:
                ack_sym = uci1_symbols(uci_bits["ack"][:, 0], Qm, m.qp_ack)
            else:
                ack_sym = uci2_symbols(uci_bits["ack"], Qm, m.qp_ack)
        return uci_multiplex(data_sym, cqi_sym, ri_sym, ack_sym, m)

    # ------------------------------------------------------------------ RX --
    def _rx_llrs(self, x_time, n0_eff):
        """Despread symbols [B, C, M] -> (data llr [B, G], uci streams)."""
        Qm = self.ulsch.Qm
        llr = demap_llr(x_time, n0_eff, Qm)                # [B, C, M, Qm]
        if self.uci_maps is None:
            B = llr.shape[0]
            flat = llr.reshape(B, -1, Qm)
            inv = np.empty_like(self.pm.interleave)
            inv[self.pm.interleave] = np.arange(len(self.pm.interleave),
                                                dtype=np.int32)
            data = flat[:, jnp.asarray(inv)].reshape(B, -1)
            return unscramble_llrs(data, self.scr_data), {}
        streams = uci_demultiplex(llr, self.uci_maps)
        data = unscramble_llrs(streams["data"], self.scr_data)
        return data, streams

    def _uci_errors(self, streams, uci_bits):
        """Round-0 UCI detection error counts [cqi, ri, ack] per batch."""
        m = self.uci_maps
        out = jnp.zeros(3, jnp.int32)
        if m is None:
            return out
        if m.qp_cqi:
            cqi_llr = unscramble_llrs(
                streams["cqi"].reshape(streams["cqi"].shape[0], -1),
                self.scr_cqi)
            bits, ok = cqi_decode(cqi_llr, self.cfg.uci.o_cqi)
            err = jnp.any(bits != uci_bits["cqi"], axis=-1) | ~ok
            out = out.at[0].set(err.sum())
        if m.qp_ri:
            ri_hat = uci1_decode(streams["ri"])
            out = out.at[1].set((ri_hat != uci_bits["ri"][:, 0]).sum())
        if m.qp_ack:
            if self.cfg.uci.o_ack == 1:
                ack_hat = uci1_decode(streams["ack"])[:, None]
            else:
                ack_hat = uci2_decode(streams["ack"])
            out = out.at[2].set(
                jnp.any(ack_hat != uci_bits["ack"], axis=-1).sum())
        return out

    def _trial_step(self, keys, n0, wiener):
        cfg = self.cfg
        codec = self.codec
        B = keys.shape[0]

        splits = jax.vmap(
            lambda k: jax.random.split(k, 2 + 2 * cfg.n_harq_rounds))(keys)
        tb = jax.vmap(lambda k: jax.random.bernoulli(
            k, 0.5, (self.ulsch.tbs,)))(splits[:, 0]).astype(jnp.int32)
        d_flats = codec.encode_to_d(tb)

        uci_bits = {}
        if self.uci_maps is not None:
            uk = jax.vmap(lambda k: jax.random.split(k, 3))(splits[:, 1])
            u = cfg.uci
            if u.o_cqi:
                uci_bits["cqi"] = jax.vmap(lambda k: jax.random.bernoulli(
                    k, 0.5, (u.o_cqi,)))(uk[:, 0]).astype(jnp.int32)
            if u.o_ri:
                uci_bits["ri"] = jax.vmap(lambda k: jax.random.bernoulli(
                    k, 0.5, (1,)))(uk[:, 1]).astype(jnp.int32)
            if u.o_ack:
                uci_bits["ack"] = jax.vmap(lambda k: jax.random.bernoulli(
                    k, 0.5, (u.o_ack,)))(uk[:, 2]).astype(jnp.int32)

        reached = jnp.ones(B, bool)
        ok_any = jnp.zeros(B, bool)
        w_soft = None
        uci_errs = jnp.zeros(3, jnp.int32)
        errs, reach_counts = [], []
        for rnd in range(cfg.n_harq_rounds):
            rv = rnd & 3
            e = codec.select_e(d_flats, rv)
            e = scramble_bits(e, self.scr_data)
            x = self._tx_symbols(e, uci_bits)
            grid = pusch_fill_grid_x(x, self.pm, self.dmrs)
            taps = self.chan.draw_taps(splits[:, 2 + 2 * rnd], B)
            H = self.chan.freq_response_at(taps, self.f_idx)   # [B, M]
            if cfg.time_domain_channel:
                assert not self.pm.hopped and not cfg.perfect_ce, \
                    "time-FIR path: estimated CE, no hopping"
                t = ofdm.ofdm_modulate(grid, self.fp)          # clean wave
                t = apply_channel_time(t, self.chan, taps)
            elif self.pm.hopped:
                # per-slot channel application: slot 1 sits at the
                # hopped PRBs, so it sees the channel there
                H2 = self.chan.freq_response_at(taps, self.f_idx2)
                half = self.fp.symbols_per_subframe // 2
                g0 = apply_channel_bins(grid[:, :half], H,
                                        self.pm.sc_bins, self.fp.n_fft)
                bins2 = np.mod(np.asarray(self.f_idx2), self.fp.n_fft)
                g1 = apply_channel_bins(grid[:, half:], H2,
                                        bins2.astype(np.int32),
                                        self.fp.n_fft)
                grid = jnp.concatenate([g0, g1], axis=1)
                t = ofdm.ofdm_modulate(grid, self.fp)
            else:
                grid = apply_channel_bins(grid, H, self.pm.sc_bins,
                                          self.fp.n_fft)
                t = ofdm.ofdm_modulate(grid, self.fp)
            nr = jax.vmap(lambda k: jax.random.normal(
                k, t.shape[1:] + (2,)))(splits[:, 3 + 2 * rnd])
            rx = t + jnp.sqrt(n0 / 2) * (nr[..., 0] + 1j * nr[..., 1])
            rgrid = ofdm.ofdm_demodulate(rx, self.fp)
            y, dmrs_rx = pusch_extract(rgrid, self.pm)     # [B,C,M],[B,2,M]
            if cfg.perfect_ce:
                if self.pm.hopped:
                    half = self.fp.symbols_per_subframe // 2
                    Hs = [H if l < half else H2 for l in self.pm.data_syms]
                    H_data = jnp.stack(Hs, axis=1)
                else:
                    H_data = jnp.broadcast_to(H[:, None, :], y.shape)
            else:
                H_data = ul_estimate_channel(dmrs_rx, self.dmrs, self.pm,
                                             wiener)
            xf, n0_eff = scfdma_mmse_equalize(y, H_data, n0)
            x_time = transform_deprecode(xf)               # despread
            llr, streams = self._rx_llrs(x_time, n0_eff)
            if rnd == 0:
                uci_errs = self._uci_errors(streams, uci_bits)
            _, ok, w_soft = codec.decode(llr, w_soft=w_soft, rv=rv)
            ok_now = ok_any | ok
            err_r = reached & ~ok_now
            errs.append(err_r.sum())
            reach_counts.append(reached.sum())
            reached = err_r
            ok_any = ok_now
        return jnp.stack(errs), jnp.stack(reach_counts), uci_errs

    def run_snr(self, snr_db: float, n_frames: int, seed: int = 0):
        """Returns (errs[R], reached[R]); round-0 UCI error counts for the
        same trials accumulate in self.uci_errs = [cqi, ri, ack]."""
        n0 = jnp.float32(10.0 ** (-snr_db / 10.0))
        wiener = jnp.asarray(make_ul_wiener(self.pm, 10.0 ** (-snr_db / 10.0)))
        R = self.cfg.n_harq_rounds
        errs = np.zeros(R, np.int64)
        reach = np.zeros(R, np.int64)
        uci = np.zeros(3, np.int64)
        for i in range(-(-n_frames // self.cfg.batch)):
            keys = jnp.asarray(host_keys(seed, self.cfg.batch, stream=i))
            e, t, u = self._step(keys, n0, wiener)
            errs += np.asarray(e, np.int64)
            reach += np.asarray(t, np.int64)
            uci += np.asarray(u, np.int64)
        self.uci_errs = uci
        return errs, reach

    def sweep(self, snrs, n_frames: int, seed: int = 0, verbose: bool = True,
              early_exit: bool = True):
        rows = []
        for s in snrs:
            errs, reach = self.run_snr(float(s), n_frames, seed)
            uci = self.uci_errs
            bler = errs / np.maximum(reach, 1)
            rows.append((float(s), errs.copy(), reach.copy(), bler.copy(),
                         uci.copy()))
            if verbose:
                txt = " ".join(f"r{r}:{bler[r]:.3f}({errs[r]}/{reach[r]})"
                               for r in range(len(bler)))
                if self.cfg.uci.any:
                    txt += (f"  uci[cqi:{uci[0]} ri:{uci[1]} ack:{uci[2]}"
                            f"/{reach[0]}]")
                print(f"SNR {s:+6.2f} dB: {txt}", flush=True)
            if early_exit and errs[-1] == 0:
                break
        return rows
