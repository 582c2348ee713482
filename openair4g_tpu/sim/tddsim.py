"""TDD frame simulator: per-TTI procedures driven by the UL/DL
configuration masks, with a special subframe (DwPTS / GP / UpPTS).

Reference parity: openair1/SCHED/phy_procedures_lte_common.c (the
subframe_select / direction masks gating phy_procedures_eNB_TX vs RX per
TTI in TDD), 36.211 §4.2 frame structure type 2 via phy/tdd.py, and the
special-subframe budget (DwPTS carries the control region, UpPTS carries
SRS — srs_modulation.c UpPTS handling).

One radio frame at a time: DL subframes run the full eNB-TX -> channel ->
UE-RX chain (sched/enb_tx + sched/ue_rx), UL subframes the UE-TX ->
eNB-RX chain (sched/ue_tx + sched/enb_rx), the special subframe transmits
only its DwPTS symbols downlink and an UpPTS SRS uplink. The direction
mask is authoritative: nothing is transmitted against it.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..phy.tdd import (TDD_PATTERNS, SPECIAL_SUBFRAME, direction_mask,
                       special_symbols)
from ..phy import ofdm
from ..phy.srs import SrsConfig, srs_bins, srs_sequence, srs_estimate
from ..phy.channel_est import make_wiener_stack
from ..sched.enb_tx import CellConfig, EnbTx
from ..sched.ue_rx import UeRx
from ..sched.ue_tx import UeUlConfig, UeTx
from ..sched.enb_rx import EnbRx
from ..ops.llr import map_symbols
from ..ops.gold import scramble_bits
from ..utils.rng import host_keys


@dataclass(frozen=True)
class TddsimConfig:
    tdd_config: int = 1          # 36.211 Table 4.2-2 (DSUUDDSUUD)
    ssf_config: int = 7          # Table 4.2-1 (DwPTS 10, GP 2, UpPTS 2)
    n_rb: int = 6
    mcs_dl: int = 4
    mcs_ul: int = 10
    n_pdcch: int = 3   # 1.4 MHz needs 3-4 control symbols for its CCEs
    rnti: int = 0x1234
    n_id_cell: int = 0
    batch: int = 8
    n_turbo_iter: int = 6


class TddFrameSim:
    """Runs whole TDD radio frames; per-subframe chains are built lazily
    (one compiled program per (direction, subframe))."""

    def __init__(self, cfg: TddsimConfig):
        self.cfg = cfg
        self.mask = direction_mask(cfg.tdd_config)
        self.pattern = TDD_PATTERNS[cfg.tdd_config]
        self._dl: dict[int, tuple] = {}
        self._ul: dict[int, tuple] = {}
        self.srs = SrsConfig(srs_bw_rb=4, n_rb=cfg.n_rb) \
            if cfg.n_rb >= 6 else None
        # DwPTS symbol budget for the special subframe
        self.dwpts = special_symbols(cfg.ssf_config)["dwpts"]
        self.uppts = special_symbols(cfg.ssf_config)["uppts"]

    # ------------------------------------------------------- lazy chains --
    def _dl_pair(self, sf: int):
        if sf not in self._dl:
            cfg = self.cfg
            cell = CellConfig(n_rb=cfg.n_rb, n_id_cell=cfg.n_id_cell,
                              n_pdcch=cfg.n_pdcch, rnti=cfg.rnti,
                              rb_start=0, n_prb=cfg.n_rb, mcs=cfg.mcs_dl,
                              subframe=sf, tdd=True)
            self._dl[sf] = (EnbTx(cell), UeRx(cell,
                                              n_turbo_iter=cfg.n_turbo_iter))
        return self._dl[sf]

    @staticmethod
    def _valid_pusch_rb(n: int) -> int:
        """Largest PUSCH allocation <= n whose size is 2^a*3^b*5^c RBs
        (36.211 §5.3.3 transform-precoding constraint)."""
        def ok(v):
            for p in (2, 3, 5):
                while v % p == 0:
                    v //= p
            return v == 1
        return next(v for v in range(n, 0, -1) if ok(v))

    def _ul_pair(self, sf: int):
        if sf not in self._ul:
            cfg = self.cfg
            ue = UeTx(UeUlConfig(n_rb=cfg.n_rb, mcs=cfg.mcs_ul,
                                 n_rb_alloc=self._valid_pusch_rb(
                                     max(cfg.n_rb - 2, 1)),
                                 rb_offset=1, rnti=cfg.rnti,
                                 n_id_cell=cfg.n_id_cell, subframe=sf,
                                 n_turbo_iter=cfg.n_turbo_iter))
            self._ul[sf] = (ue, EnbRx(ue))
        return self._ul[sf]

    # ----------------------------------------------------- special (S) sf --
    def _special_dl_waveform(self, enb: EnbTx, B: int):
        """DwPTS: the DL grid truncated to the first `dwpts` symbols (the
        control region + pilots inside DwPTS); GP and UpPTS carry nothing
        downlink."""
        grid = enb.data_subframe(jnp.zeros(
            (B, enb.am.n_data_re), jnp.complex64))
        keep = jnp.arange(grid.shape[1]) < self.dwpts
        return ofdm.ofdm_modulate(grid * keep[None, :, None], enb.fp)

    def _special_ul_waveform(self, fp, B: int):
        """UpPTS: SRS on the last symbol(s) (36.211 §5.5.3.3)."""
        grid = jnp.zeros((B, fp.symbols_per_subframe, fp.n_fft),
                         jnp.complex64)
        if self.srs is None:
            return ofdm.ofdm_modulate(grid, fp)
        seq = jnp.asarray(srs_sequence(self.srs))
        bins = jnp.asarray(srs_bins(self.srs))
        for k in range(self.uppts):
            grid = grid.at[:, fp.symbols_per_subframe - 1 - k, bins].set(seq)
        return ofdm.ofdm_modulate(grid, fp)

    # -------------------------------------------------------------- frame --
    def run_frame(self, snr_db: float, seed: int = 0) -> dict:
        """One radio frame across all 10 subframes. Returns per-direction
        block stats + the per-subframe activity log (for gating asserts)."""
        cfg = self.cfg
        B = cfg.batch
        n0 = float(10.0 ** (-snr_db / 10.0))
        rng = np.random.default_rng(seed)
        log = []
        dl_ok = dl_tot = ul_ok = ul_tot = 0
        srs_snr = None
        # TDD DAI HARQ bookkeeping (36.213 §7.3): the eNB counts DL
        # assignments V_DAI into each TDD DCI; the UE cross-checks its
        # decode count against the received DAI to DETECT missed
        # assignments before bundling its ACKs (the reference's
        # *_TDD_* DCI structs + phy_procedures ACK/NAK bundling).
        from ..phy.pdcch import pack_dci_format1a, unpack_dci_format1a
        v_dai = 0                       # eNB-side assignment counter
        dec_count = np.zeros(B, np.int64)   # UE decodes so far
        dai_miss = np.zeros(B, bool)        # UE detected a missed DCI
        ack_bundle = np.ones(B, bool)       # AND of per-assignment ACKs

        for sf in range(10):
            d = self.pattern[sf]
            keys = jnp.asarray(host_keys(seed, B, stream=sf))
            if d == "D":
                enb, ue = self._dl_pair(sf)
                # eNB: this assignment's DAI rides the TDD format-1A DCI
                v_dai += 1
                enb.set_dci_payload(pack_dci_format1a(
                    cfg.n_rb, rb_start=0, n_prb=cfg.n_rb, mcs=cfg.mcs_dl,
                    harq_pid=sf & 7, ndi=1, rv=0, tdd=True,
                    dai=(v_dai - 1) & 3))
                tb = jnp.asarray(
                    rng.integers(0, 2, (B, ue.codec.cfg.tbs)), jnp.int32)
                e = scramble_bits(ue.codec.encode(tb), ue.scr_seq)
                syms = map_symbols(e, ue.codec.cfg.Qm).astype(jnp.complex64)
                t = enb.data_waveform(syms)
                rx = self._awgn(t, n0, keys)
                out = ue.receive(ofdm.ofdm_demodulate(rx, enb.fp), n0,
                                 jnp.asarray(ue.make_wiener(n0)))
                found = np.asarray(out["dci_found"])
                payload = np.asarray(out["dci_payload"])
                ok = np.asarray(out["tb_ok"]) & found
                # UE DAI check: decoded DAI must equal its own count mod 4
                for i in np.nonzero(found)[0]:
                    dai_rx = unpack_dci_format1a(
                        payload[i], cfg.n_rb, tdd=True)["dai"]
                    if dai_rx != (dec_count[i] & 3):
                        dai_miss[i] = True      # a DCI was missed earlier
                    dec_count[i] += 1
                ack_bundle &= ok
                dl_ok += int(ok.sum())
                dl_tot += B
                log.append((sf, "D", "enb_tx+ue_rx"))
            elif d == "U":
                ue, enb = self._ul_pair(sf)
                tb = jnp.asarray(
                    rng.integers(0, 2, (B, ue.codec.cfg.tbs)), jnp.int32)
                t = ue.pusch_subframe(tb)
                rx = self._awgn(t, n0, keys)
                _, ok, _ = enb.receive_pusch(rx, n0)
                ul_ok += int(np.asarray(ok).sum())
                ul_tot += B
                log.append((sf, "U", "ue_tx+enb_rx"))
            else:                       # special subframe
                enb, _ = self._dl_pair(0 if self.mask[0] == 0 else sf)
                t_dl = self._special_dl_waveform(enb, B)
                # GP must be silent: check the tail symbols carry no energy
                grid_chk = ofdm.ofdm_demodulate(t_dl, enb.fp)
                gp_energy = float(jnp.mean(jnp.abs(
                    grid_chk[:, self.dwpts:-self.uppts or None]) ** 2))
                assert gp_energy < 1e-9, gp_energy
                ue_ul, _ = self._ul_pair(2)     # any UL config for fp
                t_ul = self._special_ul_waveform(ue_ul.fp, B)
                rx = self._awgn(t_ul, n0, keys)
                if self.srs is not None:
                    rgrid = ofdm.ofdm_demodulate(rx, ue_ul.fp)
                    _, snr_wb, _ = srs_estimate(
                        rgrid[:, ue_ul.fp.symbols_per_subframe - 1],
                        self.srs)
                    srs_snr = float(np.asarray(snr_wb).mean())
                log.append((sf, "S", f"dwpts{self.dwpts}+uppts{self.uppts}"))
        # a trial that decoded fewer assignments than the eNB sent has
        # missed at least the LAST one too (no later DAI to expose it):
        # bundled ACK is withheld (DTX) exactly as 36.213 §7.3 intends
        dai_miss |= dec_count < v_dai
        return dict(dl_ok=dl_ok, dl_tot=dl_tot, ul_ok=ul_ok, ul_tot=ul_tot,
                    srs=srs_snr, log=log,
                    dl_bler=1 - dl_ok / max(dl_tot, 1),
                    ul_bler=1 - ul_ok / max(ul_tot, 1),
                    n_dl_assignments=v_dai,
                    dai_miss=dai_miss.copy(),
                    ack_bundle=(ack_bundle & ~dai_miss).copy())

    @staticmethod
    def _awgn(t, n0, keys):
        nr = jax.vmap(lambda k: jax.random.normal(
            k, t.shape[1:] + (2,)))(keys)
        return t + jnp.sqrt(n0 / 2) * (nr[..., 0] + 1j * nr[..., 1])
