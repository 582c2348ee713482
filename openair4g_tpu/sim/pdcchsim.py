"""pdcchsim equivalent: PCFICH + PDCCH (DCI) error-rate Monte-Carlo.

Reference parity: openair1/SIMULATION/LTE_PHY/pdcchsim.c — eNB control
region TX (PCFICH + DCIs) -> AWGN -> UE rx_pdcch (channel est, LLR,
CFI decode, blind DCI search over aggregation levels), error rate vs SNR.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FrameParms
from ..utils.rng import host_keys
from ..phy import ofdm
from ..phy.resource_grid import make_grid_map, fill_grid
from ..phy.channel_est import make_wiener_stack, estimate_channel
from ..phy.control_region import make_control_region_map
from ..phy.pdcch import (cfi_encode, cfi_decode, pack_dci_format1a,
                         unpack_dci_format1a, dci_format1a_size, dci_encode,
                         pdcch_scramble_seq, search_space_candidates,
                         dci_blind_decode, DciCandidate, BITS_PER_CCE)
from ..ops.gold import gold_sequence
from ..ops.llr import demap_llr


@dataclass(frozen=True)
class PdcchsimConfig:
    n_rb: int = 25
    n_pdcch: int = 3
    n_id_cell: int = 0
    subframe: int = 7
    rnti: int = 0x1234
    L: int = 4                # aggregation level of the test DCI
    cce_offset: int = 0
    batch: int = 64


class Pdcchsim:
    def __init__(self, cfg: PdcchsimConfig):
        self.cfg = cfg
        self.fp = FrameParms(n_rb=cfg.n_rb, n_id_cell=cfg.n_id_cell)
        self.crm = make_control_region_map(cfg.n_rb, cfg.n_pdcch,
                                           cfg.n_id_cell)
        self.gm = make_grid_map(cfg.n_rb, cfg.n_pdcch, cfg.n_id_cell,
                                cfg.subframe)
        ns = 2 * cfg.subframe

        # --- PCFICH bits -> QPSK (36.211 §6.7.1) ---
        cinit = ((ns // 2 + 1) * (2 * cfg.n_id_cell + 1) << 9) + cfg.n_id_cell
        b = cfi_encode(cfg.n_pdcch) ^ gold_sequence(cinit, 32).astype(np.int8)
        self.pcfich_syms = (((1 - 2 * b[0::2]) + 1j * (1 - 2 * b[1::2]))
                            / np.sqrt(2)).astype(np.complex64)

        # --- DCI: format 1A payload, encode at L, scramble, QPSK ---
        A = dci_format1a_size(cfg.n_rb)
        self.dci_payload = pack_dci_format1a(
            cfg.n_rb, rb_start=2, n_prb=min(8, cfg.n_rb - 2), mcs=13,
            harq_pid=1, ndi=1, rv=0)
        assert len(self.dci_payload) == A
        e = dci_encode(self.dci_payload, cfg.rnti, cfg.L)
        n_cce = self.crm.n_cce
        self.scr = pdcch_scramble_seq(cfg.n_id_cell, ns,
                                      n_cce * BITS_PER_CCE)
        full = np.zeros(n_cce * BITS_PER_CCE, np.int8)
        s = cfg.cce_offset * BITS_PER_CCE
        full[s:s + len(e)] = e ^ self.scr[s:s + len(e)]
        syms = ((1 - 2 * full[0::2]) + 1j * (1 - 2 * full[1::2])) / np.sqrt(2)
        # unused CCEs transmit nothing (NIL -> zero power)
        used = np.zeros(n_cce * BITS_PER_CCE // 2, bool)
        used[s // 2:(s + len(e)) // 2] = True
        self.pdcch_syms = np.where(used, syms, 0).astype(np.complex64)
        self.candidates = search_space_candidates(n_cce)
        self._jit = jax.jit(self._trial_step)

    def _trial_step(self, keys, n0, wiener):
        cfg, fp, crm = self.cfg, self.fp, self.crm
        B = keys.shape[0]
        grid = fill_grid(jnp.zeros((B, self.gm.n_data_re), jnp.complex64),
                         self.gm, with_pilots=True)
        grid = grid.at[:, jnp.asarray(crm.pcfich_sym),
                       jnp.asarray(crm.pcfich_bin)].set(
            jnp.asarray(self.pcfich_syms))
        grid = grid.at[:, jnp.asarray(crm.pdcch_sym),
                       jnp.asarray(crm.pdcch_bin)].set(
            jnp.asarray(self.pdcch_syms))
        t = ofdm.ofdm_modulate(grid, fp)
        noise = jax.vmap(lambda k: jax.random.normal(
            k, (t.shape[1], 2)) * jnp.sqrt(n0 / 2))(keys)
        r = t + noise[..., 0] + 1j * noise[..., 1]
        rgrid = ofdm.ofdm_demodulate(r, fp)
        H = estimate_channel(rgrid, self.gm, wiener, time_avg=True)

        def eq_llr(sym_idx, bin_idx, sc_idx):
            y = rgrid[:, jnp.asarray(sym_idx), jnp.asarray(bin_idx)]
            h = H[:, jnp.asarray(sym_idx), jnp.asarray(sc_idx)]
            yeq = y * jnp.conj(h) / (jnp.abs(h) ** 2 + n0)
            llr2 = demap_llr(yeq, n0 / (jnp.abs(h) ** 2 + 1e-9), 2)
            return llr2.reshape(B, -1)

        # CFI
        llr_cfi = eq_llr(crm.pcfich_sym, crm.pcfich_bin, crm.pcfich_sc)
        cinit = (((2 * cfg.subframe) // 2 + 1) * (2 * cfg.n_id_cell + 1)
                 << 9) + cfg.n_id_cell
        sgn = jnp.asarray(
            1.0 - 2.0 * gold_sequence(cinit, 32).astype(np.float32))
        cfi_hat, _ = cfi_decode(llr_cfi * sgn)

        # DCI blind search
        llr_pdcch = eq_llr(crm.pdcch_sym, crm.pdcch_bin, crm.pdcch_sc)
        sgn_p = jnp.asarray(1.0 - 2.0 * self.scr.astype(np.float32))
        found, payload, cand_idx = dci_blind_decode(
            llr_pdcch * sgn_p, len(self.dci_payload), cfg.rnti,
            self.candidates)
        pay_true = jnp.asarray(self.dci_payload.astype(np.int32))
        dci_ok = found & jnp.all(payload == pay_true, axis=-1)
        return (cfi_hat == cfg.n_pdcch), dci_ok

    def run_snr(self, snr_db: float, n_batches: int = 2, seed: int = 0):
        n0 = jnp.float32(10.0 ** (-snr_db / 10.0))
        wiener = jnp.asarray(make_wiener_stack(self.gm, float(n0) / 4.0))
        cfi_ok = dci_ok = tot = 0
        for i in range(n_batches):
            keys = jnp.asarray(host_keys(seed, self.cfg.batch, stream=i))
            c, d = self._jit(keys, n0, wiener)
            cfi_ok += int(np.sum(np.asarray(c)))
            dci_ok += int(np.sum(np.asarray(d)))
            tot += self.cfg.batch
        return dict(snr_db=snr_db, cfi_err=1 - cfi_ok / tot,
                    dci_err=1 - dci_ok / tot, trials=tot)


def main():
    import argparse
    p = argparse.ArgumentParser(description="PCFICH/PDCCH error-rate sweep")
    p.add_argument("-B", "--n-rb", type=int, default=25)
    p.add_argument("-L", "--agg", type=int, default=4)
    p.add_argument("-s", "--snr0", type=float, default=-8.0)
    p.add_argument("-S", "--snr1", type=float, default=0.0)
    p.add_argument("--step", type=float, default=2.0)
    p.add_argument("-n", "--batches", type=int, default=2)
    a = p.parse_args()
    sim = Pdcchsim(PdcchsimConfig(n_rb=a.n_rb, L=a.agg))
    for snr in np.arange(a.snr0, a.snr1 + 1e-9, a.step):
        r = sim.run_snr(float(snr), n_batches=a.batches)
        print(f"SNR {snr:6.1f} dB  CFI err {r['cfi_err']:.4f}  "
              f"DCI err {r['dci_err']:.4f} ({r['trials']} trials)")


if __name__ == "__main__":
    main()
