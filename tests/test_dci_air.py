"""DCI formats over the air + TDD DCI variants (VERDICT r4 missing #1).

Reference parity: dlsim.c:3011-3023 (per-trial blind decode gating
errs[0]) -> dci_decoding_procedure (dci.c:2788, per-TM size hypotheses in
the UE-specific space), and the *_TDD_* DCI structs (dci.h: 4-bit HARQ +
2-bit DAI / UL-index).
"""
import numpy as np
import jax.numpy as jnp
import pytest


# ------------------------------------------------------ TDD DCI codecs --

def test_tdd_dci_roundtrips():
    from openair4g_tpu.phy.pdcch import (pack_dci_format1a,
                                         unpack_dci_format1a,
                                         dci_format1a_size)
    from openair4g_tpu.phy.dci_formats import (
        pack_dci_format0, unpack_dci_format0, dci_format0_size,
        pack_dci_format1, unpack_dci_format1, dci_format1_size,
        pack_dci_format2a, unpack_dci_format2a, dci_format2a_size,
        pack_dci_format2, unpack_dci_format2, dci_format2_size)
    # 1A TDD: 4-bit HARQ + DAI
    b = pack_dci_format1a(50, 3, 10, 15, 9, 1, 2, tdd=True, dai=2)
    assert len(b) == dci_format1a_size(50, tdd=True) \
        == dci_format1a_size(50) + 3
    d = unpack_dci_format1a(b, 50, tdd=True)
    assert d["dai"] == 2 and d["harq_pid"] == 9 and d["rb_start"] == 3
    # 0 TDD: UL index / DAI, padded to the TDD 1A size
    b = pack_dci_format0(50, 5, 8, 12, 1, tdd=True, ul_index=3)
    assert len(b) == dci_format0_size(50, tdd=True) \
        == dci_format1a_size(50, tdd=True)
    d = unpack_dci_format0(b, 50, tdd=True)
    assert d["ul_index"] == 3 and d["is_format0"] and d["n_prb"] == 8
    # 1 / 2A / 2 TDD
    b = pack_dci_format1(50, 0x3FF, 9, 12, 1, 2, tdd=True, dai=1)
    d = unpack_dci_format1(b, 50, tdd=True)
    assert d["dai"] == 1 and d["harq_pid"] == 12
    assert dci_format1_size(50, tdd=True) == dci_format1_size(50) + 3
    b = pack_dci_format2a(50, 0x1FFFF, 11, 1, 17, 1, 0, 18, 0, 1,
                          tdd=True, dai=2)
    d = unpack_dci_format2a(b, 50, tdd=True)
    assert d["dai"] == 2 and d["harq_pid"] == 11 and d["tb_swap"] == 1
    b = pack_dci_format2(50, 0x1FFFF, 11, 0, 17, 1, 0, 18, 0, 1,
                         precoding=2, tdd=True, dai=3)
    d = unpack_dci_format2(b, 50, tdd=True)
    assert d["dai"] == 3 and d["precoding_info"] == 2
    assert dci_format2_size(50, tdd=True) == dci_format2_size(50) + 3


# -------------------------------------- UeRx multi-size blind search --

def test_uerx_multi_size_blind_search():
    """eNB transmits the 1A grant AND a TM-specific format-1 DCI in the
    UE-specific space; the UE's multi-size search finds BOTH."""
    import jax
    from openair4g_tpu.sched.enb_tx import CellConfig, EnbTx
    from openair4g_tpu.sched.ue_rx import UeRx
    from openair4g_tpu.phy.pdcch import ue_search_candidates
    from openair4g_tpu.phy.dci_formats import (pack_dci_format1,
                                               unpack_dci_format1, n_rbg)
    from openair4g_tpu.phy import ofdm

    cell = CellConfig(n_rb=25, n_pdcch=2, mcs=4, dci_L=4,
                      dci_cce_offset=0)
    enb = EnbTx(cell)
    ue = UeRx(cell, n_turbo_iter=4, tm=2)      # TM2 -> format 1 searched
    assert [h[0] for h in ue.size_hyps] == ["1a", "1"]
    # place a format-1 DCI at a UE-specific candidate clear of CCEs 0-3
    cands = ue_search_candidates(enb.crm.n_cce, cell.rnti, cell.subframe)
    c1 = next(c for c in cands if c.cce_offset >= cell.dci_L)
    nbg, _ = n_rbg(cell.n_rb)
    f1 = pack_dci_format1(cell.n_rb, (1 << nbg) - 1, 9, 2, 1, 0)
    enb.set_dcis([(enb.dci_payload, cell.rnti, cell.dci_L, 0),
                  (f1, cell.rnti, c1.L, c1.cce_offset)])
    B = 4
    syms = jnp.zeros((B, enb.am.n_data_re), jnp.complex64)
    rx = enb.data_waveform(syms)               # noiseless
    n0 = 1e-4
    out = ue.receive(ofdm.ofdm_demodulate(rx, enb.fp), n0,
                     jnp.asarray(ue.make_wiener(n0)))
    f1a_found, _ = out["dci"]["1a"]
    f1_found, f1_bits = out["dci"]["1"]
    assert bool(jnp.all(f1a_found)) and bool(jnp.all(f1_found))
    d = unpack_dci_format1(np.asarray(f1_bits[0]), cell.n_rb)
    assert d["mcs"] == 9 and d["harq_pid"] == 2
    assert len(d["rb_list"]) == cell.n_rb


def test_tm_format_map():
    from openair4g_tpu.sched.ue_rx import tm_ue_format
    assert tm_ue_format(3, 25)[0] == "2a"
    assert tm_ue_format(4, 25)[0] == "2"
    assert tm_ue_format(5, 25)[0] == "1d"
    assert tm_ue_format(6, 25)[0] == "1b"
    assert tm_ue_format(2, 25)[0] == "1"


# ------------------------------ TM-specific DCI through dlsim_sm/mimo --

@pytest.mark.parametrize("tm", [3, 4])
def test_dlsim_sm_dci_over_air(tm):
    """A TM3/TM4 BLER point whose format 2A/2 DCI is blind-decoded every
    trial (the VERDICT done-criterion) with parameter extraction."""
    from openair4g_tpu.sim.dlsim_sm import DlsimSm, DlsimSmConfig
    sim = DlsimSm(DlsimSmConfig(tm=tm, mcs=4, batch=16, n_turbo_iter=4))
    errs, trials = sim.run_snr(22.0, 16)
    assert trials == 16 and sim.dci_miss == 0 and errs.sum() == 0
    # param extraction: the air-carried payload decodes to the config
    d = sim._unpack(sim.dci_payload, sim.cfg.n_rb)
    assert d["mcs1"] == sim.cfg.mcs and d["harq_pid"] == 0
    if tm == 4:
        assert d["precoding_info"] == sim.cfg.pmi


def test_dlsim_mimo_dci_over_air():
    from openair4g_tpu.sim.dlsim_mimo import DlsimTxDiv, DlsimTxDivConfig
    from openair4g_tpu.phy.dci_formats import unpack_dci_format1
    sim = DlsimTxDiv(DlsimTxDivConfig(mcs=4, batch=16, n_turbo_iter=4))
    errs, trials = sim.run_snr(16.0, 16)
    assert errs == 0 and sim.dci_miss == 0
    d = unpack_dci_format1(sim.dci_payload, sim.cfg.n_rb)
    assert d["mcs"] == sim.cfg.mcs


def test_dlsim_sm_low_snr_dci_misses_counted():
    """At hopeless SNR the blind decode misses and the misses are
    REPORTED (the dci_err column is real, not wired to zero)."""
    from openair4g_tpu.sim.dlsim_sm import DlsimSm, DlsimSmConfig
    sim = DlsimSm(DlsimSmConfig(tm=3, mcs=4, batch=16, n_turbo_iter=2))
    errs, trials = sim.run_snr(-15.0, 16)
    assert sim.dci_miss > 0
    assert errs[0] == trials        # DCI miss voids the trial


# ---------------------------------------------- TDD DAI through tddsim --

def test_tddsim_dai_bookkeeping():
    """Every DL assignment of a TDD frame carries its V_DAI; at good SNR
    the UE's decode count matches and the bundled ACK goes out."""
    from openair4g_tpu.sim.tddsim import TddFrameSim, TddsimConfig
    sim = TddFrameSim(TddsimConfig(tdd_config=1, n_rb=6, batch=4,
                                   n_turbo_iter=4))
    res = sim.run_frame(snr_db=20.0, seed=1)
    assert res["n_dl_assignments"] == 4          # config 1: DSUUDDSUUD
    assert not res["dai_miss"].any()
    assert res["ack_bundle"].all()
    assert res["dl_bler"] == 0.0


def test_tddsim_dai_detects_missed_assignment():
    """At hopeless SNR DCIs are missed; the DAI cross-check withholds the
    bundled ACK (DTX) instead of false-ACKing (36.213 §7.3)."""
    from openair4g_tpu.sim.tddsim import TddFrameSim, TddsimConfig
    sim = TddFrameSim(TddsimConfig(tdd_config=1, n_rb=6, batch=4,
                                   n_turbo_iter=2))
    res = sim.run_frame(snr_db=-20.0, seed=1)
    assert res["dai_miss"].all()
    assert not res["ack_bundle"].any()
