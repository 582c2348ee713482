"""Paging: 36.304 occasion math + mobile-terminated attach over the air.

Reference parity: rrc_UE.c:2303,2755 (defaultPagingCycle), the P-RNTI
common-search DCI 1C path (dci.c), openair-cn s1ap paging. The MT test
runs the capstone with an idle UE that monitors ONLY its own paging
occasions, gets paged there, and climbs the whole attach ladder to
REGISTERED + IP echo.
"""
import numpy as np

from openair4g_tpu.rrc.paging import (PagingConfig, ue_paging_id,
                                      paging_frame_offset, paging_subframe,
                                      is_paging_occasion,
                                      next_paging_occasion)


def test_paging_occasion_math():
    # T=64 (idx 1), nB=T -> N=T, Ns=1 -> PO subframe 9
    cfg = PagingConfig(default_paging_cycle=1, paging_nb=2)
    assert cfg.T == 64 and cfg.nB == 64
    uid = ue_paging_id(208950000000001)
    assert uid == 208950000000001 % 1024
    assert paging_subframe(cfg, uid) == 9
    off = paging_frame_offset(cfg, uid)
    assert off == uid % 64
    assert is_paging_occasion(cfg, uid, off, 9)
    assert not is_paging_occasion(cfg, uid, off, 4)
    assert not is_paging_occasion(cfg, uid, off + 1, 9)
    # nB=4T -> Ns=4, PO table {0,4,5,9}
    cfg4 = PagingConfig(default_paging_cycle=0, paging_nb=0)
    assert cfg4.T == 32 and cfg4.nB == 128
    assert paging_subframe(cfg4, uid) in (0, 4, 5, 9)
    # next_paging_occasion lands on an occasion
    t = next_paging_occasion(cfg, uid, 100)
    assert is_paging_occasion(cfg, uid, t // 10, t % 10)
    # distinct UEs spread across frames (nB=T -> N=T partitions)
    offs = {paging_frame_offset(cfg, u) for u in range(64)}
    assert len(offs) == 64


def test_mt_attach_via_paging_over_the_air(tmp_path):
    from openair4g_tpu.sim.capstone import FullStackSim, CapstoneConfig
    sim = FullStackSim(CapstoneConfig(
        mt_attach=True, paging_cycle_idx=0, max_ttis=800, snr_db=12.0),
        artifact_dir=str(tmp_path))
    res = sim.run()
    assert res["paged"], "UE was never paged"
    assert res["registered"] and res["echo_ok"]
    # idle DRX: the UE monitored the P-RNTI only at its own occasions —
    # and the eNB transmitted the page exactly there, so one PO sufficed
    assert 1 <= res["po_monitored"] <= 3

    def first(substr):
        hits = [tti for tti, ev in res["trace"] if substr in ev]
        assert hits, f"missing {substr!r}"
        return hits[0]

    assert first("MME pages") < first("UE paged (MT)")
    assert first("UE paged (MT)") < first("sent PRACH")
    # the page TTI is the UE's 36.304 paging occasion
    t_page = first("eNB transmits Paging")
    pcfg = PagingConfig(default_paging_cycle=0, paging_nb=2)
    uid = ue_paging_id(sim.cfg.imsi)
    assert is_paging_occasion(pcfg, uid, t_page // 10, t_page % 10)
