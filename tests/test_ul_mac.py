"""UE MAC (BSR/PHR/UL-HARQ) + eNB multi-UE UL scheduler.

Reference parity targets: ue_procedures.c BSR/PHR CE byte layouts,
eNB_scheduler_ulsch.c:599 schedule_ulsch (nCCE budget, first_rb guard,
retx-keeps-allocation, rb_table TBS sizing, TPC toward target RX power).
"""
import numpy as np

from openair4g_tpu.mac.ue_mac import (
    BSR_TABLE, bsr_index, pack_short_bsr, unpack_short_bsr,
    pack_long_bsr, unpack_long_bsr, pack_phr, unpack_phr,
    UeUlHarqEntity, UeMac)
from openair4g_tpu.mac.ul_scheduler import (UlScheduler, UlUeState,
                                            RB_TABLE, UlGrant)
from openair4g_tpu.tables.tbs import get_TBS_UL


def test_bsr_table_and_index():
    assert len(BSR_TABLE) == 64 and BSR_TABLE[-1] == 300000
    assert bsr_index(0) == 0
    assert bsr_index(10) == 1
    assert bsr_index(11) == 2          # first entry covering 11 bytes
    assert bsr_index(10 ** 9) == 63


def test_bsr_ce_roundtrip():
    lcg, nb = unpack_short_bsr(pack_short_bsr(2, 150))
    assert lcg == 2 and nb >= 150
    vals = unpack_long_bsr(pack_long_bsr([0, 57, 1000, 299999]))
    assert vals[0] == 0 and vals[1] >= 57 and vals[2] >= 1000
    assert vals[3] >= 299999


def test_phr_ce():
    assert unpack_phr(pack_phr(10.0)) == 10.0
    assert unpack_phr(pack_phr(-40.0)) == -23.0      # clamped
    assert unpack_phr(pack_phr(99.0)) == 40.0


def test_ue_ul_harq_entity():
    h = UeUlHarqEntity()
    g = h.on_grant(0, ndi=1, tb=b"abc")
    assert g["new"] and g["rv"] == 0
    g = h.on_grant(0, ndi=1, tb=None)                # same ndi -> retx
    assert not g["new"] and g["rv"] == 2 and g["tb"] == b"abc"
    g = h.on_grant(0, ndi=1, tb=None)
    assert g["rv"] == 3
    h.on_ack(0)
    g = h.on_grant(0, ndi=1, tb=b"next")             # inactive -> new
    assert g["new"] and g["tb"] == b"next"
    g = h.on_grant(0, ndi=0, tb=b"toggled")          # ndi toggle -> new
    assert g["new"]


def test_ue_mac_bsr_phr_timers():
    m = UeMac(periodic_bsr_sf=5, periodic_phr_sf=10, prohibit_phr_sf=10)
    m.offer_data(0, 500)
    for _ in range(5):
        m.tick()
    ces = m.pending_ces()
    assert any(lcid == 0x1D for lcid, _ in ces)      # short BSR
    m.offer_data(2, 80)
    for _ in range(5):
        m.tick()
    ces = m.pending_ces()
    assert any(lcid == 0x1E for lcid, _ in ces)      # long BSR (2 LCGs)
    for _ in range(10):
        m.tick()
    ces = m.pending_ces(pusch_power_db=13.0)
    phr = [ce for lcid, ce in ces if lcid == 0x1A]
    assert phr and unpack_phr(phr[0]) == 10.0        # 23 - 13


def test_multi_ue_schedule_ulsch_scenario():
    """4 UEs, mixed arrivals, 30% PUSCH CRC failure: the scheduler must
    respect the CCE budget and PRB bounds, keep retx allocations, and
    drain every buffer."""
    rng = np.random.default_rng(0)
    n_rb, n_cce = 25, 8
    sch = UlScheduler(n_rb_ul=n_rb, n_cce_max=n_cce, dci_L=1)
    ues = [UlUeState(rnti=0x100 + u, mcs=10) for u in range(4)]
    ue_macs = [UeMac(periodic_bsr_sf=1) for _ in range(4)]
    harqs = [UeUlHarqEntity() for _ in range(4)]
    served = np.zeros(4)

    for tti in range(400):
        # traffic: bursty arrivals on LCG0/LCG2
        for u in range(4):
            if rng.random() < 0.05:
                ue_macs[u].offer_data(rng.choice([0, 2]), int(rng.integers(50, 1200)))
            ue_macs[u].tick()
        # UEs report BSR; eNB decodes the CE bytes into its UL state
        for u in range(4):
            for lcid, ce in ue_macs[u].pending_ces():
                if lcid == 0x1D:
                    _, nb = unpack_short_bsr(ce)
                    ues[u].buffer_bytes = nb
                elif lcid == 0x1E:
                    ues[u].buffer_bytes = sum(unpack_long_bsr(ce))
        grants = sch.schedule(ues, n_cce_used=2, msg3_active=(tti % 10 == 0), pid=tti % 8)
        # budget + geometry invariants
        assert len(grants) * 2 <= 2 * (n_cce - 2) + 2  # agg=2 CCEs each
        total_cce = sum(1 << g.L for g in grants)
        assert total_cce <= n_cce - 2
        spans = sorted((g.first_rb, g.first_rb + g.n_prb) for g in grants)
        lo = 2 if tti % 10 == 0 else 1
        for (a, b), nxt in zip(spans, spans[1:] + [(n_rb, n_rb)]):
            assert a >= lo and b <= nxt[0] and b <= n_rb
        # UEs transmit; eNB decodes with 30% failure
        for g in grants:
            u = g.rnti - 0x100
            pid = tti % 8
            tx = harqs[u].on_grant(pid, g.ndi, b"x" * 16)
            if g.rv == 0:
                assert tx["new"], (tti, g)
            crc_ok = rng.random() > 0.3
            before = ues[u].retx_round
            sch.on_pusch_result(ues[u], g, crc_ok)
            if crc_ok:
                harqs[u].on_ack(pid)
                if g.rv == 0:
                    tbs_bytes = get_TBS_UL(g.mcs, g.n_prb) // 8
                    ue_macs[u].consume(tbs_bytes)
                    served[u] += tbs_bytes
                assert ues[u].retx_round == 0
            else:
                assert ues[u].retx_round in (before + 1, 0)
        # retx grants keep their size
        for g in grants:
            u = g.rnti - 0x100
            if ues[u].retx_round > 0:
                assert ues[u].retx_n_prb == g.n_prb

    assert all(s > 0 for s in served), served
    # with BSR flowing, buffers must be near-drained at the end
    for u in range(4):
        assert ue_macs[u].total_buffer() < 6000, (u, ue_macs[u].buffers)


def test_rb_table_sizing_covers_buffer():
    sch = UlScheduler(n_rb_ul=50, n_cce_max=8)
    ue = UlUeState(rnti=1, mcs=10, buffer_bytes=3000)
    g = sch.schedule([ue])[0]
    assert get_TBS_UL(10, g.n_prb) // 8 >= 3000 or g.n_prb >= 45
    assert g.n_prb in RB_TABLE


def test_tpc_pulls_toward_target():
    sch = UlScheduler(n_rb_ul=25, n_cce_max=8, target_rx_power_db=-90.0)
    hot = UlUeState(rnti=1, buffer_bytes=100, rx_power_db=-80.0)
    cold = UlUeState(rnti=2, buffer_bytes=100, rx_power_db=-100.0)
    g = {x.rnti: x for x in sch.schedule([hot, cold])}
    assert g[1].tpc == 0 and g[2].tpc == 2


def test_oaisim_ul_scenario_multi_ue():
    """oaisim with >=4 UEs and mixed DL/UL traffic: the UL MAC pass (BSR
    -> schedule_ulsch -> HARQ) must serve every UE."""
    from openair4g_tpu.sim.oaisim import Oaisim, OaisimConfig
    sim = Oaisim(OaisimConfig(n_enb=2, n_ue=6, ul_traffic=True,
                              n_harq_rounds=2, traffic="onoff", seed=1))
    out = sim.run_frames(30)
    assert (out["ul_tb_ok"] > 0).sum() == 6, out["ul_tb_ok"]
    assert out["ul_throughput_mbps"] > 0.5
