"""MAC layer: PF scheduler fairness/priority, RAR pack/unpack, RA state
machine (reference: eNB_scheduler.c, pre_processor.c, rar_tools.c,
ra_procedures.c)."""
import numpy as np

from openair4g_tpu.mac import (PfScheduler, UeContext, Rar, pack_rar,
                               unpack_rar, ra_rnti,
                               timing_advance_from_delay, RaProcedure,
                               CQI_TO_MCS)


class TestPfScheduler:
    def test_equal_ues_share_fairly(self):
        sched = PfScheduler(n_rb=50)
        ues = [UeContext(rnti=i, cqi=9) for i in range(4)]
        grants = {i: 0 for i in range(4)}
        for tti in range(200):
            for a in sched.schedule(ues, tti):
                grants[a.rnti] += a.n_prb
        share = np.asarray(list(grants.values()), float)
        share /= share.sum()
        assert (np.abs(share - 0.25) < 0.05).all(), share

    def test_pf_favors_good_channel_but_serves_all(self):
        sched = PfScheduler(n_rb=50, max_ues_per_tti=2)
        ues = [UeContext(rnti=0, cqi=14), UeContext(rnti=1, cqi=4)]
        tb = {0: 0, 1: 0}
        nsched = {0: 0, 1: 0}
        from openair4g_tpu.tables.tbs import get_TBS_DL
        for tti in range(300):
            for a in sched.schedule(ues, tti):
                tb[a.rnti] += get_TBS_DL(a.mcs, a.n_prb)
                nsched[a.rnti] += 1
        assert tb[0] > tb[1]                      # better channel -> more bits
        assert nsched[1] > 50, nsched             # but UE1 is not starved

    def test_retx_has_priority_and_rv_cycles(self):
        sched = PfScheduler(n_rb=25)
        ue = UeContext(rnti=7, cqi=9)
        sched.harq_feedback(ue, ack=False)
        assert ue.pending_retx and ue.retx_rv == 2
        allocs = sched.schedule([ue], 0)
        assert allocs[0].ndi == 0 and allocs[0].rv == 2
        sched.harq_feedback(ue, ack=False)
        assert ue.retx_rv == 3
        sched.harq_feedback(ue, ack=True)
        assert not ue.pending_retx and ue.harq_round == 0

    def test_harq_gives_up_after_max_rounds(self):
        sched = PfScheduler(n_rb=25)
        ue = UeContext(rnti=7)
        for _ in range(4):
            sched.harq_feedback(ue, ack=False)
        assert not ue.pending_retx                # handed to RLC

    def test_cqi_mcs_monotone(self):
        assert all(CQI_TO_MCS[i] <= CQI_TO_MCS[i + 1] for i in range(15))

    def test_no_overallocation(self):
        sched = PfScheduler(n_rb=25, max_ues_per_tti=4)
        ues = [UeContext(rnti=i) for i in range(6)]
        allocs = sched.schedule(ues, 0)
        assert sum(a.n_prb for a in allocs) <= 25
        spans = sorted((a.rb_start, a.rb_start + a.n_prb) for a in allocs)
        for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
            assert e0 <= s1                       # disjoint allocations


class TestRandomAccess:
    def test_rar_roundtrip(self):
        rar = Rar(rapid=23, timing_advance=1337, ul_grant=0xABCDE,
                  t_crnti=0x5F21)
        back = unpack_rar(pack_rar(rar))
        assert back == rar

    def test_ra_rnti(self):
        assert ra_rnti(0) == 1
        assert ra_rnti(9) == 10
        assert ra_rnti(3, f_id=2) == 24

    def test_timing_advance_scaling(self):
        # 32 samples at n_fft=2048 => 2 TA units; scale-invariant in Ts
        assert timing_advance_from_delay(32, 2048) == 2
        assert timing_advance_from_delay(8, 512) == 2

    def test_ra_state_machine(self):
        ra = RaProcedure(preamble=17, max_attempts=2)
        assert ra.send_preamble() == 17
        assert not ra.on_rar(Rar(3, 0, 0, 0x1111))     # wrong RAPID
        assert ra.on_rar(Rar(17, 5, 0, 0x1234))
        assert ra.t_crnti == 0x1234
        assert ra.on_rar_window_expiry() == "ok"
        ra.on_contention_resolution(True)
        assert ra.state == "connected"

        ra2 = RaProcedure(preamble=4, max_attempts=2)
        ra2.send_preamble()
        assert ra2.on_rar_window_expiry() == "retry"
        ra2.send_preamble()
        assert ra2.on_rar_window_expiry() == "failed"
