"""X2 handover: MeasurementReport -> HO preparation -> mobilityControlInfo
-> contention-free RA at the target -> ReconfigurationComplete -> S1-U
path switch, plus the oaisim moving-UE scenario with data continuity.

Reference parity: rrc_eNB.c:1760-1990 (rrc_eNB_process_MeasurementReport
-> HandoverPreparationInformation -> RRCConnectionReconfiguration w/
mobilityControlInfo), ra_procedures.c contention-free branch, openair-cn
PathSwitchRequest handling.
"""
import numpy as np

from openair4g_tpu.rrc.enb import RrcEnb, UeState
from openair4g_tpu.rrc.ue import RrcUe, RrcState
from openair4g_tpu.rrc.messages import MeasurementReport
from openair4g_tpu.rrc.handover import execute_handover
from openair4g_tpu.epc import Hss, Mme, SgwPgw, EnbApp, UeNas
from openair4g_tpu.epc.ue_nas import UeEmmState

from test_epc_attach import _attach, IMSI, K


def test_a3_event_rule():
    assert RrcEnb.a3_event(50, 55, a3_offset_db=3, hysteresis_db=1)
    assert not RrcEnb.a3_event(50, 54, a3_offset_db=3, hysteresis_db=1)
    assert not RrcEnb.a3_event(50, 50, a3_offset_db=3, hysteresis_db=1)


def test_handover_ladder_with_path_switch():
    hss = Hss()
    hss.provision(IMSI, K)
    sgw = SgwPgw()
    mme = Mme(hss, sgw)
    src_app = EnbApp(mme, sgw, enb_id=0x100, addr=0x0A000002)
    tgt_app = EnbApp(mme, sgw, enb_id=0x101, addr=0x0A000003)
    src_rrc, tgt_rrc = RrcEnb(), RrcEnb()
    ue_rrc = RrcUe()
    ue_nas = UeNas(IMSI, K)

    crnti = _attach(mme, src_app, src_rrc, ue_rrc, ue_nas)
    assert ue_nas.state == UeEmmState.REGISTERED
    src_ctx = src_app.by_crnti[crnti]
    old_teid = src_ctx.enb_teid_dl
    bearer = sgw._bearers_by_teid[src_ctx.sgw_teid_ul]
    assert bearer.enb_teid_dl == old_teid

    # user plane flows through the source before HO
    src_app.uplink_user(crnti, b"pre-handover-packet")
    dl = src_app.poll_downlink_user()
    assert dl and dl[0][1] == b"pre-handover-packet"

    report = MeasurementReport(meas_id=1, rsrp_serving=40,
                               neighbour_pci=7, rsrp_neighbour=50)
    res = execute_handover(src_rrc, tgt_rrc, ue_rrc, report,
                           target_pci=7, source_app=src_app,
                           target_app=tgt_app)
    assert res.path_switched
    # RRC: UE lives at the target under the new C-RNTI, source forgot it
    assert ue_rrc.crnti == res.target_crnti
    assert ue_rrc.n_id_cell == 7
    assert ue_rrc.state == RrcState.CONNECTED
    assert tgt_rrc.ues[res.target_crnti].state == UeState.CONNECTED
    assert res.source_crnti not in src_rrc.ues
    # EPC: the SGW's downlink tunnel now points at the TARGET eNB
    assert bearer.enb_addr == 0x0A000003
    assert bearer.enb_teid_dl == \
        tgt_app.by_crnti[res.target_crnti].enb_teid_dl
    assert res.target_crnti in tgt_app.by_crnti
    assert crnti not in src_app.by_crnti

    # user plane continues through the target (data continuity)
    tgt_app.uplink_user(res.target_crnti, b"post-handover-packet")
    dl = tgt_app.poll_downlink_user()
    assert dl and dl[0][0] == res.target_crnti
    assert dl[0][1] == b"post-handover-packet"
    # and the source's queue stays empty
    assert src_app.poll_downlink_user() == []


def test_oaisim_mobility_triggers_rrc_handover():
    """A UE driven across the cell border changes serving cell through the
    RRC ladder (not geometry), and keeps receiving data."""
    from openair4g_tpu.sim.oaisim import Oaisim, OaisimConfig
    cfg = OaisimConfig(n_enb=2, n_ue=1, mobility="static", handover=True,
                       a3_ttt_frames=1, cell_spacing=500.0, seed=3)
    sim = Oaisim(cfg)
    sim.ue_xy[0] = [50.0, 0.0]          # firmly in cell 0
    sim._update_links()
    sim.serving_rrc[:] = np.argmax(sim.p_rx, axis=1)
    sim._update_links()
    assert sim.serving_rrc[0] == 0

    bits_before_ho = None
    # walk the UE toward cell 1 (at x=500) in steps; each frame runs the
    # TTI loop + A3 evaluation
    for x in (50, 150, 250, 330, 420, 480, 480, 480):
        sim.ue_xy[0] = [float(x), 0.0]
        sim._update_links()
        sim.run_frames(1)
        if sim.ho_events and bits_before_ho is None:
            bits_before_ho = int(sim.stats["bits_ok"][0])
    assert sim.ho_events, "no handover executed"
    ev = sim.ho_events[0]
    assert (ev["source"], ev["target"]) == (0, 1)
    assert sim.serving_rrc[0] == 1
    assert sim.rrc_ues[0].n_id_cell == 1
    # data continuity: throughput kept accumulating after the HO
    assert int(sim.stats["bits_ok"][0]) > bits_before_ho > 0
    # the serving the scheduler uses follows RRC, not geometry argmax
    assert sim.serving[0] == 1
