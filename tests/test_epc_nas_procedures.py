"""NAS procedure breadth (VERDICT r3 item 8): UE/network-initiated
detach, idle -> service request, tracking area update (+ folded GUTI
reallocation), identification, EMM information.

Reference parity: openair-cn/NAS/MME/EMM/{Attach,Detach,Identification,
TrackingAreaUpdate}.c, emm SAP ladders; ECM-IDLE semantics from MME_APP
(context survives an S1 release with cause 'idle', SGW gets Release
Access Bearers).
"""
import pytest

from openair4g_tpu.rrc.enb import RrcEnb
from openair4g_tpu.rrc.ue import RrcUe
from openair4g_tpu.epc import Hss, Mme, SgwPgw, EnbApp, UeNas
from openair4g_tpu.epc.mme import EmmState
from openair4g_tpu.epc.ue_nas import UeEmmState

from test_epc_attach import _attach, IMSI, K


def _setup():
    hss = Hss(); hss.provision(IMSI, K)
    sgw = SgwPgw(); mme = Mme(hss, sgw)
    enb_app = EnbApp(mme, sgw)
    rrc_enb = RrcEnb(); rrc_ue = RrcUe(); ue_nas = UeNas(IMSI, K)
    crnti = _attach(mme, enb_app, rrc_enb, rrc_ue, ue_nas)
    return hss, sgw, mme, enb_app, rrc_enb, rrc_ue, ue_nas, crnti


def _drain(enb_app, ue_nas, crnti, rounds: int = 4):
    for _ in range(rounds):
        for nas_dl in enb_app.poll_nas(crnti):
            nas_ul = ue_nas.handle_downlink(nas_dl)
            if nas_ul is not None:
                enb_app.uplink_nas(crnti, nas_ul)


def test_ue_initiated_detach():
    hss, sgw, mme, enb_app, rrc_enb, rrc_ue, ue_nas, crnti = _setup()
    mme_ue_id = enb_app.by_crnti[crnti].mme_ue_id
    teid = enb_app.by_crnti[crnti].sgw_teid_ul
    enb_app.uplink_nas(crnti, ue_nas.detach_request())
    assert ue_nas.state == UeEmmState.DETACHING
    _drain(enb_app, ue_nas, crnti)   # DetachAccept from the parting buffer
    assert ue_nas.state == UeEmmState.DEREGISTERED
    assert ue_nas.ip == 0 and ue_nas.guti == 0
    assert mme_ue_id not in mme.ues                 # context gone
    assert crnti not in enb_app.by_crnti            # S1 released
    assert teid not in sgw._bearers_by_teid         # session deleted


def test_ue_detach_switch_off():
    """Switch-off detach: no DetachAccept expected, local deregistration."""
    hss, sgw, mme, enb_app, rrc_enb, rrc_ue, ue_nas, crnti = _setup()
    mme_ue_id = enb_app.by_crnti[crnti].mme_ue_id
    enb_app.uplink_nas(crnti, ue_nas.detach_request(switch_off=True))
    assert ue_nas.state == UeEmmState.DEREGISTERED
    assert mme_ue_id not in mme.ues
    assert crnti not in enb_app.by_crnti


def test_network_initiated_detach():
    hss, sgw, mme, enb_app, rrc_enb, rrc_ue, ue_nas, crnti = _setup()
    mme_ue_id = enb_app.by_crnti[crnti].mme_ue_id
    enb_app._dispatch(mme.detach(mme_ue_id))
    # UE answers DetachAccept; the MME releases the context on receipt
    _drain(enb_app, ue_nas, crnti)
    assert ue_nas.state == UeEmmState.DEREGISTERED
    assert mme_ue_id not in mme.ues


def test_idle_then_service_request():
    """UE -> ECM-IDLE (context kept) -> ServiceRequest re-establishes the
    S1 context and the same bearer/IP."""
    hss, sgw, mme, enb_app, rrc_enb, rrc_ue, ue_nas, crnti = _setup()
    mme_ue_id = enb_app.by_crnti[crnti].mme_ue_id
    ip_before = ue_nas.ip
    teid = enb_app.by_crnti[crnti].sgw_teid_ul
    # go idle with cause 'idle': EMM context + session survive
    enb_app._dispatch([mme.release(mme_ue_id, cause="idle")])
    assert crnti not in enb_app.by_crnti
    ctx = mme.ues[mme_ue_id]
    assert ctx.state == EmmState.REGISTERED and ctx.ecm_idle
    assert sgw._bearers_by_teid[teid].enb_teid_dl == 0   # DL endpoint gone
    # new RRC connection + ServiceRequest as initial NAS (S-TMSI attached)
    crnti2 = crnti + 1
    enb_app.initial_ue_message(crnti2, ue_nas.service_request(),
                               s_tmsi=ue_nas.guti)
    assert ue_nas.state == UeEmmState.REGISTERED
    ctx = mme.ues[mme_ue_id]
    assert not ctx.ecm_idle
    s1 = enb_app.by_crnti[crnti2]
    assert s1.sgw_teid_ul == teid                   # same session
    b = sgw._bearers_by_teid[teid]
    assert b.enb_teid_dl == s1.enb_teid_dl          # DL path re-plumbed
    assert b.ue_ipv4 == ip_before                   # same IP


def test_tracking_area_update():
    """Connected-mode TAU: TA recorded, GUTI reallocated, UE completes."""
    hss, sgw, mme, enb_app, rrc_enb, rrc_ue, ue_nas, crnti = _setup()
    mme_ue_id = enb_app.by_crnti[crnti].mme_ue_id
    old_guti = ue_nas.guti
    enb_app.uplink_nas(crnti, ue_nas.tau_request(tac=7))
    _drain(enb_app, ue_nas, crnti)
    ctx = mme.ues[mme_ue_id]
    assert ctx.tac == 7
    assert ue_nas.tac == 7
    assert ue_nas.guti != old_guti and ue_nas.guti == ctx.guti
    assert ue_nas.tau_count == 1
    assert ctx.state == EmmState.REGISTERED


def test_idle_tau_via_initial_ue_message():
    """Periodic TAU from idle: rides InitialUEMessage with the S-TMSI."""
    hss, sgw, mme, enb_app, rrc_enb, rrc_ue, ue_nas, crnti = _setup()
    mme_ue_id = enb_app.by_crnti[crnti].mme_ue_id
    enb_app._dispatch([mme.release(mme_ue_id, cause="idle")])
    crnti2 = crnti + 1
    enb_app.initial_ue_message(crnti2, ue_nas.tau_request(periodic=True),
                               s_tmsi=ue_nas.guti)
    _drain(enb_app, ue_nas, crnti2)
    assert ue_nas.tau_count == 1
    assert not mme.ues[mme_ue_id].ecm_idle


def test_identification_and_emm_information():
    hss, sgw, mme, enb_app, rrc_enb, rrc_ue, ue_nas, crnti = _setup()
    mme_ue_id = enb_app.by_crnti[crnti].mme_ue_id
    enb_app._dispatch([mme.identity_request(mme_ue_id)])
    _drain(enb_app, ue_nas, crnti)      # IdentityResponse verified by MME
    big = bytes(range(256)) * 2         # 512-byte EMM INFORMATION
    enb_app._dispatch([mme.emm_information(mme_ue_id, big)])
    _drain(enb_app, ue_nas, crnti)
    assert ue_nas.network_name == big


def test_stale_dl_pdus_age_out():
    """ADVICE r3: GTP-U PDUs for tunnels no eNB owns must not be
    rescanned forever."""
    hss, sgw, mme, enb_app, rrc_enb, rrc_ue, ue_nas, crnti = _setup()
    sgw.send_downlink(ue_nas.ip, b"to-be-orphaned")
    # drop the eNB context without telling the SGW (RLF-style)
    ctx = enb_app.by_crnti.pop(crnti)
    enb_app.by_enb_ue_id.pop(ctx.enb_ue_id)
    enb_app.by_teid.pop(ctx.enb_teid_dl)
    for _ in range(64):
        assert enb_app.poll_downlink_user() == []
    assert sgw.dl_queue == []           # aged out, not rescanned forever
