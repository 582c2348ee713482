"""EPC-lite vertical slice: PRACH-msg RRC connect -> NAS attach with
authentication + security mode -> S1AP InitialContextSetup -> default EPS
bearer in the SGW -> user-plane IP echo through PDCP + GTP-U and back.

Reference parity: the openair-cn attach ladder — s1ap_eNB_nas_procedures.c
(InitialUEMessage / NAS transport), NAS/EURECOM-NAS emm+esm state
machines, MME_APP, SGW-LITE session + GTPV1-U user plane.
"""
import numpy as np

from openair4g_tpu.rrc.enb import RrcEnb, UeState
from openair4g_tpu.rrc.ue import RrcUe
from openair4g_tpu.mac.pdcp import PdcpEntity, PdcpConfig
from openair4g_tpu.epc import (Hss, Mme, SgwPgw, EnbApp, UeNas,
                               gtpu_encap, gtpu_decap)
from openair4g_tpu.epc.mme import EmmState
from openair4g_tpu.epc.ue_nas import UeEmmState

IMSI = 208920100001101
K = bytes(range(16))


def _camp(rrc_enb, rrc_ue):
    """Cell acquisition: MIB + SIB1/SIB2 -> IDLE_READY."""
    from openair4g_tpu.rrc.messages import Mib
    rrc_ue.on_cell_found(0, Mib(bw_index=2))
    rrc_ue.on_bcch(rrc_enb.sib1.pack())
    rrc_ue.on_bcch(rrc_enb.sib2.pack())


def _attach(mme, enb_app, rrc_enb, rrc_ue, ue_nas):
    """Climb the full ladder; returns the UE's C-RNTI."""
    # --- RRC connection (Msg3/Msg4/SetupComplete over CCCH/DCCH) ----------
    _camp(rrc_enb, rrc_ue)
    msg3 = rrc_ue.connection_request()
    crnti, msg4 = rrc_enb.handle_ccch(msg3)
    complete = rrc_ue.on_ccch(crnti, msg4)
    rrc_enb.handle_dcch(crnti, complete)
    assert rrc_enb.ues[crnti].state == UeState.CONNECTED

    # --- NAS attach: piggybacked on SetupComplete in the reference --------
    enb_app.initial_ue_message(crnti, ue_nas.attach_request())
    # authentication + SMC round trips ride DL/UL InformationTransfer
    for _ in range(4):
        for nas_dl in enb_app.poll_nas(crnti):
            nas_ul = ue_nas.handle_downlink(nas_dl)
            if nas_ul is not None:
                enb_app.uplink_nas(crnti, nas_ul)
        if ue_nas.state == UeEmmState.REGISTERED:
            break
    return crnti


def test_attach_and_default_bearer():
    hss = Hss()
    hss.provision(IMSI, K)
    sgw = SgwPgw()
    mme = Mme(hss, sgw)
    enb_app = EnbApp(mme, sgw)
    rrc_enb = RrcEnb()
    rrc_ue = RrcUe()
    ue_nas = UeNas(IMSI, K)

    crnti = _attach(mme, enb_app, rrc_enb, rrc_ue, ue_nas)

    # control-plane end state
    assert ue_nas.state == UeEmmState.REGISTERED
    mme_ctx = next(iter(mme.ues.values()))
    assert mme_ctx.state == EmmState.REGISTERED
    assert mme_ctx.imsi == IMSI
    assert ue_nas.ip != 0 and ue_nas.ebi == 5
    assert ue_nas.guti >> 32 == (4 << 8) | 1        # mme_group/code in GUTI
    # bearer plumbed end to end: eNB knows both TEIDs, SGW knows eNB's
    s1ctx = enb_app.by_crnti[crnti]
    bearer = sgw._bearers_by_teid[s1ctx.sgw_teid_ul]
    assert bearer.enb_teid_dl == s1ctx.enb_teid_dl
    assert bearer.ue_ipv4 == ue_nas.ip


def test_attach_with_snow3g_eia1_eea1():
    """The SMC algorithm IDs really select the cipher: an attach with
    EIA1/EEA1 (SNOW3G) negotiates, protects and registers end to end."""
    hss = Hss(); hss.provision(IMSI, K)
    sgw = SgwPgw()
    mme = Mme(hss, sgw, eia=1, eea=1)
    enb_app = EnbApp(mme, sgw)
    rrc_enb = RrcEnb(); rrc_ue = RrcUe(); ue_nas = UeNas(IMSI, K)
    _attach(mme, enb_app, rrc_enb, rrc_ue, ue_nas)
    assert ue_nas.state == UeEmmState.REGISTERED
    assert ue_nas.sec.eia == 1 and ue_nas.sec.eea == 1
    mme_ctx = next(iter(mme.ues.values()))
    assert mme_ctx.sec.eia == 1 and mme_ctx.state == EmmState.REGISTERED


def test_user_plane_echo_through_pdcp_and_gtpu():
    hss = Hss(); hss.provision(IMSI, K)
    sgw = SgwPgw(); mme = Mme(hss, sgw)
    enb_app = EnbApp(mme, sgw)
    rrc_enb = RrcEnb(); rrc_ue = RrcUe(); ue_nas = UeNas(IMSI, K)
    crnti = _attach(mme, enb_app, rrc_enb, rrc_ue, ue_nas)

    # DRB PDCP entities on both ends (ciphering on, same key)
    cfgp = PdcpConfig()
    pdcp_ue, pdcp_enb = PdcpEntity(cfgp), PdcpEntity(cfgp)

    ip_pkt = b"\x45\x00" + bytes(18) + b"ping-payload-123"
    # UE -> PDCP -> eNB -> GTP-U -> SGW -> PDN echo -> GTP-U -> eNB -> PDCP
    pdu = pdcp_ue.data_req(ip_pkt)
    sdu = pdcp_enb.data_ind(pdu)
    assert sdu == ip_pkt
    enb_app.uplink_user(crnti, sdu)
    dl = enb_app.poll_downlink_user()
    assert len(dl) == 1 and dl[0][0] == crnti
    assert dl[0][1] == ip_pkt                       # PDN echoed it
    pdu_dl = pdcp_enb.data_req(dl[0][1])
    assert pdcp_ue.data_ind(pdu_dl) == ip_pkt

    # network-originated downlink to the UE IP
    sgw.send_downlink(ue_nas.ip, b"network-push")
    dl = enb_app.poll_downlink_user()
    assert dl == [(crnti, b"network-push")]


def test_auth_failure_rejects():
    hss = Hss(); hss.provision(IMSI, K)
    sgw = SgwPgw(); mme = Mme(hss, sgw)
    enb_app = EnbApp(mme, sgw)
    rrc_enb = RrcEnb(); rrc_ue = RrcUe()
    wrong_ue = UeNas(IMSI, bytes(16))               # wrong key
    _camp(rrc_enb, rrc_ue)
    msg3 = rrc_ue.connection_request()
    crnti, msg4 = rrc_enb.handle_ccch(msg3)
    rrc_enb.handle_dcch(crnti, rrc_ue.on_ccch(crnti, msg4))
    enb_app.initial_ue_message(crnti, wrong_ue.attach_request())
    nas_dl = enb_app.poll_nas(crnti)[0]
    import pytest
    with pytest.raises(AssertionError, match="network authentication"):
        wrong_ue.handle_downlink(nas_dl)


def test_gtpu_header_wire_format():
    pdu = gtpu_encap(0x12345678, b"abc")
    assert pdu[:8] == bytes([0x30, 255, 0, 3, 0x12, 0x34, 0x56, 0x78])
    t, teid, payload = gtpu_decap(pdu)
    assert (t, teid, payload) == (255, 0x12345678, b"abc")


def test_ue_context_release():
    hss = Hss(); hss.provision(IMSI, K)
    sgw = SgwPgw(); mme = Mme(hss, sgw)
    enb_app = EnbApp(mme, sgw)
    rrc_enb = RrcEnb(); rrc_ue = RrcUe(); ue_nas = UeNas(IMSI, K)
    crnti = _attach(mme, enb_app, rrc_enb, rrc_ue, ue_nas)
    mme_ue_id = enb_app.by_crnti[crnti].mme_ue_id
    enb_app._dispatch([mme.release(mme_ue_id)])
    assert crnti not in enb_app.by_crnti
    assert mme_ue_id not in mme.ues
