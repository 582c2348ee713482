"""ESM dedicated bearer: activation ladder, TFT routing over a second
GTP-U tunnel, release.

Reference parity: openair-cn NAS ESM DedicatedEpsBearerContextActivation
+ SGW-LITE Create Bearer + S1AP E-RAB Setup (36.413 §8.2.1).
"""
import struct

from openair4g_tpu.rrc.enb import RrcEnb
from openair4g_tpu.rrc.ue import RrcUe
from openair4g_tpu.rrc.messages import Mib
from openair4g_tpu.epc import Hss, Mme, SgwPgw, EnbApp, UeNas
from openair4g_tpu.epc.ue_nas import UeEmmState
from openair4g_tpu.epc.gtpu import gtpu_decap

IMSI = 208920100001101
K = bytes(range(16))
VOICE_PORT = 7070


def _udp(sport: int, dport: int, payload: bytes) -> bytes:
    """Minimal IPv4/UDP packet (enough for the SGi TFT matcher)."""
    ip = bytearray(20)
    ip[0] = 0x45
    struct.pack_into(">H", ip, 2, 28 + len(payload))
    ip[8] = 64
    ip[9] = 17                       # UDP
    udp = struct.pack(">HHHH", sport, dport, 8 + len(payload), 0)
    return bytes(ip) + udp + payload


def _attach():
    hss = Hss(); hss.provision(IMSI, K)
    sgw = SgwPgw(); mme = Mme(hss, sgw)
    app = EnbApp(mme, sgw)
    enb = RrcEnb(); rue = RrcUe(); nas = UeNas(IMSI, K)
    rue.on_cell_found(0, Mib(bw_index=2))
    rue.on_bcch(enb.sib1.pack()); rue.on_bcch(enb.sib2.pack())
    crnti, msg4 = enb.handle_ccch(rue.connection_request())
    enb.handle_dcch(crnti, rue.on_ccch(crnti, msg4))
    app.initial_ue_message(crnti, nas.attach_request())
    for _ in range(4):
        for dl in app.poll_nas(crnti):
            ul = nas.handle_downlink(dl)
            if ul is not None:
                app.uplink_nas(crnti, ul)
        if nas.state == UeEmmState.REGISTERED:
            break
    assert nas.state == UeEmmState.REGISTERED
    return hss, sgw, mme, app, crnti, nas


def _nas_pump(app, crnti, nas):
    for dl in app.poll_nas(crnti):
        ul = nas.handle_downlink(dl)
        if ul is not None:
            app.uplink_nas(crnti, ul)


def test_dedicated_bearer_ladder_and_tft_routing():
    hss, sgw, mme, app, crnti, nas = _attach()
    mme_ctx = next(iter(mme.ues.values()))

    # --- network-initiated activation: E-RAB Setup + NAS over S1 -------
    app.handle_mme_initiated(mme.activate_dedicated_bearer(
        mme_ctx.mme_ue_id, qci=1, tft_dport=VOICE_PORT)[0])
    _nas_pump(app, crnti, nas)                 # UE accepts over NAS
    assert 6 in nas.bearers and nas.bearers[6]["tft_dport"] == VOICE_PORT
    assert 6 in mme_ctx.dedicated
    # second tunnel is live end to end (eNB allocated a DL TEID)
    s1 = app.by_crnti[crnti]
    assert 6 in s1.erabs
    sgw_ul, enb_dl = s1.erabs[6]
    assert sgw_ul != s1.sgw_teid_ul and enb_dl != s1.enb_teid_dl
    assert mme_ctx.dedicated[6].enb_teid_dl == enb_dl

    # --- two DL flows ride different bearers (TFT on UDP dport) --------
    voice = _udp(9000, VOICE_PORT, b"rtp-frame")
    data = _udp(9000, 80, b"http-bytes")
    sgw.send_downlink(nas.ip, voice)
    sgw.send_downlink(nas.ip, data)
    teids = [gtpu_decap(p)[1] for p in sgw.dl_queue]
    assert teids == [enb_dl, s1.enb_teid_dl]   # dedicated vs default
    got = app.poll_downlink_user_bearers()
    assert [(c, e) for c, e, _ in got] == [(crnti, 6), (crnti, 5)]
    assert got[0][2] == voice and got[1][2] == data

    # --- UL: the UE-side TFT picks the bearer, eNB uses its tunnel -----
    assert nas.bearer_for_uplink(_udp(VOICE_PORT, 9000, b"x")) == 6
    assert nas.bearer_for_uplink(_udp(5555, 9000, b"x")) == nas.ebi
    echoes = []
    sgw.pdn_handler = lambda ip, pkt: echoes.append(pkt) or None
    app.uplink_user(crnti, voice, ebi=6)
    assert echoes == [voice]

    # --- release: E-RAB Release + NAS deactivate -----------------------
    app.handle_mme_initiated(mme.deactivate_dedicated_bearer(
        mme_ctx.mme_ue_id, 6)[0])
    _nas_pump(app, crnti, nas)
    assert 6 not in nas.bearers and 6 not in mme_ctx.dedicated
    assert 6 not in app.by_crnti[crnti].erabs
    # traffic to the old port falls back to the default bearer
    sgw.pdn_handler = lambda ip, pkt: None
    sgw.send_downlink(nas.ip, voice)
    assert gtpu_decap(sgw.dl_queue[-1])[1] == s1.enb_teid_dl


def test_dedicated_bearer_torn_down_with_session():
    hss, sgw, mme, app, crnti, nas = _attach()
    mme_ctx = next(iter(mme.ues.values()))
    app.handle_mme_initiated(mme.activate_dedicated_bearer(
        mme_ctx.mme_ue_id, qci=1, tft_dport=VOICE_PORT)[0])
    _nas_pump(app, crnti, nas)
    ded_teid = mme_ctx.dedicated[6].sgw_teid_ul
    assert ded_teid in sgw._bearers_by_teid
    sgw.delete_session(mme_ctx.bearer.sgw_teid_ul)
    assert ded_teid not in sgw._bearers_by_teid
