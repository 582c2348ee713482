"""EPC hardening (round-2 verdict item 9): NAS integrity protection
(EIA-lite), S1AP over a lossy transport (SCTP-lite), attach retry and
release-mid-traffic paths.

Reference parity: openair-cn/SECU + nas_message.c security-protected
headers; SCTP reliability under openair-cn/SCTP; mme_app attach retry /
UE context release procedures.
"""
import numpy as np
import pytest

from openair4g_tpu.epc import Hss, Mme, SgwPgw, EnbApp, UeNas
from openair4g_tpu.epc.mme import EmmState
from openair4g_tpu.epc.ue_nas import UeEmmState
from openair4g_tpu.epc.security import (NasSecurityContext, IntegrityError,
                                        eia_mac, SECURED_TAG, DIR_UPLINK,
                                        DIR_DOWNLINK)
from openair4g_tpu.epc.sctp_lite import make_association
from openair4g_tpu.rrc.enb import RrcEnb
from openair4g_tpu.rrc.ue import RrcUe

from test_epc_attach import _attach, IMSI, K


def _epc():
    hss = Hss()
    hss.provision(IMSI, K)
    sgw = SgwPgw()
    mme = Mme(hss, sgw)
    return hss, sgw, mme


# ---------------------------------------------------------- integrity --

def test_nas_integrity_wraps_after_smc():
    """After the security mode procedure, every NAS PDU on the wire is
    security-protected and MAC-verified on both ends."""
    hss, sgw, mme = _epc()
    enb_app = EnbApp(mme, sgw)
    ue_nas = UeNas(IMSI, K)
    crnti = _attach(mme, enb_app, RrcEnb(), RrcUe(), ue_nas)
    assert ue_nas.state == UeEmmState.REGISTERED
    assert ue_nas.sec.active
    ctx = next(iter(mme.ues.values()))
    assert ctx.sec.active
    assert ctx.state == EmmState.REGISTERED
    # counts advanced on both sides (SMC + AttachAccept DL; SMComplete +
    # AttachComplete UL)
    assert ctx.sec.dl_count >= 2 and ctx.sec.ul_count >= 2
    del crnti


def test_nas_mac_failure_discards_message():
    sec_a, sec_b = NasSecurityContext(), NasSecurityContext()
    kasme = bytes(16)
    sec_a.activate(kasme)
    sec_b.activate(kasme)
    wire = sec_a.protect(b"\x01hello", DIR_DOWNLINK)
    from openair4g_tpu.epc.security import CIPHERED_TAG
    assert wire[0] == CIPHERED_TAG          # post-SMC NAS is ciphered
    assert b"hello" not in wire             # ...really ciphered (EEA2)
    plain_wire = sec_a.protect(b"\x01hello", DIR_DOWNLINK, cipher=False)
    assert plain_wire[0] == SECURED_TAG
    assert sec_b.unprotect(wire, DIR_DOWNLINK) == b"\x01hello"
    # tamper with the payload -> MAC failure
    bad = wire[:-1] + bytes([wire[-1] ^ 1])
    with pytest.raises(IntegrityError):
        sec_b.unprotect(bad, DIR_DOWNLINK)
    # replaying an unprotected message after activation is rejected too
    with pytest.raises(IntegrityError):
        sec_b.unprotect(b"\x01hello", DIR_DOWNLINK)


def test_eia_mac_direction_and_count_separation():
    k = bytes(range(16))
    m = b"msg"
    assert eia_mac(k, 0, 0, 0, m) != eia_mac(k, 1, 0, 0, m)
    assert eia_mac(k, 0, 0, 0, m) != eia_mac(k, 0, 0, 1, m)
    assert eia_mac(k, 0, 0, 0, m) != eia_mac(k, 0, 1, 0, m)


def test_mme_discards_tampered_uplink_nas():
    """A MAC-failing UplinkNASTransport is dropped without state change
    (reference: nas_message decode failure discards)."""
    from openair4g_tpu.epc.s1ap import UplinkNasTransport
    hss, sgw, mme = _epc()
    enb_app = EnbApp(mme, sgw)
    ue_nas = UeNas(IMSI, K)
    _attach(mme, enb_app, RrcEnb(), RrcUe(), ue_nas)
    ctx = next(iter(mme.ues.values()))
    state_before = ctx.state
    forged = bytes([SECURED_TAG]) + bytes(3) + b"\x00\x00\x00\x00" + b"junk"
    out = mme.handle_s1ap(UplinkNasTransport(
        mme_ue_id=ctx.mme_ue_id, enb_ue_id=ctx.enb_ue_id,
        nas_pdu=forged).pack())
    assert out == []
    assert ctx.state == state_before


# ------------------------------------------------------ lossy transport --

def test_sctp_lite_inorder_exactly_once_under_loss():
    rng = np.random.default_rng(7)
    a, b = make_association(rng, p_drop=0.3, p_dup=0.2, p_reorder=0.3)
    msgs = [bytes([i]) * (i + 1) for i in range(40)]
    for m in msgs:
        a.send_s1ap(m)
    got = []
    for _ in range(200):
        a.tick()
        b.tick()
        got += b.drain()
        if len(got) == len(msgs):
            break
    assert got == msgs, "not delivered in-order exactly-once"
    assert a.n_retx > 0, "loss never exercised retransmission"


def test_attach_ladder_over_lossy_s1ap():
    """The full attach ladder completes when every S1AP PDU crosses a
    30%-drop wire through SCTP-lite."""
    hss, sgw, mme = _epc()
    rng = np.random.default_rng(11)
    enb_ep, mme_ep = make_association(rng, p_drop=0.3, p_dup=0.1,
                                      p_reorder=0.2)

    class LossyMme:
        """Mme proxy: requests and responses both ride the association."""

        def handle_s1ap(self, pdu: bytes) -> list:
            enb_ep.send_s1ap(pdu)
            out = []
            for _ in range(60):
                enb_ep.tick()
                mme_ep.tick()
                for req in mme_ep.drain():
                    for resp in mme.handle_s1ap(req):
                        mme_ep.send_s1ap(resp)
                enb_ep.tick()
                mme_ep.tick()
                out += enb_ep.drain()
                if out:
                    # drain a few more ticks for multi-PDU responses
                    for _ in range(10):
                        enb_ep.tick()
                        mme_ep.tick()
                        out += enb_ep.drain()
                    return out
            return out

    enb_app = EnbApp(LossyMme(), sgw)
    ue_nas = UeNas(IMSI, K)
    _attach(LossyMme(), enb_app, RrcEnb(), RrcUe(), ue_nas)
    assert ue_nas.state == UeEmmState.REGISTERED
    ctx = next(iter(mme.ues.values()))
    assert ctx.state == EmmState.REGISTERED
    assert enb_ep.n_retx + mme_ep.n_retx > 0


# ------------------------------------------------- retry / mid-traffic --

def test_attach_retry_after_auth_reject():
    """First attach fails authentication (wrong K); the retry with the
    right K succeeds — MME state machine survives the reject."""
    hss, sgw, mme = _epc()
    enb_app = EnbApp(mme, sgw)
    bad_ue = UeNas(IMSI, bytes(16))      # wrong K -> RES != XRES
    rrc_enb, rrc_ue = RrcEnb(), RrcUe()
    with pytest.raises(AssertionError):
        _attach(mme, enb_app, rrc_enb, rrc_ue, bad_ue)
    # retry with the correct credentials on a fresh RRC connection
    ue_nas = UeNas(IMSI, K)
    _attach(mme, enb_app, RrcEnb(), RrcUe(), ue_nas)
    assert ue_nas.state == UeEmmState.REGISTERED


def test_release_mid_traffic():
    """UE context release while user-plane packets are in flight: the
    eNB completes the release, and further traffic for the released UE
    raises instead of silently forwarding."""
    hss, sgw, mme = _epc()
    enb_app = EnbApp(mme, sgw)
    ue_nas = UeNas(IMSI, K)
    crnti = _attach(mme, enb_app, RrcEnb(), RrcUe(), ue_nas)
    enb_app.uplink_user(crnti, b"in-flight-1")
    ctx = next(iter(mme.ues.values()))
    # queue a DL packet, then release before the eNB forwards it
    assert enb_app.sgw.dl_queue or enb_app.poll_downlink_user() is not None
    enb_app.uplink_user(crnti, b"in-flight-2")
    enb_app._dispatch([mme.release(ctx.mme_ue_id)])
    assert crnti not in enb_app.by_crnti
    assert ctx.mme_ue_id not in mme.ues
    with pytest.raises(KeyError):
        enb_app.uplink_user(crnti, b"after-release")
