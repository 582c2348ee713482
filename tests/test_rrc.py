"""RRC-lite: message codec, SIB->PHY plumbing, connection state machines
(reference: openair2/RRC/LITE rrc_eNB.c / rrc_UE.c)."""
import pytest

from openair4g_tpu.rrc import (Mib, Sib1, Sib2, RrcConnectionRequest,
                               RrcConnectionSetup, decode_message,
                               apply_sib2, RrcEnb, RrcUe)
from openair4g_tpu.rrc.messages import (RrcConnectionReconfiguration,
                                        MeasurementReport)
from openair4g_tpu.rrc.ue import RrcState
from openair4g_tpu.rrc.enb import UeState


# ---------------------------------------------------------------- codec --

def test_message_roundtrips():
    msgs = [Mib(bw_index=2, sfn_msb8=0x5A),
            Sib1(mcc=208, mnc=93, tracking_area_code=0xBEEF,
                 cell_identity=0x0ABCDEF, si_periodicity=2),
            Sib2(prach_config_index=0, prach_root_sequence=22,
                 zero_correlation_zone=11, p0_nominal_pusch=36),
            RrcConnectionRequest(ue_identity=0xAB_CDEF_0123,
                                 establishment_cause=4),
            RrcConnectionSetup(ue_identity=0xAB_CDEF_0123,
                               transmission_mode=2),
            RrcConnectionReconfiguration(transaction_id=3,
                                         transmission_mode=3,
                                         srs_enable=1, srs_config_idx=517),
            MeasurementReport(rsrp_serving=60, neighbour_pci=301)]
    for m in msgs:
        data = m.pack()
        back = decode_message(data)
        assert back == m, (m, back)
        assert type(back) is type(m)


def test_codec_is_byte_deterministic():
    a = Sib2().pack()
    b = Sib2().pack()
    assert a == b and isinstance(a, bytes) and len(a) > 8


def test_unknown_tag_raises():
    with pytest.raises(ValueError):
        decode_message(b"\xff\x00\x00")


# ---------------------------------------------------- SIB -> PHY config --

def test_apply_sib2_plumbing():
    mib = Mib(bw_index=2)                       # 25 RB
    sib1 = Sib1(is_fdd=1)
    sib2 = Sib2(zero_correlation_zone=1, prach_root_sequence=0,
                prach_freq_offset=4, alpha=5, p0_nominal_pusch=41,
                ul_bandwidth=2, group_hopping=1, cyclic_shift=3)
    c = apply_sib2(mib, sib1, sib2, n_id_cell=17)
    assert c.fp_dl.n_rb == 25 and c.fp_dl.n_id_cell == 17
    assert c.n_rb_ul == 25
    assert c.prach.ncs == 13                    # zcz 1 -> NCS 13
    assert c.prach.root_u == 129                # logical 0 -> physical 129
    assert c.prach.freq_offset_rb == 4
    assert c.ul_pc.alpha == 0.8
    assert c.ul_pc.p0_nominal_pusch_dbm == 41 - 126
    assert c.group_hopping and c.cyclic_shift == 3
    assert c.tdd_config is None                 # FDD


def test_apply_sib2_tdd():
    c = apply_sib2(Mib(bw_index=3), Sib1(is_fdd=0, tdd_config=1), Sib2())
    assert c.fp_dl.n_rb == 50 and c.tdd_config == 1


# ----------------------------------------------------- SI broadcast timing

def test_bcch_schedule():
    enb = RrcEnb(sib1=Sib1(si_periodicity=0))   # SIB2 period 8 frames
    got_sib1 = got_sib2 = 0
    for sfn in range(32):
        for sf in range(10):
            pdu = enb.bcch_schedule(sfn, sf)
            if pdu is None:
                continue
            m = decode_message(pdu)
            if isinstance(m, Sib1):
                assert sf == 5 and sfn % 2 == 0
                got_sib1 += 1
            else:
                assert isinstance(m, Sib2) and sf == 0 and sfn % 8 == 1
                got_sib2 += 1
    assert got_sib1 == 16 and got_sib2 == 4


# ------------------------------------------------- connection establishment

def _acquire(ue: RrcUe, enb: RrcEnb):
    ue.on_cell_found(0, Mib(bw_index=2))
    for sfn in range(10):
        for sf in range(10):
            pdu = enb.bcch_schedule(sfn, sf)
            if pdu:
                ue.on_bcch(pdu)
    assert ue.state == RrcState.IDLE_READY


def test_full_attach_and_reconfiguration():
    enb, ue = RrcEnb(), RrcUe(seed=7)
    _acquire(ue, enb)
    assert ue.common.fp_dl.n_rb == 25

    # Msg3 -> Msg4 -> SetupComplete
    msg3 = ue.connection_request()
    crnti, msg4 = enb.handle_ccch(msg3)
    complete = ue.on_ccch(crnti, msg4)
    assert complete is not None and ue.state == RrcState.CONNECTED
    assert enb.ues[crnti].state == UeState.WAIT_SETUP_COMPLETE
    enb.handle_dcch(crnti, complete)
    assert enb.ues[crnti].state == UeState.CONNECTED
    assert ue.dedicated.transmission_mode == 1

    # reconfigure to TM3 with SRS
    reconf = enb.reconfigure(crnti, transmission_mode=3, srs_enable=True)
    resp = ue.on_dcch(reconf)
    enb.handle_dcch(crnti, resp)
    assert enb.ues[crnti].state == UeState.CONNECTED
    assert ue.dedicated.transmission_mode == 3
    assert ue.dedicated.srs is not None
    assert ue.dedicated.srs.n_rb == ue.common.n_rb_ul

    # measurement report flows up
    ue_report = MeasurementReport(rsrp_serving=55, neighbour_pci=12).pack()
    enb.handle_dcch(crnti, ue_report)
    assert enb.ues[crnti].reports[0].neighbour_pci == 12


def test_contention_resolution_loss():
    """Msg4 echoing a different identity: this UE lost contention and
    returns to IDLE_READY (36.321 §5.1.5)."""
    enb, ue = RrcEnb(), RrcUe(seed=1)
    _acquire(ue, enb)
    ue.connection_request()
    other = RrcConnectionRequest(ue_identity=0x1234, establishment_cause=4)
    crnti, msg4 = enb.handle_ccch(other.pack())
    out = ue.on_ccch(crnti, msg4)
    assert out is None and ue.state == RrcState.IDLE_READY


def test_t300_expiry_retries_ra():
    enb, ue = RrcEnb(), RrcUe(seed=2, t300_ttis=5)
    _acquire(ue, enb)
    ue.connection_request()
    events = [ue.tick() for _ in range(6)]
    assert "retry_ra" in events and ue.state == RrcState.IDLE_READY
    # and a second attempt works
    msg3 = ue.connection_request()
    crnti, msg4 = enb.handle_ccch(msg3)
    assert ue.on_ccch(crnti, msg4) is not None
    assert ue.connection_attempts == 2


def test_enb_drops_stale_setup():
    enb, ue = RrcEnb(setup_timeout_ttis=3), RrcUe(seed=3)
    _acquire(ue, enb)
    crnti, _ = enb.handle_ccch(ue.connection_request())
    dropped = []
    for _ in range(5):
        dropped += enb.tick()
    assert crnti in dropped and crnti not in enb.ues


def test_barred_cell_reselection():
    enb = RrcEnb(sib1=Sib1(cell_barred=1))
    ue = RrcUe(seed=4)
    ue.on_cell_found(0, Mib(bw_index=2))
    ue.on_bcch(enb.sib1.pack())
    assert ue.state == RrcState.IDLE_SEARCH


# ------------------------------------------ SRB1 over RLC-AM integration --

def test_srb1_rides_rlc_am():
    """DCCH messages through real RLC-AM entities both ways (the
    reference's SRB1 configuration), including the RA procedure carrying
    Msg3 (mac/ra.py) — the full control-plane stack minus the radio."""
    from openair4g_tpu.mac.rlc import RlcAm
    from openair4g_tpu.mac.ra import RaProcedure, Rar, pack_rar, unpack_rar

    enb, ue = RrcEnb(), RrcUe(seed=9)
    _acquire(ue, enb)

    # RA: preamble -> RAR -> Msg3(RRCConnectionRequest)
    ra = RaProcedure(preamble=17)
    pid = ra.send_preamble()
    rar = unpack_rar(pack_rar(Rar(rapid=pid, timing_advance=31,
                                  ul_grant=0x3F0, t_crnti=0x200)))
    assert ra.on_rar(rar)
    msg3 = ue.connection_request()
    crnti, msg4 = enb.handle_ccch(msg3)
    complete = ue.on_ccch(crnti, msg4)
    ra.on_contention_resolution(won=True)
    assert ra.state == "connected"

    # SRB1: UE->eNB SetupComplete, then eNB->UE Reconfiguration, over AM
    ue_am, enb_am = RlcAm(poll_every=1), RlcAm(poll_every=1)
    pdu = ue_am.tx_pdu(complete)
    status = enb_am.rx_pdu(pdu)
    ue_am.on_status(status)
    enb.handle_dcch(crnti, enb_am.delivered[-1])
    assert enb.ues[crnti].state == UeState.CONNECTED

    reconf = enb.reconfigure(crnti, transmission_mode=2)
    pdu = enb_am.tx_pdu(reconf)
    ue_am.rx_pdu(pdu)
    resp = ue.on_dcch(ue_am.delivered[-1])
    pdu = ue_am.tx_pdu(resp)
    enb_am.rx_pdu(pdu)
    enb.handle_dcch(crnti, enb_am.delivered[-1])
    assert ue.dedicated.transmission_mode == 2
    assert enb.ues[crnti].state == UeState.CONNECTED
