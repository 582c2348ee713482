"""MAC PDU mux/demux + RLC wire-format round trips (36.321 §6, 36.322)."""
import pytest

from openair4g_tpu.mac.mux import (pack_mac_pdu, unpack_mac_pdu,
                                   pack_contention_resolution,
                                   contention_resolution_matches,
                                   LCID_CCCH, LCID_CONTENTION_RESOLUTION,
                                   LCID_SHORT_BSR, LCID_PADDING)
from openair4g_tpu.mac.rlc import (UmPdu, AmPdu, StatusPdu, pack_um,
                                   unpack_um, pack_am, pack_am_status,
                                   unpack_am)


def test_mac_pdu_roundtrip_with_padding():
    subs = [(LCID_SHORT_BSR, b"\x2a"), (3, b"hello world")]
    pdu = pack_mac_pdu(subs, 40)
    assert len(pdu) == 40
    assert unpack_mac_pdu(pdu) == subs


def test_mac_pdu_exact_fit_no_padding():
    subs = [(LCID_CCCH, b"\x01\x02\x03\x04\x05\x06")]
    # 1 subheader byte + 6 payload = 7
    pdu = pack_mac_pdu(subs, 7)
    assert len(pdu) == 7
    assert unpack_mac_pdu(pdu) == subs


def test_mac_pdu_multi_sdu_and_ce():
    cr = pack_contention_resolution(b"\xde\xad\xbe\xef\x01\x02\x03")
    subs = [(LCID_CONTENTION_RESOLUTION, cr), (LCID_CCCH, b"msg4-bytes"),
            (1, bytes(range(200)))]
    pdu = pack_mac_pdu(subs, 300)
    assert len(pdu) == 300
    got = unpack_mac_pdu(pdu)
    assert got == subs
    assert contention_resolution_matches(
        got[0][1], b"\xde\xad\xbe\xef\x01\x02\x03")
    assert not contention_resolution_matches(got[0][1], b"\x00" * 7)


def test_mac_pdu_overflow_raises():
    with pytest.raises(AssertionError):
        pack_mac_pdu([(1, bytes(50))], 10)


def test_um_wire_roundtrip():
    pdu = UmPdu(sn=517, fi_start=False, fi_end=True,
                chunks=(b"tail-of-sdu", b"", b"full-sdu"))
    assert unpack_um(pack_um(pdu)) == pdu


def test_am_wire_roundtrip():
    pdu = AmPdu(sn=1000, is_retx=True, poll=True, fi_start=False,
                chunks=(b"\x00\xffdata", b"second-sdu"))
    assert unpack_am(pack_am(pdu)) == pdu
    seg = AmPdu(sn=7, is_segment=True, so=96, lsf=True, poll=True,
                seg_data=b"\x01\x02tail", lis=(200, 44), fi_end=False)
    assert unpack_am(pack_am(seg)) == seg
    st = StatusPdu(ack_sn=77, nack_sns=(3, 900))
    assert unpack_am(pack_am_status(st)) == st


def test_rrc_bytes_fields_roundtrip():
    from openair4g_tpu.rrc.messages import (
        RrcConnectionSetupComplete, DlInformationTransfer,
        UlInformationTransfer, Paging, MobilityControlInfo,
        RrcHandoverCommand, HandoverPreparationInformation, decode_message)
    m = RrcConnectionSetupComplete(dedicated_info_nas=b"\x07AttachReq")
    assert decode_message(m.pack()) == m
    for cls in (DlInformationTransfer, UlInformationTransfer):
        m = cls(dedicated_info_nas=bytes(range(70)))
        assert decode_message(m.pack()) == m
    mci = MobilityControlInfo(target_pci=7, new_crnti=0xBEEF,
                              ra_preamble_index=17)
    ho = RrcHandoverCommand(transaction_id=2, mobility=mci.pack())
    got = decode_message(ho.pack())
    assert decode_message(got.mobility) == mci
    hpi = HandoverPreparationInformation(ue_identity=(1 << 39) | 5,
                                         source_crnti=0x101,
                                         as_context=b"ctx")
    assert decode_message(hpi.pack()) == hpi
    pg = Paging(ue_identity=0xABCDE12345 & ((1 << 40) - 1))
    assert decode_message(pg.pack()) == pg
