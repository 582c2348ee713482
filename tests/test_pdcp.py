"""PDCP: SN/HFN COUNT handling, ciphering hook, duplicate discard
(reference: openair2/LAYER2/PDCP_v10.1.0/pdcp.c)."""
from openair4g_tpu.mac import PdcpEntity, PdcpConfig


def test_roundtrip_plain():
    tx, rx = PdcpEntity(), PdcpEntity()
    sdus = [bytes([i]) * (10 + i) for i in range(5)]
    for s in sdus:
        assert rx.data_ind(tx.data_req(s)) == s
    assert rx.delivered == sdus


def test_ciphering_xor_roundtrip_and_opacity():
    cfg = PdcpConfig(ciphering="xor", key=42)
    tx, rx = PdcpEntity(cfg), PdcpEntity(cfg)
    sdu = b"secret payload!!"
    pdu = tx.data_req(sdu)
    assert sdu not in pdu                   # body is masked
    assert rx.data_ind(pdu) == sdu
    # wrong key fails to decipher
    rx_bad = PdcpEntity(PdcpConfig(ciphering="xor", key=7))
    assert rx_bad.data_ind(tx.data_req(sdu)) != sdu


def test_sn_wrap_maintains_count():
    cfg = PdcpConfig(sn_bits=7, ciphering="xor", key=3)
    tx, rx = PdcpEntity(cfg), PdcpEntity(cfg)
    for i in range(300):                    # wraps the 7-bit SN twice
        s = bytes([i & 0xFF]) * 4
        assert rx.data_ind(tx.data_req(s)) == s
    assert tx.tx_hfn == 2 and rx.rx_hfn == 2


def test_duplicate_discarded():
    tx, rx = PdcpEntity(), PdcpEntity()
    p = tx.data_req(b"x" * 8)
    assert rx.data_ind(p) == b"x" * 8
    assert rx.data_ind(p) is None
