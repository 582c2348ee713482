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


def test_rohc_udp_ip_roundtrip_and_gain():
    """ROHC-lite: IPv4/UDP headers compress from 28 bytes to 4 after the
    IR packet, reconstruct byte-exactly (incl. IPv4 checksum), and
    pass-through covers non-UDP traffic."""
    import struct
    from openair4g_tpu.mac.rohc import (RohcCompressor, RohcDecompressor,
                                        _build_ipv4_udp)
    c, d = RohcCompressor(), RohcDecompressor()
    static = (bytes([10, 0, 0, 1]), bytes([12, 0, 0, 2]), 5004, 5004)
    pkts = [_build_ipv4_udp(static, 100 + i, bytes([i]) * 40)
            for i in range(5)]
    outs = [c.compress(p) for p in pkts]
    # first is IR (larger), rest are 4-byte-header compressed
    assert len(outs[0]) > len(pkts[0]) - 20
    for o, p in zip(outs[1:], pkts[1:]):
        assert len(o) == 4 + len(p) - 28          # 28 -> 4 bytes
    for o, p in zip(outs, pkts):
        assert d.decompress(o) == p               # byte-exact incl cksum
    # non-UDP goes through profile 0
    tcp = bytes([0x45]) + bytes(19) + b"x" * 20
    assert d.decompress(c.compress(tcp)) == tcp


def test_pdcp_with_rohc_end_to_end():
    from openair4g_tpu.mac.pdcp import PdcpEntity, PdcpConfig
    from openair4g_tpu.mac.rohc import _build_ipv4_udp
    cfg = PdcpConfig(ciphering="xor", key=7, rohc=True)
    tx, rx = PdcpEntity(cfg), PdcpEntity(cfg)
    static = (bytes([10, 0, 0, 9]), bytes([12, 0, 0, 2]), 1234, 80)
    for i in range(4):
        sdu = _build_ipv4_udp(static, i, b"data%d" % i)
        assert rx.data_ind(tx.data_req(sdu)) == sdu
