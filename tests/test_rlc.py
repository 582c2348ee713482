"""RLC UM/AM: segmentation/reassembly, reordering, loss recovery
(reference: openair2/LAYER2/RLC UM_v9.3.0 / AM_v9.3.0)."""
import numpy as np

from openair4g_tpu.mac.rlc import RlcUm, RlcAm, StatusPdu


class TestUm:
    def test_segmentation_reassembly(self):
        tx = RlcUm()
        rx = RlcUm()
        sdus = [bytes([i]) * n for i, n in enumerate((50, 120, 7, 300))]
        for s in sdus:
            tx.tx_enqueue(s)
        while True:
            pdu = tx.tx_pdu(48)
            if pdu is None:
                break
            rx.rx_pdu(pdu)
        assert rx.delivered == sdus

    def test_reordering_window(self):
        tx = RlcUm()
        rx = RlcUm()
        for i in range(6):
            tx.tx_enqueue(bytes([i]) * 10)
        pdus = [tx.tx_pdu(10) for _ in range(6)]
        order = [0, 2, 1, 4, 5, 3]
        for i in order:
            rx.rx_pdu(pdus[i])
        assert rx.delivered == [bytes([i]) * 10 for i in range(6)]

    def test_loss_with_treordering_skips_gap(self):
        tx = RlcUm(t_reordering=3)
        rx = RlcUm(t_reordering=3)
        for i in range(4):
            tx.tx_enqueue(bytes([i]) * 10)
        pdus = [tx.tx_pdu(10) for _ in range(4)]
        rx.rx_pdu(pdus[0])
        # pdus[1] lost
        rx.rx_pdu(pdus[2])
        rx.rx_pdu(pdus[3])
        for _ in range(5):
            rx.tick()
        assert rx.delivered == [pdus[0].payload, pdus[2].payload,
                                pdus[3].payload]

    def test_duplicate_discard(self):
        tx = RlcUm()
        rx = RlcUm()
        tx.tx_enqueue(b"x" * 10)
        p = tx.tx_pdu(10)
        rx.rx_pdu(p)
        rx.rx_pdu(p)
        assert rx.delivered == [b"x" * 10]


class TestAm:
    def test_lossless_delivery_and_ack_release(self):
        tx = RlcAm(poll_every=4)
        rx = RlcAm()
        for i in range(8):
            pdu = tx.tx_pdu(bytes([i]) * 5)
            st = rx.rx_pdu(pdu)
            if st:
                tx.on_status(st)
        assert rx.delivered == [bytes([i]) * 5 for i in range(8)]
        assert len(tx._sent) <= 4           # acked PDUs released

    def test_retransmission_recovers_loss(self):
        tx = RlcAm(poll_every=4)
        rx = RlcAm()
        pdus = [tx.tx_pdu(bytes([i]) * 5) for i in range(4)]
        st = None
        for i, p in enumerate(pdus):
            if i == 1:
                continue                    # lose SN 1
            st = rx.rx_pdu(p)
        assert st is not None and st.nack_sns == (1,)
        tx.on_status(st)
        retx = tx.tx_pdu()
        assert retx is not None and retx.is_retx and retx.sn == 1
        rx.rx_pdu(retx)
        assert rx.delivered == [bytes([i]) * 5 for i in range(4)]

    def test_max_retx_triggers_rlf(self):
        """RLF fires only after max_retx ACTUAL retransmissions: a NACK
        for an SN already sitting in the retx queue does not count
        (ADVICE r3) — drain the queue between status reports."""
        tx = RlcAm(max_retx=2)
        tx.tx_pdu(b"a")
        # repeated NACKs while the retx is still queued count ONCE
        for _ in range(4):
            tx.on_status(StatusPdu(ack_sn=0, nack_sns=(0,)))
        assert not tx.rlf
        assert tx.tx_pdu() is not None          # retx 1 goes out
        tx.on_status(StatusPdu(ack_sn=0, nack_sns=(0,)))
        assert not tx.rlf
        assert tx.tx_pdu() is not None          # retx 2 goes out
        tx.on_status(StatusPdu(ack_sn=0, nack_sns=(0,)))   # would be #3
        assert tx.rlf

    def test_am_segmentation_resegmentation(self):
        """A 400-byte SDU over 96-byte grants: segmentation on first
        transmission, SO-based re-segmentation of a NACKed PDU to a
        smaller grant (rlc_am_segment.c / rlc_am_resegment.c parity)."""
        from openair4g_tpu.mac.rlc import pack_am, unpack_am
        tx = RlcAm(poll_every=1)
        rx = RlcAm()
        sdu = bytes(range(256)) + bytes(144)          # 400 bytes
        tx.tx_enqueue(sdu)
        pdus = []
        while tx.has_data():
            p = tx.tx_pdu(size=96)
            assert len(p.payload) <= 96
            pdus.append(p)
        assert len(pdus) == 5                          # ceil(400/96)
        # lose PDU 2, deliver the rest; poll on the last generates status
        st = None
        for i, p in enumerate(pdus):
            if i == 2:
                continue
            s = rx.rx_pdu(unpack_am(pack_am(p)))
            st = s if s is not None else st
        assert st is not None and st.nack_sns == (pdus[2].sn,)
        tx.on_status(st)
        # retransmit into a SMALLER grant -> two AMD PDU segments
        seg1 = tx.tx_pdu(size=60)
        seg2 = tx.tx_pdu(size=60)
        assert seg1.is_segment and not seg1.lsf and seg1.so == 0
        assert seg2.is_segment and seg2.lsf and seg2.so == 60
        rx.rx_pdu(unpack_am(pack_am(seg1)))
        rx.rx_pdu(unpack_am(pack_am(seg2)))
        assert rx.delivered == [sdu]

    def test_am_concatenation(self):
        """Several small SDUs share one grant (LI framing)."""
        tx = RlcAm()
        rx = RlcAm()
        sdus = [b"alpha", b"beta!", b"gamma"]
        for s in sdus:
            tx.tx_enqueue(s)
        p = tx.tx_pdu(size=100)
        assert len(p.chunks) == 3
        rx.rx_pdu(p)
        assert rx.delivered == sdus
