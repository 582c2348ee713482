"""Native runtime: ring buffer, ITTI queues, subframe scheduler, softmodem
loop (reference: LFDS FIFOs, intertask_interface, lte-softmodem thread
model)."""
import threading
import numpy as np
import pytest

from openair4g_tpu.runtime import (RingBuffer, MessageQueues,
                                   SubframeScheduler, SoftModem)
from openair4g_tpu.config import FrameParms


class TestRingBuffer:
    def test_roundtrip_and_wrap(self):
        rb = RingBuffer(64)
        assert rb.write(b"a" * 48) == 48
        assert rb.read(32) == b"a" * 32
        # wraps across the end
        assert rb.write(b"b" * 40) == 40
        assert rb.fill == 56
        assert rb.read(16) == b"a" * 16
        assert rb.read(40) == b"b" * 40
        assert rb.fill == 0

    def test_rejects_overflow_and_underflow(self):
        rb = RingBuffer(16)
        assert rb.write(b"x" * 17) == 0       # no partial writes
        assert rb.write(b"x" * 16) == 16
        assert rb.write(b"y") == 0
        assert rb.read(17) is None

    def test_numpy_array_io(self):
        rb = RingBuffer(1024)
        a = (np.arange(32) + 1j * np.arange(32)).astype(np.complex64)
        assert rb.write_array(a) == a.nbytes
        back = np.frombuffer(rb.read(a.nbytes), np.complex64)
        np.testing.assert_array_equal(back, a)

    def test_threaded_spsc(self):
        rb = RingBuffer(1 << 14)
        N = 500
        got = []

        def consumer():
            while len(got) < N:
                b = rb.read(8)
                if b is not None:
                    got.append(b)
        t = threading.Thread(target=consumer)
        t.start()
        for i in range(N):
            while rb.write(i.to_bytes(8, "little")) == 0:
                pass
        t.join(timeout=10)
        assert len(got) == N
        assert [int.from_bytes(b, "little") for b in got] == list(range(N))


class TestMessageQueues:
    def test_send_recv(self):
        mq = MessageQueues()
        mq.send(3, 42, b"hello")
        assert mq.pending(3) == 1
        mid, payload = mq.recv(3)
        assert mid == 42 and payload == b"hello"

    def test_timeout(self):
        mq = MessageQueues()
        assert mq.recv(5, timeout_s=0.05) is None

    def test_cross_thread(self):
        mq = MessageQueues()
        def sender():
            for i in range(10):
                mq.send(1, i, bytes([i]))
        t = threading.Thread(target=sender)
        t.start()
        out = [mq.recv(1, 2.0) for _ in range(10)]
        t.join()
        assert [m[0] for m in out] == list(range(10))


class TestScheduler:
    def test_freerun_completes_all(self):
        s = SubframeScheduler(n_workers=2, period_us=100)
        seen = []
        lock = threading.Lock()

        def cb(sf):
            with lock:
                seen.append(sf)
            return 0
        r = s.run(cb, 50, realtime=False)
        assert r["done"] == 50 and r["cb_fail"] == 0
        assert sorted(seen) == list(range(50))

    def test_realtime_pacing_and_deadlines(self):
        s = SubframeScheduler(n_workers=2, period_us=10000)
        import time
        s.run(lambda sf: 0, 4, realtime=False)   # warm up ctypes thunks
        t0 = time.perf_counter()
        r = s.run(lambda sf: 0, 10, realtime=True)
        dt = time.perf_counter() - t0
        assert dt >= 0.09, dt               # paced at ~10 ms/subframe
        assert r["missed"] == 0, r
        assert r["mean_us"] < 10000, r

    def test_deadline_miss_detected(self):
        import time
        s = SubframeScheduler(n_workers=1, period_us=200)

        def slow(sf):
            time.sleep(0.002)               # 10x the period
            return 0
        r = s.run(slow, 10, realtime=True)
        assert r["missed"] > 0


class TestSoftModem:
    def test_stream_processing(self):
        fp = FrameParms(n_rb=6)
        energies = {}

        def process(sf, samples):
            return float(np.mean(np.abs(samples) ** 2))

        modem = SoftModem(fp, process, n_workers=2, period_us=500)
        rng = np.random.default_rng(0)
        wave = (rng.standard_normal(20 * fp.samples_per_tti)
                + 1j * rng.standard_normal(20 * fp.samples_per_tti)
                ).astype(np.complex64)
        assert modem.feed(wave) == 20
        stats = modem.run(20, realtime=False)
        assert stats.done == 20 and stats.underruns == 0
        res = modem.results(20)
        assert len(res) == 20
        assert {sf for sf, _ in res} == set(range(20))
        for _, e in res:
            assert abs(e - 2.0) < 0.2       # unit-variance I+Q

    def test_underrun_detected(self):
        fp = FrameParms(n_rb=6)
        modem = SoftModem(fp, lambda sf, x: None)
        modem.feed(np.zeros(2 * fp.samples_per_tti, np.complex64))
        stats = modem.run(5, realtime=False)
        assert stats.underruns == 3

    def test_sync_through_modem(self):
        """Feed a framegen waveform; the PSS must be found in subframe 0."""
        from openair4g_tpu.sim.framegen import generate_frame
        from openair4g_tpu.sched.enb_tx import CellConfig
        fp = FrameParms(n_rb=6)
        wave = generate_frame(CellConfig(n_rb=6, n_id_cell=0, n_prb=6,
                                         n_pdcch=3, dci_L=2))

        from openair4g_tpu.phy.sync import pss_time_replica
        rep = np.conj(pss_time_replica(0, fp.n_fft))

        def process(sf, samples):
            c = np.abs(np.convolve(samples, rep[::-1], "valid"))
            return float(c.max())

        modem = SoftModem(fp, process)
        assert modem.feed(wave) == 10
        modem.run(10, realtime=False)
        res = dict(modem.results(10))
        # PSS present in subframes 0 and 5 only
        assert res[0] > 3 * res[1], res
        assert res[5] > 3 * res[1], res
