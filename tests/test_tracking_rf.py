"""Timing/AGC/CFO tracking, RF impairments, eNB UL measurements, framegen,
scansim, Octave IO (reference: lte_adjust_sync.c, adjust_gain.c,
lte_est_freq_offset.c, SIMULATION/RF, framegen.c, scansim.c,
file_output.c)."""
import os
import numpy as np
import jax
import jax.numpy as jnp

from openair4g_tpu.config import FrameParms
from openair4g_tpu.phy.tracking import (timing_gate, track_timing, agc_gain,
                                        pilot_cfo_estimate)
from openair4g_tpu.sim.rf import (iq_imbalance, iq_imbalance_full,
                                  phase_noise, dac, cfo)
from openair4g_tpu.utils.octave_io import write_output, read_output


class TestTracking:
    def test_timing_gate_detects_delay(self):
        fp = FrameParms(n_rb=25)
        M = 300
        f = np.arange(M) - 150
        for delay in (0.0, 5.0, -5.0):
            H = np.exp(-2j * np.pi * f * delay / fp.n_fft)[None, :]
            off, _ = timing_gate(jnp.asarray(H, jnp.complex64), fp.cp,
                                 fp.n_fft)
            np.testing.assert_allclose(np.asarray(off), delay, atol=1.0)

    def test_track_timing_deadzone(self):
        rx = jnp.asarray([100, 100, 100])
        est = jnp.asarray([3.0, -3.0, 0.1])
        out = np.asarray(track_timing(rx, est))
        np.testing.assert_array_equal(out, [101, 99, 100])

    def test_agc(self):
        g = np.asarray(agc_gain(jnp.asarray([4.0]), target=1.0))
        np.testing.assert_allclose(g, 0.5)

    def test_pilot_cfo(self):
        fp = FrameParms(n_rb=6)
        M, dist = 72, 4
        f_off = 0.02   # subcarrier spacings
        phi = 2 * np.pi * f_off * dist * (fp.n_fft + fp.cp) / fp.n_fft
        h0 = np.ones((2, M), np.complex64)
        h1 = h0 * np.exp(1j * phi)
        est = np.asarray(pilot_cfo_estimate(jnp.asarray(h0), jnp.asarray(h1),
                                            dist, fp.n_fft, fp.cp))
        np.testing.assert_allclose(est, f_off, atol=1e-3)


class TestRf:
    def test_iq_imbalance_models(self):
        t = jnp.asarray([[1.0 + 1.0j, -1.0 + 0.5j]])
        y = iq_imbalance(t, 0.1)
        np.testing.assert_allclose(np.asarray(y.imag),
                                   [[1.1, 0.4]], atol=1e-6)
        y2 = iq_imbalance_full(t, amp_db=0.0, phase_deg=0.0)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(t), atol=1e-7)

    def test_phase_noise_power_preserving(self):
        key = jax.random.PRNGKey(0)
        t = jnp.ones((2, 1000), jnp.complex64)
        y = phase_noise(key, t, 100.0, 7.68e6)
        np.testing.assert_allclose(np.abs(np.asarray(y)), 1.0, atol=1e-5)
        assert not np.allclose(np.asarray(y), np.asarray(t))

    def test_dac_quantization(self):
        t = jnp.asarray([[0.333 + 0.777j]])
        y12 = np.asarray(dac(t, 12))[0, 0]
        y4 = np.asarray(dac(t, 4))[0, 0]
        assert abs(y12 - 0.333 - 0.777j) < 1e-2
        assert abs(y4.real - 0.333) > abs(y12.real - 0.333)

    def test_cfo_roundtrip(self):
        t = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 64)) + 0j, jnp.complex64)
        y = cfo(cfo(t, 1.5, 128), -1.5, 128)
        np.testing.assert_allclose(np.asarray(y), np.asarray(t), atol=1e-5)


def test_enb_ul_measurements():
    from openair4g_tpu.phy.measurements import enb_measure_ul
    from openair4g_tpu.phy.scfdma import make_pusch_map
    pm = make_pusch_map(25, 12, 0)
    fp = pm.fp
    rng = np.random.default_rng(1)
    n0 = 0.01
    grid = (rng.standard_normal((2, 14, fp.n_fft))
            + 1j * rng.standard_normal((2, 14, fp.n_fft))) * np.sqrt(n0 / 2)
    # signal on the first 12 RBs
    occ = fp.sc_to_bin(np.arange(12 * 12))
    grid[:, :, occ] += 1.0
    mask = np.zeros(25, bool)
    mask[:12] = True
    m = enb_measure_ul(jnp.asarray(grid, jnp.complex64), pm, mask)
    assert (np.asarray(m["snr_db"]) > 15).all()
    assert np.allclose(np.asarray(m["n0_hat"]), n0, rtol=0.5)


def test_framegen_and_scan(tmp_path):
    from openair4g_tpu.sim.framegen import generate_frame
    from openair4g_tpu.sim.scansim import CarrierScan, ScanConfig
    from openair4g_tpu.sched.enb_tx import CellConfig
    cell = CellConfig(n_rb=6, n_id_cell=5, n_prb=6, n_pdcch=3,
                      dci_L=2)
    wave = generate_frame(cell, fill_pdsch=True)
    fp = FrameParms(n_rb=6)
    assert len(wave) == 10 * fp.samples_per_tti

    scan = CarrierScan(ScanConfig(n_rb=6, freq_hyps=(-1.0, 0.0, 1.0)))
    L = scan.search.capture_len
    cap = np.zeros((2, L), np.complex64)
    cap[0, :L] = wave[:L]
    # second capture: same cell at +1 subcarrier offset
    cap[1, :L] = wave[:L] * np.exp(
        2j * np.pi * 1.0 / fp.n_fft * np.arange(L))
    cap += 0.01 * (np.random.default_rng(0).standard_normal((2, L))
                   + 1j * np.random.default_rng(1).standard_normal((2, L))
                   ).astype(np.complex64)
    res = scan.scan(jnp.asarray(cap))
    assert res["nid1"][0] == 5 // 3 and res["nid2"][0] == 5 % 3
    assert res["coarse_cfo"][0] == 0.0
    assert res["coarse_cfo"][1] == 1.0
    assert res["nid2"][1] == 5 % 3


def test_octave_io_roundtrip(tmp_path):
    p = os.path.join(tmp_path, "dump.m")
    x = np.array([1.5, -2.25, 3.0])
    z = np.array([1 + 2j, -0.5 - 0.25j])
    write_output(p, "x", x)
    write_output(p, "z", z, append=True)
    back = read_output(p)
    np.testing.assert_allclose(back["x"], x)
    np.testing.assert_allclose(back["z"], z)
