"""Tests for PRACH preamble generation and detection."""
import numpy as np
import jax.numpy as jnp

from openair4g_tpu.phy.prach import (zc_root, preamble, preamble_freq,
                                     prach_detect, n_preambles, N_ZC)


class TestSequences:
    def test_zc_properties(self):
        x = zc_root(129)
        assert np.allclose(np.abs(x), 1.0, atol=1e-6)
        # ZC sequences have flat spectra (constant-amplitude DFT)
        X = np.fft.fft(np.asarray(x, np.complex128))
        assert np.allclose(np.abs(X), np.abs(X[0]), rtol=1e-3)

    def test_cyclic_shift_orthogonality(self):
        ncs = 13
        p0 = preamble(129, 0, ncs)
        p1 = preamble(129, 1, ncs)
        auto = abs(np.vdot(p0, p0))
        assert abs(np.vdot(p0, p1)) < 0.05 * auto

    def test_n_preambles(self):
        assert n_preambles(13) == 64
        assert n_preambles(838) == 1


class TestDetection:
    def test_noiseless_exact(self):
        u, ncs = 129, 13
        for v, dly in ((0, 0), (5, 3), (63, 12)):
            xf = preamble_freq(u, v, ncs) * np.exp(
                -2j * np.pi * np.arange(N_ZC) * dly / N_ZC)
            e, d, det = map(np.asarray,
                            prach_detect(jnp.asarray(xf[None]), u, ncs))
            assert det[0, v]
            assert d[0, v] == dly
            assert e[0, v] == e[0].max()

    def test_wrong_root_not_detected(self):
        xf = preamble_freq(129, 5, 13)
        rng = np.random.default_rng(0)
        noise = (rng.normal(size=N_ZC) + 1j * rng.normal(size=N_ZC)) * 0.5
        e, d, det = map(np.asarray, prach_detect(
            jnp.asarray((xf + noise)[None]), 130, 13))
        # a different ZC root spreads the energy: nothing should fire
        assert det.sum() == 0

    def test_sim_operating_points(self):
        from openair4g_tpu.sim.prachsim import Prachsim, PrachsimConfig
        sim = Prachsim(PrachsimConfig(batch=32))
        r = sim.run_snr(-12.0, n_batches=1)
        assert r["det_rate"] >= 0.95
        assert r["delay_ok_rate"] >= 0.9
        assert r["false_per_trial"] <= 0.1
        r = sim.run_snr(-26.0, n_batches=1)
        assert r["det_rate"] <= 0.5
