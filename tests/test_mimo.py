"""Tests for SFBC transmit diversity (TM2) and per-port estimation."""
import numpy as np
import jax
import jax.numpy as jnp

from openair4g_tpu.phy.alamouti import sfbc_encode, sfbc_combine
from openair4g_tpu.phy.resource_grid import make_grid_map, fill_grid_port


class TestSfbc:
    def test_perfect_reconstruction(self):
        rng = np.random.default_rng(0)
        B, R, N = 3, 2, 16
        x = (rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
             ).astype(np.complex64)
        p0, p1 = sfbc_encode(jnp.asarray(x))
        h = (rng.normal(size=(B, 2, R)) + 1j * rng.normal(size=(B, 2, R)))
        y = (h[:, 0, :, None] * np.asarray(p0)[:, None, :]
             + h[:, 1, :, None] * np.asarray(p1)[:, None, :])
        h0 = np.broadcast_to(h[:, 0, :, None], (B, R, N))
        h1 = np.broadcast_to(h[:, 1, :, None], (B, R, N))
        xh, n0e = sfbc_combine(jnp.asarray(y), jnp.asarray(h0),
                               jnp.asarray(h1), 0.1)
        assert np.abs(np.asarray(xh) - x).max() < 1e-5
        assert (np.asarray(n0e) > 0).all()

    def test_tx_power_preserved(self):
        """SFBC splits power across ports: |p0|^2 + |p1|^2 == |x|^2."""
        rng = np.random.default_rng(1)
        x = (rng.normal(size=(2, 8)) + 1j * rng.normal(size=(2, 8)))
        p0, p1 = sfbc_encode(jnp.asarray(x))
        tot = np.abs(np.asarray(p0)) ** 2 + np.abs(np.asarray(p1)) ** 2
        pair_tot = tot.reshape(2, 4, 2).sum(-1)
        pair_ref = (np.abs(x) ** 2).reshape(2, 4, 2).sum(-1)
        assert np.allclose(pair_tot, pair_ref, rtol=1e-5)


class TestPortGrids:
    def test_other_ports_pilots_are_nulled(self):
        gm = make_grid_map(6, 1, 0, nports=2)
        sym = jnp.zeros((1, gm.n_data_re), jnp.complex64)
        g0 = np.asarray(fill_grid_port(sym, gm, 0))[0]
        g1 = np.asarray(fill_grid_port(sym, gm, 1))[0]
        own0 = gm.pilot_port == 0
        own1 = gm.pilot_port == 1
        # port 0 grid: energy at its pilots, zero at port 1 pilots
        assert (np.abs(g0[gm.pilot_sym[own0], gm.pilot_bin[own0]]) > 0).all()
        assert (np.abs(g0[gm.pilot_sym[own1], gm.pilot_bin[own1]]) == 0).all()
        assert (np.abs(g1[gm.pilot_sym[own1], gm.pilot_bin[own1]]) > 0).all()
        assert (np.abs(g1[gm.pilot_sym[own0], gm.pilot_bin[own0]]) == 0).all()

    def test_two_port_data_res_skip_both_pilot_lattices(self):
        gm1 = make_grid_map(6, 1, 0, nports=1)
        gm2 = make_grid_map(6, 1, 0, nports=2)
        assert gm2.n_data_re < gm1.n_data_re   # 8 vs 10 REs/RB on pilot syms


class TestTxDivSim:
    def test_diversity_waterfall(self):
        from openair4g_tpu.sim.dlsim_mimo import DlsimTxDiv, DlsimTxDivConfig
        sim = DlsimTxDiv(DlsimTxDivConfig(mcs=4, n_rb=6, n_rx=2, batch=32,
                                          n_turbo_iter=6, perfect_ce=True))
        e_lo, t = sim.run_snr(-6.0, 32)
        e_hi, _ = sim.run_snr(4.0, 32)
        assert e_lo / t >= 0.4
        assert e_hi / t <= 0.1

    def test_estimated_ce_close_to_perfect(self):
        from openair4g_tpu.sim.dlsim_mimo import DlsimTxDiv, DlsimTxDivConfig
        sim = DlsimTxDiv(DlsimTxDivConfig(mcs=4, n_rb=6, n_rx=2, batch=32,
                                          n_turbo_iter=6))
        e, t = sim.run_snr(4.0, 32)
        assert e / t <= 0.15


def test_txdiv_frequency_selective_channels():
    """TM2 SFBC over catalog channels (EVA selective, SCM_C correlated):
    BASELINE config-3 machinery (10 MHz 2x2 TxDiv + estimation)."""
    from openair4g_tpu.sim.dlsim_mimo import DlsimTxDiv, DlsimTxDivConfig
    for chan in ("EVA", "SCM_C"):
        sim = DlsimTxDiv(DlsimTxDivConfig(mcs=4, n_rb=6, batch=64,
                                          channel=chan))
        errs, trials = sim.run_snr(10.0, 64)
        assert errs <= trials * 0.1, (chan, errs, trials)
