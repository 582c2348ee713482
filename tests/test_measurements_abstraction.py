"""Tests: UE measurements and EESM/MIESM PHY abstraction."""
import numpy as np
import jax
import jax.numpy as jnp

from openair4g_tpu.config import FrameParms
from openair4g_tpu.phy import ofdm
from openair4g_tpu.phy.resource_grid import make_grid_map, fill_grid
from openair4g_tpu.phy.measurements import measure, wideband_cqi
from openair4g_tpu.sim.abstraction import (eesm, miesm, BlerTable,
                                           draw_block_errors)


class TestMeasurements:
    def _rx(self, n0, B=4, seed=0):
        fp = FrameParms(n_rb=25)
        gm = make_grid_map(25, 1, 0)
        key = jax.random.PRNGKey(seed)
        sym = jax.random.normal(key, (B, gm.n_data_re, 2)) / np.sqrt(2)
        sym = (sym[..., 0] + 1j * sym[..., 1]).astype(jnp.complex64)
        grid = fill_grid(sym, gm)
        t = ofdm.ofdm_modulate(grid, fp)
        n = jax.random.normal(jax.random.PRNGKey(seed + 1),
                              t.shape + (2,)) * np.sqrt(n0 / 2)
        r = t + n[..., 0] + 1j * n[..., 1]
        return ofdm.ofdm_demodulate(r, fp), gm

    def test_rsrp_tracks_signal(self):
        rg, gm = self._rx(n0=0.01)
        m = measure(rg, gm)
        # unit-energy pilots + small noise: RSRP ~ 1
        assert np.allclose(np.asarray(m["rsrp"]), 1.0, atol=0.1)
        # RSRQ ~ RSRP/RSSI_per_sc; > 1 here because the PDCCH symbol is
        # empty in this sim (lowers RSSI), bounded by the all-pilot extreme
        rsrq = np.asarray(m["rsrq"])
        assert (rsrq > 0.9).all() and (rsrq < 1.6).all()

    def test_noise_estimate(self):
        from openair4g_tpu.phy.channel_est import (make_wiener_stack,
                                                   estimate_channel)
        n0 = 0.1
        rg, gm = self._rx(n0=n0)
        H = estimate_channel(rg, gm, jnp.asarray(make_wiener_stack(gm, n0)),
                             time_avg=True)
        m = measure(rg, gm, H_hat=H)
        n0h = np.asarray(m["n0_hat"])
        assert np.allclose(n0h, n0, rtol=0.5)
        assert np.allclose(np.asarray(m["snr_hat"]), 1 / n0, rtol=0.5)

    def test_cqi_monotone(self):
        snrs = jnp.asarray(10.0 ** (np.array([-10, 0, 10, 20, 30]) / 10.0))
        cqi = np.asarray(wideband_cqi(snrs))
        assert (np.diff(cqi) >= 0).all()
        assert cqi[0] <= 1 and cqi[-1] >= 14


class TestEsm:
    def test_eesm_flat_is_identity(self):
        s = jnp.full((3, 100), 2.5)
        eff = np.asarray(eesm(s, beta=1.3))
        assert np.allclose(eff, 2.5, rtol=1e-5)

    def test_eesm_dominated_by_worst(self):
        good = np.full(99, 10.0)
        mixed = np.concatenate([good, [0.01]])
        eff = float(eesm(jnp.asarray(mixed)[None, :], beta=1.0)[0])
        assert eff < 10.0
        assert eff > 0.01

    def test_miesm_flat_is_identity(self):
        for Qm in (2, 4, 6):
            s = jnp.full((2, 50), 1.8)
            eff = np.asarray(miesm(s, Qm))
            assert np.allclose(eff, 1.8, rtol=0.05), Qm

    def test_bler_table_and_draw(self):
        tab = BlerTable(np.array([-4.0, -2.0, 0.0, 2.0]),
                        np.array([1.0, 0.5, 0.05, 0.001]))
        b = np.asarray(tab.lookup(jnp.asarray([10 ** (-0.1), 10 ** 0.5])))
        assert 0.01 < b[0] < 0.2
        assert b[1] <= 0.01
        # statistical draw
        key = jax.random.PRNGKey(0)
        errs = np.asarray(draw_block_errors(
            key, jnp.full(4000, 0.3))).mean()
        assert abs(errs - 0.3) < 0.03


def test_calibrate_eesm_beta_machinery():
    """Beta calibration (the reference's beta1/beta2_dlsch regeneration):
    returns a finite beta whose EESM prediction tracks the measured
    fading BLER better than the worst candidate."""
    from openair4g_tpu.sim.abstraction import calibrate_eesm_beta
    out = calibrate_eesm_beta(4, channel="EVA", n_rb=6, n_frames=64,
                              n_realizations=512)
    assert out["beta"] > 0
    assert min(out["errs"]) < max(out["errs"])
    assert all(0 <= m <= 1 for m in out["measured"])
