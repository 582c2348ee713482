"""Uplink chain tests: ZC DMRS, SC-FDMA transform precoding, channel
estimation, and ulsim BLER sanity (reference: ulsim.c harness behavior)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openair4g_tpu.phy.ulref import zc_base_sequence, pusch_dmrs, DFT_SIZES
from openair4g_tpu.phy.scfdma import (make_pusch_map, transform_precode,
                                      transform_deprecode, pusch_fill_grid,
                                      pusch_extract)
from openair4g_tpu.phy.pusch import (UlschConfig, make_ul_wiener,
                                     ul_estimate_channel,
                                     scfdma_mmse_equalize)
from openair4g_tpu.sim.ulsim import Ulsim, UlsimConfig


def test_zc_unit_modulus_and_distinct():
    for m in (12, 24, 36, 300):
        for u in (0, 7, 29):
            r = zc_base_sequence(u, 0, m)
            assert r.shape == (m,)
            np.testing.assert_allclose(np.abs(r), 1.0, atol=1e-5)
    a = zc_base_sequence(0, 0, 300)
    b = zc_base_sequence(1, 0, 300)
    # distinct groups are near-orthogonal-ish; at minimum not equal
    assert np.abs(np.vdot(a, b)) / 300 < 0.5


def test_zc_flat_frequency_autocorr():
    """|r(n)|=1 and cyclic-shifted DMRS separate users: shifted sequences are
    orthogonal under the inner product (basis of multi-UE DMRS sharing)."""
    m = 144
    r0 = pusch_dmrs(m, u=0, cyclic_shift=0)
    r6 = pusch_dmrs(m, u=0, cyclic_shift=6)
    corr = np.abs(np.vdot(r0, r6)) / m
    assert corr < 1e-5


def test_transform_precode_roundtrip():
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (3, 5, 144)) +
         1j * jax.random.normal(jax.random.PRNGKey(1), (3, 5, 144)))
    y = transform_deprecode(transform_precode(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)
    # unitary: power preserved
    np.testing.assert_allclose(
        float(jnp.sum(jnp.abs(transform_precode(x)) ** 2)),
        float(jnp.sum(jnp.abs(x) ** 2)), rtol=1e-5)


def test_pusch_grid_roundtrip():
    pm = make_pusch_map(25, 25)
    dmrs = pusch_dmrs(pm.m_sc)
    B, n_sym = 2, len(pm.data_syms) * pm.m_sc
    key = jax.random.PRNGKey(2)
    sym = (jax.random.normal(key, (B, n_sym)) +
           1j * jax.random.normal(jax.random.PRNGKey(3), (B, n_sym))
           ).astype(jnp.complex64)
    grid = pusch_fill_grid(sym, pm, dmrs)
    data, dm = pusch_extract(grid, pm)
    np.testing.assert_allclose(np.asarray(dm[0, 0]), dmrs, atol=1e-5)
    x_time = transform_deprecode(data)
    # undo interleave: serial[i] = flat[inv[i]]
    inv = np.empty_like(pm.interleave)
    inv[pm.interleave] = np.arange(len(pm.interleave))
    flat = np.asarray(x_time).reshape(B, -1)[:, inv]
    np.testing.assert_allclose(flat, np.asarray(sym), atol=1e-4)


def test_ul_channel_estimation_mse():
    """LMMSE UL estimate should be close to truth at moderate SNR."""
    cfg = UlsimConfig(mcs=6, n_rb=25, n_rb_alloc=25, channel='EVA', batch=32)
    sim = Ulsim(cfg)
    key = jax.random.PRNGKey(0)
    taps = sim.chan.draw_taps(key, 32)
    H = sim.chan.freq_response_at(taps, sim.f_idx)            # [B, M]
    n0 = 10.0 ** (-15.0 / 10.0)
    # received DMRS = H * r + noise
    r = jnp.asarray(sim.dmrs)
    nse = (jax.random.normal(jax.random.PRNGKey(1), (32, 2, sim.pm.m_sc, 2)))
    dmrs_rx = H[:, None, :] * r + jnp.sqrt(n0 / 2) * (
        nse[..., 0] + 1j * nse[..., 1])
    West = make_ul_wiener(sim.pm, n0)
    H_hat = ul_estimate_channel(dmrs_rx, sim.dmrs, sim.pm, jnp.asarray(West))
    mse = float(jnp.mean(jnp.abs(H_hat - H[:, None, :]) ** 2))
    sig = float(jnp.mean(jnp.abs(H) ** 2))
    assert mse / sig < 0.05, (mse, sig)


def test_ulsim_awgn_high_snr_perfect():
    sim = Ulsim(UlsimConfig(mcs=16, n_rb=25, n_rb_alloc=25, channel='AWGN',
                            batch=8, n_harq_rounds=1))
    errs, reach = sim.run_snr(25.0, 8)
    assert errs[0] == 0 and reach[0] == 8


def test_ulsim_waterfall_monotone():
    """BLER decreases with SNR through the waterfall (QPSK MCS6, AWGN)."""
    sim = Ulsim(UlsimConfig(mcs=6, n_rb=25, n_rb_alloc=25, channel='AWGN',
                            batch=64, n_harq_rounds=1, n_turbo_iter=6))
    blers = []
    for snr in (-1.0, 1.5, 4.0):
        errs, reach = sim.run_snr(snr, 64)
        blers.append(errs[0] / reach[0])
    assert blers[0] > 0.9, blers
    assert blers[-1] < 0.1, blers


def test_ulsim_harq_gain():
    """At an SNR where round 0 mostly fails, chase combining must rescue a
    large fraction by round 2 (rv cycling, ulsim -H equivalent)."""
    sim = Ulsim(UlsimConfig(mcs=16, n_rb=25, n_rb_alloc=25, channel='AWGN',
                            batch=64, n_harq_rounds=3, n_turbo_iter=6))
    errs, reach = sim.run_snr(6.0, 64)   # ~3-4 dB below 16QAM waterfall
    assert errs[0] > 0.5 * reach[0]
    assert errs[2] < 0.2 * reach[0]


def test_ulsim_time_fir_channel_decodes():
    """The sample-stream FIR channel path (the reference's
    multipath_channel, ulsim.c:1202) carries PUSCH end to end with
    estimated CE."""
    from openair4g_tpu.sim.ulsim import Ulsim, UlsimConfig
    sim = Ulsim(UlsimConfig(mcs=10, n_rb=25, channel="EVA", batch=16,
                            n_turbo_iter=4, time_domain_channel=True))
    errs, reach = sim.run_snr(18.0, 16)
    assert errs[0] <= 1, (errs, reach)
