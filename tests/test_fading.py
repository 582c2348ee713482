import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openair4g_tpu.config import FrameParms
from openair4g_tpu.sim.channels import ChannelModel, apply_channel_grid, PROFILES
from openair4g_tpu.phy.channel_est import make_wiener_stack, estimate_channel
from openair4g_tpu.phy.resource_grid import make_grid_map, fill_grid
from openair4g_tpu.phy import ofdm


def test_channel_power_normalized():
    fp = FrameParms(n_rb=25)
    for name in ("EPA", "EVA", "ETU"):
        cm = ChannelModel(name=name, fp=fp)
        taps = cm.draw_taps(jax.random.PRNGKey(0), 2000)
        H = cm.freq_response(taps)
        p = float(jnp.mean(jnp.abs(H) ** 2))
        assert abs(p - 1.0) < 0.05, (name, p)


def test_freq_domain_equals_time_convolution():
    """Applying H on the grid must equal circular time conv under CP."""
    fp = FrameParms(n_rb=6)
    cm = ChannelModel(name="EVA", fp=fp)
    taps = cm.draw_taps(jax.random.PRNGKey(1), 1)
    H = cm.freq_response(taps)
    gm = make_grid_map(6, 1)
    rng = np.random.default_rng(0)
    sym = (rng.standard_normal((1, gm.n_data_re))
           + 1j * rng.standard_normal((1, gm.n_data_re))).astype(np.complex64)
    grid = fill_grid(jnp.asarray(sym), gm)
    faded = apply_channel_grid(grid, H, fp)
    t = ofdm.ofdm_modulate(faded, fp)
    rgrid = ofdm.ofdm_demodulate(t, fp)
    # faded grid should survive the OFDM roundtrip exactly
    np.testing.assert_allclose(np.asarray(rgrid), np.asarray(faded), atol=1e-4)


def test_channel_estimation_accuracy():
    """Wiener estimate at high SNR should be close to the true channel."""
    fp = FrameParms(n_rb=25)
    cm = ChannelModel(name="EVA", fp=fp)
    gm = make_grid_map(25, 1)
    key = jax.random.PRNGKey(2)
    B = 8
    taps = cm.draw_taps(key, B)
    H = cm.freq_response(taps)                       # [B, n_sc]
    grid = fill_grid(jnp.zeros((B, gm.n_data_re), jnp.complex64), gm)
    faded = apply_channel_grid(grid, H, fp)
    snr_db = 30.0
    n0 = 10.0 ** (-snr_db / 10.0)
    noise = jnp.sqrt(n0 / 2) * (
        jax.random.normal(key, faded.shape) + 1j * jax.random.normal(key, faded.shape))
    W = jnp.asarray(make_wiener_stack(gm, n0))
    H_hat = estimate_channel(faded + noise, gm, W)   # [B, nsym, n_sc]
    err = np.asarray(jnp.mean(jnp.abs(H_hat[:, 4] - H) ** 2))
    sig = np.asarray(jnp.mean(jnp.abs(H) ** 2))
    assert err / sig < 0.01, err / sig


def test_fading_harq_gain():
    """EVA MCS15 at low SNR: HARQ rounds must strictly reduce BLER."""
    from openair4g_tpu.sim.dlsim import DlsimFadingConfig, DlsimFading
    sim = DlsimFading(DlsimFadingConfig(
        mcs=10, n_rb=6, channel="EVA", batch=32, n_turbo_iter=4,
        n_harq_rounds=3))
    errs, reach = sim.run_snr(6.0, 64)
    bler = errs / np.maximum(reach, 1)
    assert reach[0] == 64
    # HARQ gain: each round improves (allow counting noise on the tail
    # rounds where only a handful of trials remain)
    assert bler[1] < bler[0]
    assert bler[2] <= bler[1] + 0.1 or errs[-1] <= 1


def test_measured_delay_prior_tracks_pdp():
    """channel_est.measure_delay_prior (receiver-side delay-spread
    estimation, no genie knowledge) must recover the channel's actual
    delay-power profile from received pilots within a few percent of
    probability mass (the 'adaptive' estimator prior of VALIDATION §2)."""
    import numpy as np
    from openair4g_tpu.sim.dlsim import DlsimFading, DlsimFadingConfig
    from openair4g_tpu.phy.channel_est import pdp_prior
    from openair4g_tpu.sim.channels import PROFILES
    sim = DlsimFading(DlsimFadingConfig(
        mcs=15, n_rb=25, channel="EVA", n_pdcch_symbols=3, n_rx=2,
        n_harq_rounds=1, batch=16, delay_scale=0.651, est_mode="joint",
        snr_convention="dlsim", est_prior="adaptive"))
    pm = sim._measure_prior(10.0, n_probe=64)
    d, a = PROFILES["EVA"]
    pg = pdp_prior(sim.fp, d, 10.0 ** (0.1 * np.asarray(a)), 0.651)
    # mass concentration matches the true profile
    assert abs(pm[:10].sum() - pg[:10].sum()) < 0.05, (pm[:10], pg[:10])
    assert pm[0] > 0.3                      # dominant first tap found
    # and the sim runs end-to-end with it
    errs, reach = sim.run_snr(10.0, 16)
    assert reach[0] == 16


@pytest.mark.slow
def test_dd_corpus_anchor():
    """Round-5 corpus receiver (est_mode='dd'): test-11-shaped point
    (10 MHz MCS26 EVA 14.6 dB, dlsim convention) must stay at-or-better
    than the reference's 0.337 within 256-trial noise, and DD must not
    be worse than the plain joint estimate."""
    from openair4g_tpu.sim.dlsim import DlsimFading, DlsimFadingConfig
    common = dict(mcs=26, n_rb=50, channel="EVA", n_pdcch_symbols=2,
                  n_rx=2, n_harq_rounds=1, batch=128,
                  snr_convention="dlsim", n_turbo_iter=8)
    sim = DlsimFading(DlsimFadingConfig(est_mode="dd", **common))
    errs, reach = sim.run_snr(14.6, 256)
    bler = errs[0] / max(reach[0], 1)
    assert bler <= 0.337 + 0.09, (errs, reach)   # ref + 3 sigma
