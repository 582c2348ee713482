"""High-Doppler (intra-subframe fade) validation anchors.

Reference parity: the BLER_SIMULATIONS/bler_{66..550}.m speed corpus and
the high-speed estimator mode of lte_dl_channel_estimation.c:643-665.
The channel helper draws per-OFDM-symbol tap states with the exact Jakes
autocorrelation across the 14 symbol centers.
"""
import numpy as np
import pytest


def test_jakes_symbol_correlation_matrix():
    from openair4g_tpu.sim.channels import (jakes_symbol_corr_sqrt,
                                            symbol_center_times,
                                            bessel_j0)
    from openair4g_tpu.config import FrameParms
    fp = FrameParms(n_rb=25)
    t = symbol_center_times(fp)
    assert len(t) == 14 and abs(t[-1] - 0.000966) < 5e-5
    L = jakes_symbol_corr_sqrt(25, 300.0)
    R = L @ L.T
    # diag ~ 1 (unit marginal variance) and R[0,13] = J0(2 pi fd dt)
    assert np.allclose(np.diag(R), 1.0, atol=1e-5)
    want = bessel_j0(2 * np.pi * 300.0 * (t[13] - t[0]))
    assert abs(R[0, 13] - want) < 1e-5


def test_timevar_draw_marginals_match_static():
    """Each symbol's marginal tap statistics equal draw_taps (power per
    tap = amps), while symbols decorrelate per Jakes."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from openair4g_tpu.sim.channels import (ChannelModel,
                                            draw_taps_timevar, bessel_j0,
                                            symbol_center_times)
    from openair4g_tpu.config import FrameParms
    fp = FrameParms(n_rb=25)
    cm = ChannelModel(name="EVA", fp=fp)
    keys = jax.random.split(jax.random.PRNGKey(0), 2048)
    taps = np.asarray(draw_taps_timevar(cm, keys, 2048, 300.0))
    # per-tap power at each symbol ~ amps
    p = np.mean(np.abs(taps) ** 2, axis=0)          # [nsym, T]
    assert np.allclose(p.sum(axis=1), 1.0, atol=0.1)
    assert np.allclose(p, cm.amps[None, :], atol=0.05)
    # time correlation between symbol 0 and 13 ~ J0 (sum over taps =
    # total-power-normalized channel correlation)
    t = symbol_center_times(fp)
    c = np.sum(taps[:, 0] * np.conj(taps[:, 13]), axis=-1).mean().real
    want = bessel_j0(2 * np.pi * 300.0 * (t[13] - t[0]))
    assert abs(c - want) < 0.05


@pytest.mark.slow
def test_doppler_estimator_crossover_anchor():
    """The reference keeps a dedicated high-speed estimator because the
    quasi-static one collapses with speed. Anchor at 300 Hz / 11 dB
    MCS10 EVA (measured r5: interp ~0.02, joint ~0.22)."""
    from openair4g_tpu.sim.dlsim import DlsimFading, DlsimFadingConfig
    blers = {}
    for mode in ("interp", "joint"):
        sim = DlsimFading(DlsimFadingConfig(
            mcs=10, n_rb=25, channel="EVA", n_harq_rounds=1,
            est_mode=mode, intra_doppler_hz=300.0, batch=128,
            n_turbo_iter=5))
        errs, reach = sim.run_snr(11.0, 256)
        blers[mode] = errs[0] / max(reach[0], 1)
    assert blers["interp"] < 0.08, blers
    assert blers["joint"] > 3 * blers["interp"], blers


def test_prach_restricted_set_high_doppler():
    """Restricted-set detection through the sample-stream path survives a
    400 Hz offset (the regime 36.211 §5.7.2's high-speed flag exists
    for)."""
    from openair4g_tpu.sim.prachsim import Prachsim, PrachsimConfig
    sim = Prachsim(PrachsimConfig(root_u=22, ncs=22, high_speed=True,
                                  time_domain=True, max_delay=8,
                                  batch=32, cfo_hz=400.0))
    r = sim.run_snr(-6.0, n_batches=2)
    assert r["det_rate"] >= 0.95, r
    assert r["false_per_trial"] <= 0.05, r
