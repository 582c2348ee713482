"""System emulator (oaisim equivalent): abstraction + full-PHY modes,
mobility, scheduling (reference: targets/SIMU/USER/oaisim.c)."""
import numpy as np
import pytest

from openair4g_tpu.sim.oaisim import Oaisim, OaisimConfig, default_bler_table


def test_bler_table_monotone():
    t = default_bler_table(4)
    import jax.numpy as jnp
    s = jnp.asarray(10.0 ** (np.array([-5.0, 0.0, 3.0, 8.0]) / 10.0))
    b = np.asarray(t.lookup(s))
    assert (np.diff(b) <= 1e-9).all(), b
    assert b[0] > 0.9 and b[-1] < 0.01


def test_abstraction_mode_runs_and_separates_geometry():
    """Cell-center UEs must see lower BLER than cell-edge UEs."""
    cfg = OaisimConfig(n_enb=2, n_ue=16, n_rb=6, mcs=4, tx_power_db=40.0,
                       mode="abstraction", speed_mps=0.0, seed=3)
    sim = Oaisim(cfg)
    out = sim.run_frames(20)
    assert out["frames"] == 20
    assert (sim.stats["tb_sent"].sum()) >= 2 * 10 * 20 * 0.9
    # geometry: per-UE SINR ordering should broadly follow distance ratio
    d_serv = np.linalg.norm(
        sim.ue_xy - sim.enb_xy[sim.serving], axis=1)
    near = d_serv < np.median(d_serv)
    sent = np.maximum(sim.stats["tb_sent"], 1)
    bler = sim.stats["tb_err"] / sent
    assert bler[near].mean() <= bler[~near].mean() + 0.05, \
        (bler[near].mean(), bler[~near].mean())


def test_abstraction_high_power_low_bler():
    cfg = OaisimConfig(n_enb=1, n_ue=4, n_rb=6, mcs=0, tx_power_db=60.0,
                       mode="abstraction", speed_mps=0.0, seed=1)
    sim = Oaisim(cfg)
    out = sim.run_frames(10)
    assert out["mean_bler"] < 0.1, out


def test_onoff_traffic_schedules_fewer():
    full = Oaisim(OaisimConfig(n_enb=1, n_ue=4, n_rb=6, traffic="full",
                               seed=2))
    full.run_frames(5)
    onoff = Oaisim(OaisimConfig(n_enb=1, n_ue=4, n_rb=6, traffic="onoff",
                                onoff_p=0.3, seed=2))
    onoff.run_frames(5)
    assert onoff.stats["tb_sent"].sum() < full.stats["tb_sent"].sum()


def test_phy_mode_two_cells():
    """Bit-level two-cell emulation: strong serving links decode."""
    cfg = OaisimConfig(n_enb=2, n_ue=4, n_rb=6, mcs=0, tx_power_db=55.0,
                       mode="phy", channel="AWGN", speed_mps=0.0,
                       n_turbo_iter=4, seed=5)
    sim = Oaisim(cfg)
    out = sim.run_frames(2)
    assert sim.stats["tb_sent"].sum() > 0
    # with 55 dB SNR at d_ref and pathloss exp 3.5 over <= ~750 m,
    # serving links are high-SNR: most TBs must decode
    assert out["mean_bler"] < 0.5, out


def test_pf_mac_in_oaisim():
    cfg = OaisimConfig(n_enb=1, n_ue=6, n_rb=6, mcs=4, tx_power_db=45.0,
                       mode="abstraction", mac="pf", speed_mps=0.0, seed=9)
    sim = Oaisim(cfg)
    out = sim.run_frames(10)
    # PF serves every UE at least once over 100 TTIs
    assert (sim.stats["tb_sent"] > 0).all(), sim.stats["tb_sent"]
