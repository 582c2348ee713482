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


# --------------------------------------------------- HARQ in the emulator

def test_harq_improves_residual_bler_abstraction():
    """At marginal power the 4-round chase-combined residual BLER must be
    well below the 1-round BLER (SINR accumulates across rounds)."""
    base = dict(n_enb=1, n_ue=8, n_rb=6, mcs=10, tx_power_db=24.0,
                mode="abstraction", speed_mps=0.0, seed=11)
    one = Oaisim(OaisimConfig(**base, n_harq_rounds=1))
    one.run_frames(30)
    four = Oaisim(OaisimConfig(**base, n_harq_rounds=4))
    out4 = four.run_frames(30)
    sent1 = np.maximum(one.stats["tb_sent"], 1).sum()
    bler1 = one.stats["tb_err"].sum() / sent1
    sent4 = np.maximum(four.stats["tb_sent"], 1).sum()
    bler4 = four.stats["tb_err"].sum() / sent4
    assert bler1 > 0.2, f"need a marginal operating point, got {bler1}"
    assert out4["retx_total"] > 0
    assert bler4 < bler1 * 0.5, (bler1, bler4)


def test_harq_phy_mode_soft_combining():
    """Bit-level HARQ: at an SNR where single-shot decoding mostly fails,
    soft-buffer chase combining across rounds recovers most TBs."""
    base = dict(n_enb=1, n_ue=2, n_rb=6, mcs=6, tx_power_db=22.0,
                mode="phy", channel="AWGN", speed_mps=0.0,
                n_turbo_iter=4, seed=12)
    one = Oaisim(OaisimConfig(**base, n_harq_rounds=1))
    one.run_frames(4)
    sent1 = np.maximum(one.stats["tb_sent"].sum(), 1)
    bler1 = one.stats["tb_err"].sum() / sent1
    four = Oaisim(OaisimConfig(**base, n_harq_rounds=4))
    four.run_frames(4)
    sent4 = np.maximum(four.stats["tb_sent"].sum(), 1)
    bler4 = four.stats["tb_err"].sum() / sent4
    assert bler1 > 0.3, f"need failures at round 0, got {bler1}"
    assert four.stats["retx"].sum() > 0
    assert bler4 < bler1, (bler1, bler4)


def test_scenario_config_runs():
    """OCG-style JSON scenario -> full emulation run."""
    import json, tempfile, os
    from openair4g_tpu.sim.oaisim import run_scenario
    sc = {"topology": {"n_enb": 2, "n_ue": 6, "cell_spacing_m": 400.0,
                       "ue_speed_mps": 0.0},
          "channel": {"n_rb": 6, "mcs": 4, "model": "EPA",
                      "tx_power_db": 45.0},
          "application": {"traffic": "full"},
          "emulation": {"mode": "abstraction", "mac": "pf",
                        "n_harq_rounds": 4, "n_frames": 5, "seed": 3}}
    out = run_scenario(sc)
    assert out["frames"] == 5
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(sc, f)
        path = f.name
    out2 = run_scenario(path, n_frames=2)
    os.unlink(path)
    assert out2["frames"] == 2


def test_mobility_and_traffic_models():
    """OMG random-waypoint + OTG cbr/poisson models drive the emulator."""
    import numpy as np
    from openair4g_tpu.sim.oaisim import Oaisim, OaisimConfig
    sim = Oaisim(OaisimConfig(n_enb=2, n_ue=4, mobility="rwp",
                              speed_mps=30.0, traffic="cbr", seed=3))
    xy0 = sim.ue_xy.copy()
    out = sim.run_frames(10)
    moved = np.linalg.norm(sim.ue_xy - xy0, axis=1)
    assert moved.mean() > 1.0              # 30 m/s for 0.1 s ~ 3 m
    assert out["frames"] == 10
    static = Oaisim(OaisimConfig(n_enb=1, n_ue=2, mobility="static",
                                 traffic="poisson", seed=3))
    xy0 = static.ue_xy.copy()
    static.run_frames(5)
    assert np.allclose(static.ue_xy, xy0)
