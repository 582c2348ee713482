"""Full-chain subframe procedures: eNB TX (all channels) -> UE RX
(CFI/DCI/PHICH/PDSCH), plus cold start (reference: phy_procedures_eNB_TX /
phy_procedures_UE_RX + initial_sync, BASELINE config 4)."""
import numpy as np
import pytest
import jax.numpy as jnp

from openair4g_tpu.sched.enb_tx import CellConfig, EnbTx
from openair4g_tpu.sched.ue_rx import UeRx
from openair4g_tpu.sim.fullsim import FullChainSim, FullsimConfig


def test_grid_channels_disjoint():
    """PDSCH allocation, pilots, PCFICH, PHICH and PDCCH never collide."""
    cell = CellConfig(n_rb=25, rb_start=4, n_prb=12, mcs=6)
    enb = EnbTx(cell)
    sets = {}
    sets["pdsch"] = set(zip(enb.am.data_sym.tolist(),
                            enb.am.data_sc.tolist()))
    sets["pilot"] = set(zip(enb.gm.pilot_sym.tolist(),
                            enb.gm.pilot_sc.tolist()))
    sets["pcfich"] = set(zip(enb.crm.pcfich_sym.tolist(),
                             enb.crm.pcfich_sc.tolist()))
    sets["pdcch"] = set(zip(enb.crm.pdcch_sym.tolist(),
                            enb.crm.pdcch_sc.tolist()))
    sets["phich"] = set((0, int(s)) for s in enb.phich_sc[0])
    names = list(sets)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            assert not sets[a] & sets[b], (a, b, sets[a] & sets[b])


def test_single_subframe_receive_noiseless():
    """UeRx.receive on a clean subframe: CFI, DCI, PHICH and TB all good."""
    import jax
    cell = CellConfig(n_rb=25, rb_start=2, n_prb=20, mcs=6)
    enb = EnbTx(cell)
    ue = UeRx(cell, n_turbo_iter=4)
    B = 4
    key = jax.random.PRNGKey(0)
    tb = jax.random.bernoulli(key, 0.5,
                              (B, ue.codec.cfg.tbs)).astype(jnp.int32)
    from openair4g_tpu.ops.gold import scramble_bits
    from openair4g_tpu.ops.llr import map_symbols
    e = scramble_bits(ue.codec.encode(tb), ue.scr_seq)
    sym = map_symbols(e, ue.codec.cfg.Qm).astype(jnp.complex64)
    ack = jnp.asarray([0, 1, 1, 0], jnp.int32)
    grid = enb.data_subframe(sym, ack_bits=ack)
    from openair4g_tpu.phy import ofdm
    n0 = 1e-4
    rx = ofdm.ofdm_modulate(grid, enb.fp)
    rgrid = ofdm.ofdm_demodulate(rx, enb.fp)
    out = ue.receive(rgrid, jnp.float32(n0),
                     jnp.asarray(ue.make_wiener(n0)))
    assert (np.asarray(out["cfi_hat"]) == cell.n_pdcch).all()
    assert np.asarray(out["dci_found"]).all()
    np.testing.assert_array_equal(np.asarray(out["dci_payload"][0]),
                                  enb.dci_payload)
    assert np.asarray(out["tb_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["tb"]), np.asarray(tb))
    np.testing.assert_array_equal(np.asarray(out["phich_ack"]),
                                  np.asarray(ack, bool))
    assert (np.asarray(out["meas"]["rsrp"]) > 0.5).all()


def test_fullsim_awgn_operating_point():
    sim = FullChainSim(FullsimConfig(n_rb=25, mcs=4, channel="AWGN",
                                     n_harq_rounds=1, batch=16,
                                     n_turbo_iter=6))
    errs, reach = sim.run_snr(6.0, 32)
    assert errs[0] == 0, (errs, reach)
    assert sim.dci_miss == 0
    assert sim.phich_err == 0


def test_fullsim_harq_gain_fading():
    sim = FullChainSim(FullsimConfig(n_rb=25, mcs=10, channel="EVA",
                                     n_harq_rounds=3, batch=32,
                                     n_turbo_iter=6))
    errs, reach = sim.run_snr(6.0, 32)
    # HARQ must recover most round-0 failures
    assert reach[0] == 32
    assert errs[-1] <= errs[0], (errs, reach)


def test_cold_start_sync_and_mib():
    sim = FullChainSim(FullsimConfig(n_rb=25, mcs=4, batch=8))
    r = sim.cold_start(snr_db=10.0, batch=8)
    assert r["sync_rate"] >= 0.9, r
    assert r["mib_rate"] >= 0.9, r
    assert r["mib"]["n_rb"] == 25
