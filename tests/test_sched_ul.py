"""UL per-TTI procedures: UE TX (PUSCH+SRS / PUCCH) -> eNB RX, HARQ
feedback bookkeeping (reference: phy_procedures_UE_TX / eNB_RX,
process_HARQ_feedback)."""
import numpy as np
import jax
import jax.numpy as jnp

from openair4g_tpu.sched import UeUlConfig, UeTx, EnbRx, HarqFeedbackState
from openair4g_tpu.phy.srs import SrsConfig


def _awgn(key, t, n0):
    nr = jax.random.normal(key, t.shape + (2,))
    return t + jnp.sqrt(n0 / 2) * (nr[..., 0] + 1j * nr[..., 1])


def test_pusch_with_srs_roundtrip():
    cfg = UeUlConfig(n_rb=25, mcs=6, n_rb_alloc=20,
                     srs=SrsConfig(n_rb=25, srs_bw_rb=20), n_turbo_iter=6)
    tx = UeTx(cfg)
    rx = EnbRx(tx)
    B = 8
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    tb = jax.random.bernoulli(k1, 0.5,
                              (B, tx.ulsch.tbs)).astype(jnp.int32)
    # SRS shortens the grant: 11 data symbols
    assert len(tx.pm.data_syms) == 11
    wave = tx.pusch_subframe(tb)
    n0 = 10.0 ** (-12 / 10.0)
    rxw = _awgn(k2, wave, n0)
    tb_hat, ok, srs = rx.receive_pusch(rxw, jnp.float32(n0))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(tb_hat), np.asarray(tb))
    _, snr_db, t_off = srs
    assert (np.asarray(snr_db) > 5).all()
    assert (np.abs(np.asarray(t_off)) < 2).all()


def test_pusch_without_srs_uses_12_symbols():
    cfg = UeUlConfig(n_rb=6, mcs=6, n_rb_alloc=6, n_turbo_iter=4)
    tx = UeTx(cfg)
    assert len(tx.pm.data_syms) == 12
    rx = EnbRx(tx)
    B = 4
    tb = jax.random.bernoulli(jax.random.PRNGKey(1), 0.5,
                              (B, tx.ulsch.tbs)).astype(jnp.int32)
    wave = tx.pusch_subframe(tb)
    tb_hat, ok, srs = rx.receive_pusch(wave, jnp.float32(1e-4))
    assert np.asarray(ok).all() and srs is None


def test_pucch_1a_detection():
    cfg = UeUlConfig(n_rb=25, pucch_rb=24)
    tx = UeTx(cfg)
    rx = EnbRx(tx)
    d = jnp.asarray([1.0, -1.0, 1.0, -1.0], jnp.complex64)   # ACK/NACK
    wave = tx.pucch_subframe(d)
    n0 = 10.0 ** (-6 / 10.0)
    rxw = _awgn(jax.random.PRNGKey(2), wave, n0)
    z = rx.receive_pucch(rxw, n0)
    signs = np.sign(np.asarray(z).real)
    np.testing.assert_array_equal(signs, [1, -1, 1, -1])


def test_harq_feedback_bookkeeping():
    st = HarqFeedbackState(max_rounds=4, max_consecutive_errors=5)
    assert st.feedback(True)["action"] == "new_tx"
    r = st.feedback(False)
    assert r["action"] == "retx" and r["rv"] == 2
    assert st.feedback(False)["rv"] == 3
    assert st.feedback(False)["rv"] == 1
    assert st.feedback(False)["action"] == "new_tx"   # 4 rounds exhausted
    assert st.feedback(False)["action"] == "dropped"  # 5th consecutive error
    assert st.dropped
    assert st.feedback(True)["action"] == "dropped"   # stays dropped


def test_tdd_patterns():
    from openair4g_tpu.phy.tdd import (TDD_PATTERNS, subframe_direction,
                                       dl_subframes, ul_subframes,
                                       special_symbols, direction_mask)
    for cfg, pat in TDD_PATTERNS.items():
        assert len(pat) == 10
        assert pat[0] == "D" and pat[1] == "S" and pat[2] == "U"
        assert set(dl_subframes(cfg)) | set(ul_subframes(cfg)) | \
            {i for i, c in enumerate(pat) if c == "S"} == set(range(10))
    assert subframe_direction(None, 3) == "D"          # FDD
    assert subframe_direction(1, 9) == "D"
    s = special_symbols(7)
    assert s["dwpts"] + s["gp"] + s["uppts"] == 14
    m = direction_mask(0)
    assert list(m) == [0, 2, 1, 1, 1, 0, 2, 1, 1, 1]


# ------------------------------------------- PDCCH-granted PUSCH loop ----

def test_ul_grant_loop_good_snr():
    """Format-0 grant over clean DL -> UE transmits granted PUSCH -> eNB
    decodes: no DCI misses, no TB errors at high SNR."""
    from openair4g_tpu.sim.ulgrantsim import UlGrantSim, UlGrantConfig
    sim = UlGrantSim(UlGrantConfig(n_rb=25, mcs_ul=6, rb_offset=2,
                                   n_prb=12, n_harq_rounds=1, batch=8,
                                   n_turbo_iter=4))
    dci_errs, errs, reach = sim.run_snr(snr_dl=20.0, snr_ul=20.0,
                                        n_frames=8)
    assert dci_errs == 0
    assert errs[0] == 0 and reach[0] == 8


def test_ul_grant_dci_miss_silences_ue():
    """At hopeless DL SNR the UE misses the grant and stays silent: every
    trial is a DCI error and the TB never decodes (DTX)."""
    from openair4g_tpu.sim.ulgrantsim import UlGrantSim, UlGrantConfig
    sim = UlGrantSim(UlGrantConfig(n_rb=25, mcs_ul=6, rb_offset=2,
                                   n_prb=12, n_harq_rounds=1, batch=8,
                                   n_turbo_iter=4))
    dci_errs, errs, _ = sim.run_snr(snr_dl=-30.0, snr_ul=20.0, n_frames=8)
    assert dci_errs == 8
    assert errs[0] == 8


def test_ul_grant_harq_recovers_marginal_snr():
    """rv-cycling HARQ: at marginal UL SNR later rounds clear errors that
    round 0 leaves."""
    from openair4g_tpu.sim.ulgrantsim import UlGrantSim, UlGrantConfig
    sim = UlGrantSim(UlGrantConfig(n_rb=25, mcs_ul=10, rb_offset=0,
                                   n_prb=20, n_harq_rounds=3, batch=16,
                                   n_turbo_iter=5))
    dci_errs, errs, reach = sim.run_snr(snr_dl=20.0, snr_ul=-2.5,
                                        n_frames=16)
    assert dci_errs == 0
    assert errs[0] > 0, "expected round-0 errors at -2.5 dB"
    assert errs[-1] < errs[0], "HARQ rounds must recover some trials"
