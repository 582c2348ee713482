"""TM3-TM6 spatial multiplexing: precoding algebra, MMSE/IA receivers,
link-level BLER sanity (reference: dlsim -x 3..6 paths)."""
import numpy as np
import pytest
import jax.numpy as jnp

from openair4g_tpu.phy.precoding import (codebook_2tx, cdd_precoders_2tx,
                                         layer_map, precode,
                                         effective_channel)
from openair4g_tpu.phy.mimo_rx import (mmse_detect, mf_dual_stream,
                                       dual_stream_llr)
from openair4g_tpu.ops.llr import demap_llr, map_symbols


def test_codebooks_unitary():
    cb1 = codebook_2tx(1)
    for w in cb1:
        np.testing.assert_allclose(np.linalg.norm(w), 1.0, atol=1e-6)
    cb2 = codebook_2tx(2)
    for w in cb2:
        # total power 1 (columns orthogonal)
        np.testing.assert_allclose((np.abs(w) ** 2).sum(), 1.0, atol=1e-6)
        g = w.conj().T @ w
        np.testing.assert_allclose(g, np.diag(np.diag(g)), atol=1e-6)
    cdd = cdd_precoders_2tx(6)
    assert cdd.shape == (6, 2, 2)
    np.testing.assert_allclose(cdd[0], cdd[2], atol=1e-7)
    assert not np.allclose(cdd[0], cdd[1])


@pytest.mark.parametrize("tm_w", ["cdd", "cb2"])
def test_mmse_detect_recovers_noiseless(tm_w):
    rng = np.random.default_rng(0)
    B, N, R = 3, 64, 2
    s = (rng.choice([-1, 1], (B, N, 2)) +
         1j * rng.choice([-1, 1], (B, N, 2))).astype(np.complex64) / np.sqrt(2)
    W = cdd_precoders_2tx(N) if tm_w == "cdd" else codebook_2tx(2)[1]
    tx = precode(jnp.asarray(s), W)                       # [B, N, P]
    h = (rng.standard_normal((B, R, 2)) +
         1j * rng.standard_normal((B, R, 2))).astype(np.complex64)
    H = np.broadcast_to(h[:, :, None, :], (B, R, N, 2))
    y = jnp.einsum("brnp,bnp->bnr", jnp.asarray(H), tx)
    He = effective_channel(jnp.asarray(H), W)
    x_hat, n0_eff = mmse_detect(y, He, 1e-6)
    np.testing.assert_allclose(np.asarray(x_hat), s, atol=1e-2)
    assert (np.asarray(n0_eff) < 1e-3).all()


def test_dual_stream_llr_degenerates_to_single():
    """With zero interferer correlation the IA LLR equals the plain
    max-log demapper."""
    rng = np.random.default_rng(1)
    B, N = 2, 32
    bits = jnp.asarray(rng.integers(0, 2, (B, N * 4)), jnp.int32)
    s = map_symbols(bits, 4)
    g = jnp.asarray(rng.uniform(0.5, 2.0, (B, N)), jnp.float32)
    n0 = 0.1
    z = g * s                                              # noiseless MF out
    llr_ia = dual_stream_llr(z, jnp.zeros_like(z), g, n0, 4, 2)
    llr_ref = demap_llr(s, n0 / g, 4)
    np.testing.assert_allclose(np.asarray(llr_ia), np.asarray(llr_ref),
                               rtol=1e-4, atol=1e-4)


def test_dual_stream_llr_cancels_interferer():
    """A strong QPSK interferer aligned with the target is resolved by the
    IA demapper but breaks the interference-as-noise demapper."""
    rng = np.random.default_rng(2)
    B, N = 4, 256
    bits = jnp.asarray(rng.integers(0, 2, (B, N * 2)), jnp.int32)
    s0 = map_symbols(bits, 2)
    qpsk = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2)
    s1 = jnp.asarray(qpsk[rng.integers(0, 4, (B, N))], jnp.complex64)
    g = jnp.ones((B, N), jnp.float32)
    rho = jnp.full((B, N), 0.4 + 0.8j, jnp.complex64)
    n0 = 0.01
    noise = jnp.asarray((rng.standard_normal((B, N)) +
                         1j * rng.standard_normal((B, N))) *
                        np.sqrt(n0 / 2), jnp.complex64)
    z = g * s0 + rho * s1 + noise
    llr_ia = dual_stream_llr(z, rho, g, n0, 2, 2).reshape(B, -1)
    hard_ia = (np.asarray(llr_ia) < 0).astype(np.int32)
    ber_ia = (hard_ia != np.asarray(bits)).mean()
    # naive: treat rho*s1 as Gaussian noise
    llr_nv = demap_llr(z / g, (n0 + 0.8) / g, 2).reshape(B, -1)
    ber_nv = ((np.asarray(llr_nv) < 0).astype(np.int32)
              != np.asarray(bits)).mean()
    assert ber_ia < 0.01, ber_ia
    assert ber_nv > 5 * max(ber_ia, 1e-4), (ber_ia, ber_nv)


def test_tm3_link_high_snr():
    from openair4g_tpu.sim.dlsim_sm import DlsimSm, DlsimSmConfig
    sim = DlsimSm(DlsimSmConfig(tm=3, mcs=6, n_rb=6, batch=16,
                                n_turbo_iter=6, perfect_ce=True))
    errs, trials = sim.run_snr(30.0, 16)
    assert errs.sum() == 0, (errs, trials)


def test_tm4_link_estimated_ce():
    from openair4g_tpu.sim.dlsim_sm import DlsimSm, DlsimSmConfig
    sim = DlsimSm(DlsimSmConfig(tm=4, mcs=4, mcs2=4, n_rb=6, pmi=1,
                                batch=16, n_turbo_iter=6))
    errs, trials = sim.run_snr(30.0, 16)
    assert errs.sum() <= 1, (errs, trials)


def test_tm6_closed_loop_rank1():
    from openair4g_tpu.sim.dlsim_sm import DlsimSm, DlsimSmConfig
    sim = DlsimSm(DlsimSmConfig(tm=6, mcs=6, n_rb=6, pmi=2, batch=16,
                                n_turbo_iter=6, perfect_ce=True))
    errs, trials = sim.run_snr(25.0, 16)
    assert errs.sum() == 0, (errs, trials)


def test_tm5_ia_beats_naive():
    from openair4g_tpu.sim.dlsim_sm import DlsimSm, DlsimSmConfig
    common = dict(tm=5, mcs=4, n_rb=6, pmi=0, pmi_interferer=1, batch=32,
                  n_turbo_iter=6, perfect_ce=True)
    sim_ia = DlsimSm(DlsimSmConfig(ia_receiver=True, **common))
    sim_nv = DlsimSm(DlsimSmConfig(ia_receiver=False, **common))
    e_ia, t = sim_ia.run_snr(20.0, 64)
    e_nv, _ = sim_nv.run_snr(20.0, 64)
    assert e_ia.sum() <= e_nv.sum(), (e_ia, e_nv)
    assert e_ia.sum() <= t * 0.25, (e_ia, t)
