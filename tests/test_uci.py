"""UCI-on-PUSCH: coding, multiplexing maps and end-to-end detection.

Mirrors the reference's test strategy: unit goldens on the coders plus a
link-level run asserting UCI detection and that the data BLER is unaffected
at operating SNR (ulsim.c with -a/-A flags exercises the same paths).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from openair4g_tpu.ops.uci import (
    RM32_BASIS, UciConfig, make_uci_maps, cqi_encode_host, cqi_encode_device,
    cqi_decode, uci1_symbols, uci2_symbols, uci1_decode, uci2_decode,
    uci_multiplex, uci_demultiplex, CS_RI, CS_ACK)
from openair4g_tpu.ops.llr import demap_llr


def test_rm32_basis_is_valid_code():
    # all-ones column 0 (repetition of o0), linearly independent columns
    assert RM32_BASIS.shape == (32, 11)
    assert (RM32_BASIS[:, 0] == 1).all()
    r = np.linalg.matrix_rank(RM32_BASIS.astype(np.float64))
    assert r == 11
    # minimum distance of the (32, 11) punctured RM code must be >= 8
    msgs = ((np.arange(1, 1 << 11)[:, None] >> np.arange(11)) & 1)
    cws = (msgs @ RM32_BASIS.T) % 2
    assert cws.sum(axis=1).min() >= 8


@pytest.mark.parametrize("O", [4, 11, 16])
def test_cqi_encode_roundtrip_noiseless(O):
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(8, O)).astype(np.int32)
    Q = 96
    coded = np.asarray(cqi_encode_device(jnp.asarray(bits), Q))
    # host/device agreement
    for b in range(8):
        np.testing.assert_array_equal(coded[b],
                                      cqi_encode_host(bits[b], Q))
    llr = jnp.asarray(1.0 - 2.0 * coded, jnp.float32) * 4.0
    hat, ok = cqi_decode(llr, O)
    np.testing.assert_array_equal(np.asarray(hat), bits)
    assert np.asarray(ok).all()


def test_uci_dimensioning_and_columns():
    # 25 PRB, QPSK: M=300 subcarriers, 12 data symbols, sum_kr ~ TBS-ish
    m = make_uci_maps(300, 12, 2, 6144, o_cqi=8, o_ri=1, o_ack=2,
                      beta_cqi=2.0, beta_ri=2.0, beta_ack=2.0)
    assert m.G_data + (m.qp_cqi + m.qp_ri) * m.Qm == 12 * 300 * m.Qm
    # RI/ACK sit in the bottom rows of their column sets
    for pos, cs in ((m.ri_pos, CS_RI[True]), (m.ack_pos, CS_ACK[True])):
        syms = pos // 300
        rows = pos % 300
        assert set(np.asarray(syms).tolist()) <= set(cs)
        assert (np.asarray(rows) >= 300 - 1 - len(pos) // 4).all()
    # no overlap between RI and data/CQI; ACK punctures data only
    assert not set(m.ri_pos) & set(m.data_pos)
    assert not set(m.ri_pos) & set(m.cqi_pos)
    assert (~m.data_keep).sum() == m.qp_ack * m.Qm


@pytest.mark.parametrize("Qm", [2, 4, 6])
def test_uci_symbols_decode(Qm):
    o = jnp.asarray([0, 1, 0, 1], jnp.int32)
    sym = uci1_symbols(o, Qm, qp=4)                       # [4, 4]
    llr = demap_llr(sym, 0.1, Qm)[..., :2]
    hat = uci1_decode(llr)
    np.testing.assert_array_equal(np.asarray(hat), np.asarray(o))

    o2 = jnp.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.int32)
    sym2 = uci2_symbols(o2, Qm, qp=6)
    llr2 = demap_llr(sym2, 0.1, Qm)[..., :2]
    hat2 = uci2_decode(llr2)
    np.testing.assert_array_equal(np.asarray(hat2), np.asarray(o2))


def test_multiplex_demultiplex_inverse():
    m = make_uci_maps(36, 12, 2, 600, o_cqi=6, o_ri=1, o_ack=1,
                      beta_cqi=2.0, beta_ri=2.0, beta_ack=2.0)
    B = 2
    rng = np.random.default_rng(1)
    nd = len(m.data_pos)
    data = jnp.asarray(rng.standard_normal((B, nd)) +
                       1j * rng.standard_normal((B, nd)), jnp.complex64)
    cqi = jnp.asarray(np.ones((B, m.qp_cqi)) * (0.7 + 0.7j), jnp.complex64)
    ri = jnp.asarray(np.ones((B, m.qp_ri)) * (0.7 - 0.7j), jnp.complex64)
    ack = jnp.asarray(np.ones((B, m.qp_ack)) * (-0.7 + 0.7j), jnp.complex64)
    y = uci_multiplex(data, cqi, ri, ack, m)
    assert y.shape == (B, 12, 36)
    # fake "LLR grid" carrying the symbols to verify gathers hit the spots
    fake = jnp.stack([y.real, y.imag], axis=-1)           # [B, C, M, 2]
    st = uci_demultiplex(fake, m)
    np.testing.assert_allclose(np.asarray(st["cqi"]).reshape(B, -1, 2)[..., 0],
                               0.7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st["ri"])[..., 1], -0.7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st["ack"])[..., 0], -0.7, atol=1e-6)
    # ACK-punctured data LLRs are zeroed
    d = np.asarray(st["data"]).reshape(B, -1)
    assert (d[:, ~m.data_keep] == 0).all()


def test_ulsim_with_uci_awgn():
    """16QAM PUSCH with CQI+RI+ACK at operating SNR: data decodes, UCI
    detected, per-stream error rates low."""
    from openair4g_tpu.sim.ulsim import Ulsim, UlsimConfig
    cfg = UlsimConfig(mcs=12, n_rb=6, n_rb_alloc=6, channel="AWGN",
                      batch=32, n_turbo_iter=6,
                      uci=UciConfig(o_cqi=8, o_ri=1, o_ack=2))
    sim = Ulsim(cfg)
    errs, reach = sim.run_snr(14.0, 64)
    assert errs[0] <= reach[0] * 0.1, (errs, reach)
    assert sim.uci_errs[0] <= 3, sim.uci_errs    # CQI
    assert sim.uci_errs[1] <= 3, sim.uci_errs    # RI
    assert sim.uci_errs[2] <= 3, sim.uci_errs    # ACK


def test_ulsim_uci_does_not_break_data_only():
    from openair4g_tpu.sim.ulsim import Ulsim, UlsimConfig
    cfg = UlsimConfig(mcs=6, n_rb=6, n_rb_alloc=6, channel="AWGN",
                      batch=32, n_turbo_iter=6)
    sim = Ulsim(cfg)
    errs, reach = sim.run_snr(10.0, 32)
    assert errs[0] == 0, (errs, reach)
