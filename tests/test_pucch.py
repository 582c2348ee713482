"""Tests for PUCCH formats 1a/2 and the (20, A) block code."""
import numpy as np
import jax.numpy as jnp

from openair4g_tpu.phy.pucch import (ncs_cell, pucch1_slot_symbols,
                                     pucch1_detect, rm20_encode, rm20_decode,
                                     RM20_BASIS, _W4, _W3)


class TestSequences:
    def test_ncs_cell_range_and_determinism(self):
        t = ncs_cell(17)
        assert t.shape == (20, 7)
        assert (t >= 0).all() and (t < 256).all()
        assert np.array_equal(t, ncs_cell(17))
        assert not np.array_equal(t, ncs_cell(18))

    def test_covers_orthogonal(self):
        assert np.allclose(_W4 @ _W4.T, 4 * np.eye(3))
        assert np.allclose(_W3 @ _W3.conj().T, 3 * np.eye(3))

    def test_resource_separation(self):
        """Two UEs on different (n_cs, n_oc) resources don't interfere."""
        d0, r0 = pucch1_slot_symbols(0, 4, n_cs1=0, n_oc=0, d=1.0)
        for n_cs1, n_oc in ((3, 0), (0, 1), (6, 2)):
            d1, r1 = pucch1_slot_symbols(0, 4, n_cs1=n_cs1, n_oc=n_oc, d=1.0)
            xc = abs(np.vdot(d0, d1))
            assert xc < 0.05 * abs(np.vdot(d0, d0)), (n_cs1, n_oc, xc)

    def test_detect_noiseless(self):
        for d in (1.0, -1.0):
            data, rs = pucch1_slot_symbols(3, 8, 2, 1, d)
            z, h2 = pucch1_detect(jnp.asarray(data[None]),
                                  jnp.asarray(rs[None]), 3, 8, 2, 1)
            assert np.sign(np.real(np.asarray(z)[0])) == np.sign(d)


class TestRm20:
    def test_linearity(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            a = rng.integers(0, 2, 13)
            b = rng.integers(0, 2, 13)
            assert np.array_equal(
                rm20_encode((a + b) % 2),
                (rm20_encode(a) + rm20_encode(b)) % 2)

    def test_min_distance(self):
        """(20,13) subcode distances: all nonzero messages produce weight>=4
        codewords (the spec code's dmin); basis is full rank."""
        msgs = ((np.arange(1, 1 << 13)[:, None] >> np.arange(13)) & 1)
        cw = (msgs @ RM20_BASIS.T.astype(np.int64)) % 2
        wmin = cw.sum(axis=1).min()
        assert wmin >= 4
        assert np.linalg.matrix_rank(RM20_BASIS.astype(float)) == 13

    def test_decode_roundtrip(self):
        rng = np.random.default_rng(1)
        for A in (1, 4, 8, 11):
            a = rng.integers(0, 2, A)
            b = rm20_encode(a).astype(np.float32)
            llr = jnp.asarray((1.0 - 2.0 * b)[None, :] * 5.0)
            out = np.asarray(rm20_decode(llr, A))[0]
            assert np.array_equal(out, a), A


class TestPucchsim:
    def test_format1a_operating_point(self):
        from openair4g_tpu.sim.pucchsim import Pucchsim, PucchsimConfig
        sim = Pucchsim(PucchsimConfig(fmt="1a", batch=128))
        r = sim.run_snr(-8.0, n_batches=1)
        assert r["err_rate"] <= 0.02
        r = sim.run_snr(-20.0, n_batches=1)
        assert r["err_rate"] >= 0.1

    def test_format2_operating_point(self):
        from openair4g_tpu.sim.pucchsim import Pucchsim, PucchsimConfig
        sim = Pucchsim(PucchsimConfig(fmt="2", batch=128))
        r = sim.run_snr(-2.0, n_batches=1)
        assert r["err_rate"] <= 0.05


def test_pucchsim_formats_2a_2b():
    import os
    from openair4g_tpu.sim.pucchsim import Pucchsim, PucchsimConfig
    for fmt in ("2a", "2b"):
        sim = Pucchsim(PucchsimConfig(fmt=fmt, batch=128))
        r = sim.run_snr(0.0, n_batches=1)
        assert r["err_rate"] < 0.05, (fmt, r)
