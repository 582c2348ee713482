"""Tests for the conv codec, PSS/SSS cell search, and PBCH blind decode.

Mirrors the reference's test strategy (SURVEY.md §4): codec goldens +
link-level detection/BLER operating points (syncsim/pbchsim equivalents).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openair4g_tpu.ops.convcode import (conv_encode_host, conv_encode_device,
                                        viterbi_decode)
from openair4g_tpu.phy.sync import (pss_sequence, sss_sequence, _m0_m1,
                                    pss_time_replica)
from openair4g_tpu.phy.pbch import (pack_mib, unpack_mib, pbch_frame_symbols,
                                    pbch_blind_decode)


class TestConvCode:
    def test_host_device_encode_agree(self):
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, size=(4, 40))
        d_h = np.stack([conv_encode_host(b) for b in bits])
        d_d = np.asarray(conv_encode_device(jnp.asarray(bits)))
        assert np.array_equal(d_h, d_d)

    def test_tail_biting(self):
        """First output bits depend on the last input bits (circular state)."""
        b0 = np.zeros(40, np.int64)
        b1 = np.zeros(40, np.int64)
        b1[-1] = 1
        assert not np.array_equal(conv_encode_host(b0)[:, 0],
                                  conv_encode_host(b1)[:, 0])

    def test_viterbi_noiseless_and_noisy(self):
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, size=(16, 40))
        d = np.stack([conv_encode_host(b) for b in bits]).astype(np.float32)
        llr = jnp.asarray(1.0 - 2.0 * d)
        dec = np.asarray(viterbi_decode(llr, 40))
        assert np.array_equal(dec, bits)
        # 2 dB Es/N0 on rate-1/3 should decode clean at K=40
        n0 = 10 ** (-0.2)
        y = (1 - 2 * d) + rng.normal(scale=np.sqrt(n0 / 2), size=d.shape)
        dec = np.asarray(viterbi_decode(jnp.asarray(4 * y / n0), 40))
        assert (dec != bits).mean() < 0.01


class TestSyncSequences:
    def test_pss_is_unit_modulus_zc(self):
        for nid2 in range(3):
            d = pss_sequence(nid2)
            assert d.shape == (62,)
            assert np.allclose(np.abs(d), 1.0, atol=1e-6)

    def test_pss_cross_correlation_low(self):
        d0, d1 = pss_sequence(0), pss_sequence(1)
        auto = abs(np.vdot(d0, d0))
        cross = abs(np.vdot(d0, d1))
        assert cross < 0.3 * auto

    def test_sss_unique_over_nid1(self):
        seqs = {tuple(np.real(sss_sequence(n, 0, False)).astype(int))
                for n in range(168)}
        assert len(seqs) == 168

    def test_m0_m1_spec_values(self):
        # 36.211 Table 6.11.2.1-1 spot checks
        assert _m0_m1(0) == (0, 1)
        assert _m0_m1(29) == (29, 30)
        assert _m0_m1(30) == (0, 2)

    def test_time_replica_unit_energy(self):
        t = pss_time_replica(0, 512)
        assert abs(np.linalg.norm(t) - 1.0) < 1e-5


class TestCellSearch:
    def test_detects_cell_at_moderate_snr(self):
        from openair4g_tpu.sim.syncsim import Syncsim, SyncsimConfig
        sim = Syncsim(SyncsimConfig(n_rb=6, nid1=11, nid2=2, batch=16))
        r = sim.run_snr(3.0, n_batches=1)
        assert r["det_rate"] >= 0.9
        assert r["timing_err_rate"] <= 0.1

    def test_cfo_estimate(self):
        from openair4g_tpu.sim.syncsim import Syncsim, SyncsimConfig
        sim = Syncsim(SyncsimConfig(n_rb=6, batch=16, cfo_scs=0.2))
        r = sim.run_snr(10.0, n_batches=1)
        assert abs(r["mean_abs_cfo"] - 0.2) < 0.07


class TestPbch:
    def test_mib_roundtrip(self):
        mib = pack_mib(50, sfn=444, phich_dur=1, phich_res=2)
        out = unpack_mib(mib)
        assert out["n_rb"] == 50
        assert out["sfn_msb8"] == (444 >> 2) & 0xFF
        assert out["phich_dur"] == 1 and out["phich_res"] == 2

    @pytest.mark.parametrize("phase", [0, 3])
    @pytest.mark.parametrize("n_ant", [1, 2])
    def test_blind_decode_noiseless(self, phase, n_ant):
        nid = 101
        mib = pack_mib(25, sfn=8)
        s = pbch_frame_symbols(mib, nid, phase, n_ant=n_ant)
        llr = np.empty(480, np.float32)
        llr[0::2] = s.real * 8
        llr[1::2] = s.imag * 8
        ok, mib_hat, ph, ant = pbch_blind_decode(
            jnp.asarray(np.tile(llr, (2, 1))), nid)
        assert np.asarray(ok).all()
        assert (np.asarray(ph) == phase).all()
        assert (np.asarray(ant) == n_ant).all()
        assert np.array_equal(np.asarray(mib_hat)[0], mib)

    def test_pbchsim_operating_point(self):
        from openair4g_tpu.sim.pbchsim import Pbchsim, PbchsimConfig
        sim = Pbchsim(PbchsimConfig(n_rb=25, batch=32, frame_phase=2))
        r = sim.run_snr(-2.0, n_batches=1)
        assert r["bler"] <= 0.1
        r = sim.run_snr(-12.0, n_batches=1)
        assert r["bler"] >= 0.9
