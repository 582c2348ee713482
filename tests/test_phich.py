"""PHICH spreading/despreading tests."""
import numpy as np
import jax.numpy as jnp

from openair4g_tpu.phy.phich import (phich_group_tx, phich_group_rx,
                                     phich_reg_positions, _W)


class TestPhich:
    def test_sequences_orthogonal_in_re(self):
        """All 8 sequences separate in the real part of the correlation."""
        for on in range(8):
            acks = -np.ones(8, int)
            acks[on] = 1
            tx = phich_group_tx(acks, nid_cell=3, ns=8)
            z = np.asarray(phich_group_rx(
                jnp.asarray(tx[None, :] * np.sqrt(2)), 3, 8))[0]
            re = np.real(z)
            assert re[on] > 0.9
            off = np.delete(re, on)
            assert np.abs(off).max() < 0.05

    def test_all_users_mixed(self):
        acks = np.array([1, 0, 1, 1, 0, 0, 1, 0])
        tx = phich_group_tx(acks, 7, 4)
        z = np.asarray(phich_group_rx(
            jnp.asarray(tx[None, :] * np.sqrt(2)), 7, 4))[0]
        assert np.array_equal((np.real(z) > 0).astype(int), acks)

    def test_noisy_operating_point(self):
        acks = np.array([1, 0, 1, 1, 0, 0, 1, 0])
        tx = phich_group_tx(acks, 7, 4)
        rng = np.random.default_rng(0)
        n0 = 1.0
        noise = (rng.normal(size=(256, 12)) + 1j * rng.normal(
            size=(256, 12))) * np.sqrt(n0 / 2)
        z = np.asarray(phich_group_rx(
            jnp.asarray(tx[None, :] * np.sqrt(2) + noise), 7, 4))
        errs = ((np.real(z) > 0).astype(int) != acks).sum()
        assert errs <= 4   # 12-chip spreading: ~10.8 dB gain at 0 dB/RE

    def test_reg_positions_disjoint(self):
        regs = phich_reg_positions(25, 7, n_group=3)
        assert regs.shape == (3, 12)
        flat = regs.flatten().tolist()
        assert len(set(flat)) == len(flat)
        from openair4g_tpu.phy.control_region import (
            _pcfich_reg_indices, _regs_in_symbol)
        from openair4g_tpu.config import FrameParms
        fp = FrameParms(n_rb=25, n_id_cell=7)
        pc = {sc for i in _pcfich_reg_indices(fp)
              for sc in _regs_in_symbol(fp, 0)[int(i)]}
        assert not (set(flat) & pc), "PHICH collides with PCFICH"
