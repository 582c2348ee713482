"""PMCH/MBSFN: RE map, RS, extended-CP chain, SFN channel (reference:
pmch.c, lte_gold_mbsfn.c, mbmssim.c)."""
import numpy as np
import jax.numpy as jnp

from openair4g_tpu.phy.pmch import (make_mbsfn_map, mbsfn_rs_values,
                                    MBSFN_RS_SYMS, mbsfn_fill_grid,
                                    mbsfn_estimate_channel)
from openair4g_tpu.sim.mbmssim import Mbmssim, MbmssimConfig


def test_mbsfn_map_geometry():
    mm = make_mbsfn_map(25)
    assert not mm.fp.normal_cp
    assert mm.fp.symbols_per_subframe == 12
    # data region starts at symbol 2
    assert mm.data_sym.min() == 2
    # RS comb spacing 2 on its symbols; data + RS partition the region
    n_rs = 3 * 6 * 25
    assert len(mm.rs_sym) == n_rs
    assert mm.n_data_re == 10 * 12 * 25 - n_rs
    rs_set = set(zip(mm.rs_sym.tolist(), mm.rs_sc.tolist()))
    data_set = set(zip(mm.data_sym.tolist(), mm.data_sc.tolist()))
    assert not rs_set & data_set
    np.testing.assert_allclose(np.abs(mm.rs_val), 1.0, atol=1e-6)


def test_mbsfn_rs_distinct_per_symbol_and_id():
    a = mbsfn_rs_values(0, 1, 2, 25)
    b = mbsfn_rs_values(0, 1, 6, 25)
    c = mbsfn_rs_values(5, 1, 2, 25)
    assert not np.allclose(a, b)
    assert not np.allclose(a, c)


def test_mbsfn_channel_estimation_flat():
    mm = make_mbsfn_map(6)
    B = 2
    grid = mbsfn_fill_grid(jnp.zeros((B, mm.n_data_re), jnp.complex64), mm)
    h_true = 0.7 - 0.7j
    rgrid = grid * h_true
    H = mbsfn_estimate_channel(rgrid, mm, 1e-3)
    np.testing.assert_allclose(np.asarray(H), h_true, atol=0.05)


def test_mbms_link_awgn():
    sim = Mbmssim(MbmssimConfig(mcs=4, n_rb=6, n_sfn_cells=1,
                                max_delay_frac=0.0, batch=16,
                                n_turbo_iter=6, perfect_ce=True))
    # single cell, no delay spread => Rayleigh flat; high SNR decodes
    errs, trials = sim.run_snr(25.0, 16)
    assert errs <= 1, (errs, trials)


def test_mbms_sfn_composite_estimated_ce():
    """3-cell SFN with delays most of the extended CP: the dense MBSFN RS
    must track the highly frequency-selective composite."""
    sim = Mbmssim(MbmssimConfig(mcs=4, n_rb=25, n_sfn_cells=3,
                                max_delay_frac=0.6, batch=16,
                                n_turbo_iter=6))
    errs, trials = sim.run_snr(20.0, 16)
    assert errs <= trials * 0.5, (errs, trials)
