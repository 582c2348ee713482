"""TM7 beamforming with UE-specific RS, port 5 (reference:
lte_dl_uespec.c + dlsch_modulation.c TM7 path)."""
import numpy as np
import jax
import jax.numpy as jnp

from openair4g_tpu.phy.uespec import (make_uespec_map, ue_rs_values,
                                      tm7_fill_ports, tm7_estimate,
                                      UE_RS_SYMS)
from openair4g_tpu.phy import ofdm


def test_map_geometry():
    um = make_uespec_map(25, rb_start=2, n_prb=8, rnti=0x1234)
    # 3 RS REs per PRB per RS symbol, inside the allocation
    assert len(um.rs_sym) == 4 * 3 * 8
    assert (um.rs_sc >= 24).all() and (um.rs_sc < 24 + 96).all()
    rs = set(zip(um.rs_sym.tolist(), um.rs_sc.tolist()))
    data = set(zip(um.data_sym.tolist(), um.data_sc.tolist()))
    assert not rs & data
    np.testing.assert_allclose(np.abs(um.rs_val), 1.0, atol=1e-6)


def test_rs_depends_on_rnti_and_cell():
    a = ue_rs_values(0x1111, 0, 7, 3, 8)
    b = ue_rs_values(0x2222, 0, 7, 3, 8)
    c = ue_rs_values(0x1111, 5, 7, 3, 8)
    assert not np.allclose(a, b)
    assert not np.allclose(a, c)


def test_tm7_beamformed_link():
    """2-TX arbitrary beam, flat channel: the UE-RS channel estimate must
    recover the *effective* beamformed channel and QPSK data must demap."""
    um = make_uespec_map(25, rb_start=0, n_prb=10, rnti=0x77)
    fp = um.fp
    B = 4
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 4, (B, um.n_data_re))
    qpsk = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j],
                    np.complex64) / np.sqrt(2)
    sym = jnp.asarray(qpsk[bits])
    # random beams (unit norm) and a random flat 1x2 channel per trial
    w = rng.standard_normal((B, 2)) + 1j * rng.standard_normal((B, 2))
    w = (w / np.linalg.norm(w, axis=1, keepdims=True)).astype(np.complex64)
    ports = tm7_fill_ports(sym, um, jnp.asarray(w))       # [B, 2, 14, F]
    h = (rng.standard_normal((B, 2)) + 1j * rng.standard_normal((B, 2))
         ).astype(np.complex64) / np.sqrt(2)
    grid_rx = jnp.einsum("bp,bpsf->bsf", jnp.asarray(h), ports)
    t = ofdm.ofdm_modulate(grid_rx.reshape(B, 14, fp.n_fft), fp)
    n0 = 1e-3
    key = jax.random.PRNGKey(1)
    nr = jax.random.normal(key, t.shape + (2,))
    rx = t + jnp.sqrt(n0 / 2) * (nr[..., 0] + 1j * nr[..., 1])
    rgrid = ofdm.ofdm_demodulate(rx, fp)

    h_eff_true = np.einsum("bp,bp->b", h, w)              # scalar per trial
    h_hat = tm7_estimate(rgrid, um, n0)
    err = np.abs(np.asarray(h_hat) - h_eff_true[:, None]).max()
    assert err < 0.1, err

    y = rgrid[:, jnp.asarray(um.data_sym), jnp.asarray(um.data_bin)]
    g = jnp.maximum(jnp.abs(h_hat) ** 2, 1e-9)
    x = np.asarray(y * jnp.conj(h_hat) / g)
    hard = (x.real < 0).astype(int) * 2 + (x.imag < 0).astype(int)
    # map back: bits index b0b1 with table [++, +-, -+, --]
    expect = np.asarray(bits)
    got = np.zeros_like(expect)
    got[(x.real > 0) & (x.imag > 0)] = 0
    got[(x.real > 0) & (x.imag < 0)] = 1
    got[(x.real < 0) & (x.imag > 0)] = 2
    got[(x.real < 0) & (x.imag < 0)] = 3
    ser = (got != expect).mean()
    assert ser < 1e-3, ser


# ------------------------------------------------------------- TM8 -------

def test_tm8_map_geometry():
    from openair4g_tpu.phy.uespec import make_tm8_map, TM8_RS_SYMS
    tm = make_tm8_map(25, rb_start=2, n_prb=8)
    assert tm.rs_val.shape == (2, 3 * 8)
    assert (tm.rs_bin.shape[0]) == 3 * 8
    rs = set()
    for sym in TM8_RS_SYMS:
        rs |= set((sym, int(b)) for b in tm.rs_bin)
    data = set(zip(tm.data_sym.tolist(),
                   tm.fp.sc_to_bin(tm.data_sc).tolist()))
    assert not rs & data


def test_tm8_dual_layer_link():
    """2 layers on ports 7/8 through distinct beams over a flat 2x2
    channel: OCC despread must separate the per-layer effective channels
    and MMSE detection must recover both QPSK streams."""
    import jax
    from openair4g_tpu.phy.uespec import (make_tm8_map, tm8_fill_ports,
                                          tm8_estimate)
    from openair4g_tpu.phy.mimo_rx import mmse_detect
    tm = make_tm8_map(25, rb_start=0, n_prb=10)
    fp = tm.fp
    B, R, P = 3, 2, 2
    rng = np.random.default_rng(3)
    qpsk = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j],
                    np.complex64) / np.sqrt(2)
    bits = rng.integers(0, 4, (B, 2, tm.n_data_re))
    layers = jnp.asarray(qpsk[bits])
    w = rng.standard_normal((B, P, 2)) + 1j * rng.standard_normal((B, P, 2))
    w = (w / np.linalg.norm(w, axis=1, keepdims=True)).astype(np.complex64)
    ports = tm8_fill_ports(layers, tm, jnp.asarray(w))    # [B, P, 14, F]
    h = (rng.standard_normal((B, R, P)) + 1j *
         rng.standard_normal((B, R, P))).astype(np.complex64) / np.sqrt(2)
    grid_rx = jnp.einsum("brp,bpsf->brsf", jnp.asarray(h), ports)
    t = ofdm.ofdm_modulate(grid_rx.reshape(B * R, 14, fp.n_fft), fp)
    n0 = 1e-3
    nr = jax.random.normal(jax.random.PRNGKey(5), t.shape + (2,))
    rx = t + jnp.sqrt(n0 / 2) * (nr[..., 0] + 1j * nr[..., 1])
    rgrid = ofdm.ofdm_demodulate(rx, fp).reshape(B, R, 14, fp.n_fft)

    h_hat = tm8_estimate(rgrid, tm, n0)          # [B, R, n_data, 2]
    h_eff_true = np.einsum("brp,bpl->brl", h, w)  # flat channel per trial
    err = np.abs(np.asarray(h_hat) - h_eff_true[:, :, None, :]).max()
    assert err < 0.1, err

    y = rgrid[:, :, jnp.asarray(tm.data_sym), jnp.asarray(tm.data_bin)]
    y = jnp.moveaxis(y, 1, -1)                   # [B, n_data, R]
    He = jnp.moveaxis(h_hat, 1, 2)               # [B, n_data, R, 2]
    x_hat, _ = mmse_detect(y, He, n0)
    dec = np.argmin(np.abs(np.asarray(x_hat)[..., None] -
                           qpsk[None, None, None]), -1)
    assert (dec[:, :, 0] == bits[:, 0]).mean() > 0.99
    assert (dec[:, :, 1] == bits[:, 1]).mean() > 0.99
