"""SI/RAR delivery through PDCCH DCI format 1C in the full-chain TX/RX.

Reference parity: dci.c:2805-2925 (1C sizes + common-search blind decode
with SI-RNTI/RA-RNTI), rar_tools.c (RAR PDU), eNB_scheduler_RA.c (RAR on a
1C allocation). The eNB builds a complete subframe whose control region
carries a format-1C DCI addressed to RA-RNTI (or SI-RNTI); the UE runs the
common-search blind decode, reads the step-RIV allocation out of the 1C
payload, decodes the PDSCH at that allocation and unpacks the RAR.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openair4g_tpu.sched.enb_tx import CellConfig, EnbTx
from openair4g_tpu.phy.pdcch import (common_search_candidates,
                                     dci_blind_decode, pdcch_scramble_seq,
                                     BITS_PER_CCE)
from openair4g_tpu.phy.dci_formats import (pack_dci_format1c,
                                           unpack_dci_format1c,
                                           dci_format1c_size)
from openair4g_tpu.phy.pdsch import DlschConfig, DlschCodec
from openair4g_tpu.phy.resource_grid import make_grid_map
from openair4g_tpu.phy.channel_est import make_wiener_stack, estimate_channel
from openair4g_tpu.phy import ofdm
from openair4g_tpu.ops.gold import gold_sequence, pdsch_cinit, \
    scramble_bits, unscramble_llrs
from openair4g_tpu.ops.llr import map_symbols, demap_llr
from openair4g_tpu.mac.ra import Rar, pack_rar, unpack_rar, ra_rnti

SI_RNTI = 0xFFFF


@pytest.mark.parametrize("rnti", [ra_rnti(1), SI_RNTI])
def test_rar_and_sib_via_dci_1c(rnti):
    n_rb, n_pdcch, subframe, mcs = 25, 3, 7, 2
    rb_start, n_prb = 0, 4                       # step-2 aligned (25 RB)
    cfg = CellConfig(n_rb=n_rb, n_pdcch=n_pdcch, subframe=subframe,
                     rb_start=rb_start, n_prb=n_prb, mcs=mcs)
    enb = EnbTx(cfg)
    ns = 2 * subframe

    # --- eNB: 1C DCI at a common-search candidate + RAR PDSCH ------------
    dci_1c = pack_dci_format1c(n_rb, rb_start, n_prb, mcs=mcs)
    enb.set_dcis([(dci_1c, rnti, 4, 0)])        # L=4 @ CCE 0 (common space)

    codec = DlschCodec(DlschConfig(mcs=mcs, n_rb=n_prb,
                                   n_pdcch_symbols=n_pdcch))
    rar = Rar(rapid=17, timing_advance=321, ul_grant=0xABCDE,
              t_crnti=0x5E11)
    pdu = pack_rar(rar)
    tb_bits = np.unpackbits(pdu)
    tb = np.zeros(codec.cfg.tbs, np.int32)
    tb[:len(tb_bits)] = tb_bits
    scr = gold_sequence(pdsch_cinit(rnti, 0, ns, cfg.n_id_cell),
                        codec.cfg.G)
    e = scramble_bits(codec.encode(jnp.asarray(tb[None])), scr)
    syms = map_symbols(e, codec.cfg.Qm).astype(jnp.complex64)
    grid = enb.data_subframe(syms)

    # --- channel: light AWGN ---------------------------------------------
    n0 = 10.0 ** (-10.0 / 10.0)
    t = ofdm.ofdm_modulate(grid, enb.fp)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    noise = jnp.sqrt(n0 / 2) * (jax.random.normal(k1, t.shape)
                                + 1j * jax.random.normal(k2, t.shape))
    rgrid = ofdm.ofdm_demodulate(t + noise, enb.fp)

    # --- UE: common-search 1C blind decode -------------------------------
    gm = make_grid_map(n_rb, n_pdcch, cfg.n_id_cell, subframe)
    W = jnp.asarray(make_wiener_stack(gm, n0 / 4.0))
    H = estimate_channel(rgrid, gm, W, time_avg=True)
    crm = enb.crm

    def eq_llr(sym_idx, bin_idx, sc_idx, qm):
        y = rgrid[:, jnp.asarray(sym_idx), jnp.asarray(bin_idx)]
        h = H[:, jnp.asarray(sym_idx), jnp.asarray(sc_idx)]
        g = jnp.maximum(jnp.abs(h) ** 2, 1e-9)
        return demap_llr(y * jnp.conj(h) / g, n0 / g, qm).reshape(1, -1)

    scr_p = pdcch_scramble_seq(cfg.n_id_cell, ns, crm.n_cce * BITS_PER_CCE)
    sgn_p = jnp.asarray(1.0 - 2.0 * scr_p.astype(np.float32))
    llr_pdcch = eq_llr(crm.pdcch_sym, crm.pdcch_bin, crm.pdcch_sc, 2) * sgn_p
    cands = common_search_candidates(crm.n_cce)
    found, payload, _ = dci_blind_decode(
        llr_pdcch, dci_format1c_size(n_rb), rnti, cands)
    assert bool(found[0]), "1C DCI not found in common search space"
    alloc = unpack_dci_format1c(np.asarray(payload[0]), n_rb)
    assert (alloc["rb_start"], alloc["n_prb"], alloc["mcs"]) == \
        (rb_start, n_prb, mcs)

    # --- UE: PDSCH at the 1C-indicated allocation -> RAR/SIB PDU ---------
    am = make_grid_map(n_rb, n_pdcch, cfg.n_id_cell, subframe,
                       rb_alloc=(alloc["rb_start"], alloc["n_prb"]))
    llr = eq_llr(am.data_sym, am.data_bin, am.data_sc, codec.cfg.Qm)
    llr = unscramble_llrs(llr, scr)
    tb_hat, tb_ok, _ = codec.decode(llr)
    assert bool(tb_ok[0])
    pdu_hat = np.packbits(np.asarray(tb_hat[0])[:len(tb_bits)])
    got = unpack_rar(pdu_hat)
    assert (got.rapid, got.timing_advance, got.ul_grant, got.t_crnti) == \
        (rar.rapid, rar.timing_advance, rar.ul_grant, rar.t_crnti)


def test_ue_search_space_hash_properties():
    from openair4g_tpu.phy.pdcch import (ue_search_candidates, yk_hash,
                                         search_space_candidates)
    n_cce = 20
    c1 = ue_search_candidates(n_cce, rnti=0x1234, subframe=7)
    c2 = ue_search_candidates(n_cce, rnti=0x1235, subframe=7)
    # spec counts: up to 6/6/2/2 candidates at L=1/2/4/8 (dedup may shrink)
    assert all(c.cce_offset + c.L <= n_cce for c in c1)
    assert {c.L for c in c1} == {1, 2, 4, 8}
    # Yk recursion is the 36.213 one
    y = 0x1234
    for _ in range(8):
        y = (y * 39827) % 65537
    assert yk_hash(0x1234, 7) == y
    # a different RNTI hashes to a different space (overwhelmingly likely)
    assert [c.cce_offset for c in c1] != [c.cce_offset for c in c2]
    # exhaustive sweep is a superset of any UE space
    full = {(c.L, c.cce_offset) for c in search_space_candidates(n_cce)}
    assert {(c.L, c.cce_offset) for c in c1} <= full
