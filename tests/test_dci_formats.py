"""DCI formats 0/1/2A payloads (reference: dci.c format structs +
dci_tools.c parameter extraction)."""
import numpy as np

from openair4g_tpu.phy.dci_formats import (
    dci_format0_size, pack_dci_format0, unpack_dci_format0,
    dci_format1_size, pack_dci_format1, unpack_dci_format1,
    dci_format2a_size, pack_dci_format2a, unpack_dci_format2a, n_rbg)
from openair4g_tpu.phy.pdcch import (dci_format1a_size, pack_dci_format1a,
                                     unpack_dci_format1a)


def test_format0_roundtrip_and_size():
    for n_rb in (25, 50, 100):
        assert dci_format0_size(n_rb) == dci_format1a_size(n_rb)
        b = pack_dci_format0(n_rb, rb_start=3, n_prb=10, mcs=13, ndi=1,
                             tpc=2, cshift_dmrs=4, cqi_req=1)
        assert len(b) == dci_format0_size(n_rb)
        d = unpack_dci_format0(b, n_rb)
        assert d["is_format0"] and d["rb_start"] == 3 and d["n_prb"] == 10
        assert d["mcs"] == 13 and d["cshift_dmrs"] == 4 and d["cqi_req"] == 1


def test_flag_disambiguates_format0_vs_1a():
    n_rb = 25
    b0 = pack_dci_format0(n_rb, 0, 5, 10, 1)
    b1a = pack_dci_format1a(n_rb, rb_start=0, n_prb=5, mcs=10, harq_pid=0,
                            ndi=1, rv=0)
    assert len(b0) == len(b1a)           # one blind-decode size
    assert b0[0] == 0 and b1a[0] == 1    # leading flag bit


def test_format1_rbg_bitmap():
    n_rb = 50
    nbg, p = n_rbg(n_rb)
    assert (nbg, p) == (17, 3)
    bitmap = (1 << (nbg - 1)) | 1        # first and last RBG
    b = pack_dci_format1(n_rb, bitmap, mcs=16, harq_pid=2, ndi=0, rv=1)
    assert len(b) == dci_format1_size(n_rb)
    d = unpack_dci_format1(b, n_rb)
    assert d["rb_list"][:3] == (0, 1, 2)
    assert d["rb_list"][-2:] == (48, 49)  # last RBG truncated to 2 RBs
    assert d["mcs"] == 16 and d["rv"] == 1


def test_format2a_two_codewords():
    n_rb = 25
    b = pack_dci_format2a(n_rb, rbg_bitmap=0x1FFF, harq_pid=1, tb_swap=0,
                          mcs1=10, ndi1=1, rv1=0, mcs2=12, ndi2=0, rv2=2)
    assert len(b) == dci_format2a_size(n_rb)
    d = unpack_dci_format2a(b, n_rb)
    assert d["mcs1"] == 10 and d["mcs2"] == 12
    assert d["rv1"] == 0 and d["rv2"] == 2 and d["harq_pid"] == 1


def test_format0_blind_decode_through_pdcch():
    """A format-0 UL grant survives the full PDCCH encode -> blind search
    path (same size hypothesis as 1A; the flag bit picks the parser)."""
    import jax.numpy as jnp
    from openair4g_tpu.phy.pdcch import (dci_encode, dci_blind_decode,
                                         search_space_candidates)
    n_rb, rnti = 25, 0x41
    payload = pack_dci_format0(n_rb, rb_start=2, n_prb=8, mcs=9, ndi=1)
    e = dci_encode(payload, rnti, L=4)
    n_cce = 8
    llr = np.zeros((2, n_cce * 72), np.float32)
    llr[:, :len(e)] = (1.0 - 2.0 * e) * 6.0
    cands = search_space_candidates(n_cce)
    found, pay, _ = dci_blind_decode(jnp.asarray(llr), len(payload), rnti,
                                     cands)
    assert np.asarray(found).all()
    d = unpack_dci_format0(np.asarray(pay[0]), n_rb)
    assert d["is_format0"] and d["rb_start"] == 2 and d["n_prb"] == 8


def test_format2_roundtrip_and_size():
    from openair4g_tpu.phy.dci_formats import (
        pack_dci_format2, unpack_dci_format2, dci_format2_size,
        dci_format2a_size)
    n_rb = 25
    assert dci_format2_size(n_rb, 2) == dci_format2a_size(n_rb, 2) + 3
    assert dci_format2_size(n_rb, 4) == dci_format2a_size(n_rb, 2) + 6
    b = pack_dci_format2(n_rb, rbg_bitmap=0x0FF, harq_pid=3, tb_swap=1,
                         mcs1=15, ndi1=0, rv1=1, mcs2=9, ndi2=1, rv2=3,
                         precoding=2)
    assert len(b) == dci_format2_size(n_rb, 2)
    d = unpack_dci_format2(b, n_rb)
    assert d["precoding_info"] == 2 and d["rank"] == 2 and d["pmi"] == 2
    assert d["mcs1"] == 15 and d["mcs2"] == 9 and d["tb_swap"] == 1
    # rank-1: second codeword disabled (mcs2=0, rv2=0)
    b1 = pack_dci_format2(n_rb, rbg_bitmap=0x3, harq_pid=0, tb_swap=0,
                          mcs1=5, ndi1=1, rv1=0, mcs2=0, ndi2=0, rv2=0,
                          precoding=3)
    d1 = unpack_dci_format2(b1, n_rb)
    assert d1["rank"] == 1 and d1["pmi"] == 3
