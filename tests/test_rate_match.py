import numpy as np
import jax.numpy as jnp
import pytest

from openair4g_tpu.ops import rate_match as rm


@pytest.mark.parametrize("K,F", [(40, 0), (512, 12), (6144, 0)])
def test_w_maps_bijective_on_nonnull(K, F):
    D = K + 4
    w_src, Kpi = rm._w_maps(D, F)
    assert len(w_src) == 3 * Kpi
    nn = w_src[w_src >= 0]
    # every non-filler d position appears exactly once
    expected = 3 * D - 2 * F
    assert len(nn) == expected
    assert len(set(nn.tolist())) == expected


def test_null_count_matches_reference_formula():
    # reference generate_dummy_w: total NULLs = 2F + 3*ND
    K, F = 512, 28
    D = K + 4
    w_src, Kpi = rm._w_maps(D, F)
    ND = Kpi - D
    assert (w_src < 0).sum() == 2 * F + 3 * ND


@pytest.mark.parametrize("rv", [0, 1, 2, 3])
def test_tx_rx_roundtrip(rv):
    """Soft-combining the received LLRs and unmapping must reproduce the
    encoder streams wherever bits were transmitted."""
    K, F, E = 136, 0, 3 * 136 + 100
    maps = rm.make_rate_match_maps(K, F, rv, E)
    rng = np.random.default_rng(rv)
    d = rng.integers(0, 2, (2, 3, K + 4))
    e = np.asarray(rm.rate_match_tx(jnp.asarray(d.reshape(2, -1)), maps))
    llr = 1.0 - 2.0 * e  # bit0 -> +1
    w = rm.rate_match_rx(jnp.asarray(llr, jnp.float32), maps)
    d_llr = np.asarray(rm.w_to_d_llr(w, maps))
    sent_sign = 1.0 - 2.0 * d
    got = np.sign(d_llr)
    transmitted = np.abs(d_llr) > 0
    assert transmitted.any()
    np.testing.assert_array_equal(got[transmitted], sent_sign[transmitted])


def test_harq_combining_accumulates():
    K, E = 104, 200
    maps0 = rm.make_rate_match_maps(K, 0, 0, E)
    maps2 = rm.make_rate_match_maps(K, 0, 2, E)
    llr = jnp.ones((1, E), jnp.float32)
    w0 = rm.rate_match_rx(llr, maps0)
    w01 = rm.rate_match_rx(llr, maps2, w_soft=w0)
    assert float(np.asarray(w01).sum()) == pytest.approx(2 * E)


@pytest.mark.parametrize("rv,ncb_cap", [(0, None), (2, None), (1, True),
                                        (3, True)])
def test_fold_path_matches_scatter_oracle(rv, ncb_cap):
    """The reshape-sum+roll dematch must equal the literal scatter-add into
    the w circular buffer (the reference's lte_rate_matching_turbo_rx walk),
    including with an Ncb-capped soft buffer and bit repetition."""
    K, F = 136, 4
    Ncb = 256 if ncb_cap else None          # cap < Kw=420 exercises the limit
    E = 700                                  # > L: repetition wraps
    maps = rm.make_rate_match_maps(K, F, rv, E, Ncb)
    rng = np.random.default_rng(7 + rv)
    llr = rng.normal(size=(3, E)).astype(np.float32)

    got = np.asarray(rm.w_to_d_llr(
        rm.rate_match_rx(jnp.asarray(llr), maps), maps, filler_big=0.0))

    # oracle: scatter-add via e_to_w, then read back via w_of_d
    w = np.zeros((3, maps.Kw), np.float32)
    for b in range(3):
        np.add.at(w[b], maps.e_to_w, llr[b])
    D = K + 4
    oracle = np.zeros((3, 3 * D), np.float32)
    sel = maps.w_of_d >= 0
    # positions beyond Ncb never receive LLRs; w stays 0 there, matching
    # the fold path's -1 mask
    oracle[:, sel] = w[:, maps.w_of_d[sel]]
    np.testing.assert_allclose(got.reshape(3, 3 * D), oracle, atol=1e-5)


def test_harq_combining_across_rv_fold():
    """Rounds with different rv accumulate in the shared order space."""
    K, E = 136, 300
    m0 = rm.make_rate_match_maps(K, 0, 0, E)
    m2 = rm.make_rate_match_maps(K, 0, 2, E)
    rng = np.random.default_rng(3)
    l0 = rng.normal(size=(1, E)).astype(np.float32)
    l2 = rng.normal(size=(1, E)).astype(np.float32)
    w = rm.rate_match_rx(jnp.asarray(l2), m2,
                         w_soft=rm.rate_match_rx(jnp.asarray(l0), m0))
    got = np.asarray(rm.w_to_d_llr(w, m0, filler_big=0.0))

    wbuf = np.zeros(m0.Kw, np.float32)
    np.add.at(wbuf, m0.e_to_w, l0[0])
    np.add.at(wbuf, m2.e_to_w, l2[0])
    D = K + 4
    oracle = np.zeros(3 * D, np.float32)
    sel = m0.w_of_d >= 0
    oracle[sel] = wbuf[m0.w_of_d[sel]]
    np.testing.assert_allclose(got.reshape(3 * D), oracle, atol=1e-5)


def test_k0_rv_offsets_differ():
    K, E = 104, 200
    starts = [rm.make_rate_match_maps(K, 0, rv, E).e_to_w[0] for rv in range(4)]
    assert len(set(int(s) for s in starts)) == 4
