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


def test_k0_rv_offsets_differ():
    K, E = 104, 200
    starts = [rm.make_rate_match_maps(K, 0, rv, E).e_to_w[0] for rv in range(4)]
    assert len(set(int(s) for s in starts)) == 4
