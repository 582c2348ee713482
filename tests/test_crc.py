import numpy as np
import jax.numpy as jnp
import pytest

from openair4g_tpu.ops import crc


@pytest.mark.parametrize("kind", ["crc24a", "crc24b", "crc16", "crc8"])
def test_matrix_matches_serial(kind):
    rng = np.random.default_rng(0)
    for K in (40, 123, 1000):
        bits = rng.integers(0, 2, K)
        golden = crc.crc_bits_host(bits, kind)
        H = crc.crc_matrix(K, kind)
        via_matrix = (bits @ H) % 2
        np.testing.assert_array_equal(via_matrix, golden)


def test_device_crc_and_check():
    rng = np.random.default_rng(1)
    K = 488
    bits = rng.integers(0, 2, (6, K)).astype(np.float32)
    full = np.stack([crc.attach_crc_host(b, "crc24a") for b in bits]).astype(np.float32)
    ok = np.asarray(crc.crc_ok_device(jnp.asarray(full), "crc24a"))
    assert ok.all()
    corrupted = full.copy()
    corrupted[:, 17] = 1 - corrupted[:, 17]
    bad = np.asarray(crc.crc_ok_device(jnp.asarray(corrupted), "crc24a"))
    assert not bad.any()


def test_known_crc_property():
    # CRC of all-zero message is zero
    for kind in crc.CRC_POLYS:
        assert crc.crc_bits_host(np.zeros(64, np.int8), kind).sum() == 0
