"""Published 3GPP test vectors for the real security algorithms.

Sources (public spec data, same vectors the reference's TEST/ suite uses):
  * 128-EEA1: UEA2&UIA2 Implementors' Test Data §4 (SNOW3G f8 form used
    by 33.401 B.1.2) — reference test_secu_knas_encrypt_eea1.c
  * 128-EIA1: TS 33.401 Annex C.4 — reference test_secu_knas_encrypt_eia1.c
  * 128-EEA2: TS 33.401 Annex C.1 — reference test_secu_knas_encrypt_eea2.c
  * 128-EIA2: TS 33.401 Annex C.2 (byte-aligned sets) — reference
    test_secu_knas_encrypt_eia2.c
"""
import pytest

from openair4g_tpu.epc.crypto import (eea1, eia1, eea2, eia2,
                                      eea_apply, eia_compute)


def H(s: str) -> bytes:
    return bytes.fromhex(s.replace(" ", ""))


# (direction, count, bearer, key, message, bitlen, expected)
EEA1_SETS = [
    (1, 0x72A4F20F, 0x0C, "2BD6459F82C5B300952C49104881FF48",
     "7EC61272743BF1614726446A6C38CED166F6CA76EB5430044286346CEF130F92"
     "922B03450D3A9975E5BD2EA0EB55AD8E1B199E3EC4316020E9A1B285E7627953"
     "59B7BDFD39BEF4B2484583D5AFE082AEE638BF5FD5A606193901A08F4AB41AAB"
     "9B134880", 798,
     "8CEBA62943DCED3A0990B06EA1B0A2C4FB3CEDC71B369F42BA64C1EB6665E72A"
     "A1C9BB0DEAA20FE86058B8BAEE2C2E7F0BECCE48B52932A53C9D5F931A3A7C53"
     "2259AF4325E2A65E3084AD5F6A513B7BDDC1B65F0AA0D97A053DB55A88C4C4F9"
     "605E4140"),
    (0, 0xE28BCF7B, 0x18, "EFA8B2229E720C2A7C36EA55E9605695",
     "10111231E060253A43FD3F57E37607AB2827B599B6B1BBDA37A8ABCC5A8C550D"
     "1BFB2F494624FB50367FA36CE3BC68F11CF93B1510376B02130F812A9FA169D8",
     510,
     "E0DA15CA8E2554F5E56C9468DC6C7C129C568AA5032317E04E0729646CABEFA6"
     "89864C410F24F919E61E3DFDFAD77E560DB0A9CD36C34AE4181490B29F5FA2FC"),
    (1, 0xFA556B26, 0x03, "5ACB1D644C0D51204EA5F1451010D852",
     "AD9C441F890B38C457A49D421407E8", 120,
     "BA0F31300334C56B52A7497CBAC046"),
    (1, 0x398A59B4, 0x05, "D3C5D592327FB11C4035C6680AF8C6D1",
     "981BA6824C1BFB1AB485472029B71D808CE33E2CC3C0B5FC1F3DE8A6DC66B1F0",
     253,
     "989B719CDC33CEB7CF276A52827CEF94A56C40C0AB9D81F7A2A9BAC60E11C4B0"),
]

EIA1_SETS = [
    (0, 0x38A6F056, 0x1F, "2bd6459f82c5b300952c49104881ff48",
     "33323462633938613734790000000000", 88, "731f1165"),
    (1, 0x36AF6144, 0x18, "7e5e94431e11d73828d739cc6ced4573",
     "b3d3c9170a4e1632f60f861013d22d84b726b6a278d802d1eeaf1321ba5929dc",
     254, "e3259f6f"),
    (0, 0xC7590EA9, 0x17, "d3419be821087acd02123a9248033359",
     "bbb057038809496bcff86d6fbc8ce5b135a06b166054f2d565be8ace75dc851e"
     "0bcdd8f07141c495872fb5d8c0c66a8b6da556663e4e461205d84580bee5bc7e",
     511, "9a16c77d"),
    (1, 0x36AF6144, 0x0F, "83fd23a244a74cf358da3019f1722635",
     "35c68716633c66fb750c266865d53c11ea05b1e9fa49c8398d48e1efa5909d39"
     "47902837f5ae96d5a05bc8d61ca8dbef1b13a4b4abfe4fb1006045b674bb5472"
     "9304c382be53a5af05556176f6eaa2ef1d05e4b083181ee674cda5a485f74d7a",
     768, "bba74492"),
    (0, 0x36AF6144, 0x18, "6832a65cff4473621ebdd4ba26a921fe",
     "d3c53839626820717765667620323837636240981ba6824c1bfb1ab485472029"
     "b71d808ce33e2cc3c0b5fc1f3de8a6dc", 383, "4145e4b0"),
]

EEA2_SETS = [
    (1, 0x398A59B4, 0x15, "d3c5d592327fb11c4035c6680af8c6d1",
     "981ba6824c1bfb1ab485472029b71d808ce33e2cc3c0b5fc1f3de8a6dc66b1f0",
     253,
     "e9fed8a63d155304d71df20bf3e82214b20ed7dad2f233dc3c22d7bdeeed8e78"),
    (1, 0xC675A64B, 0x0C, "2bd6459f82c440e0952c49104805ff48",
     "7ec61272743bf1614726446a6c38ced166f6ca76eb5430044286346cef130f92"
     "922b03450d3a9975e5bd2ea0eb55ad8e1b199e3ec4316020e9a1b285e7627953"
     "59b7bdfd39bef4b2484583d5afe082aee638bf5fd5a606193901a08f4ab41aab"
     "9b134880", 798,
     "5961605353c64bdca15b195e288553a910632506d6200aa790c4c806c99904cf"
     "2445cc50bb1cf168a49673734e081b57e324ce5259c0e78d4cd97b870976503c"
     "0943f2cb5ae8f052c7b7d392239587b8956086bcab18836042e2e6ce42432a17"
     "105c53d0"),
    (0, 0x544D49CD, 0x04, "0a8b6bd8d9b08b08d64e32d1817777fb",
     "fd40a41d370a1f65745095687d47ba1d36d2349e23f644392c8ea9c49d40c132"
     "71aff264d0f24800", 310,
     "75750d37b4bba2a4dedb34235bd68c6645acdaaca48138a3b0c471e2a7041a57"
     "6423d2927287f000"),
]

EIA2_SETS = [
    (1, 0x398A59B4, 0x1A, "d3c5d592327fb11c4035c6680af8c6d1",
     "484583d5afe082ae", 64, "b93787e6"),
    (1, 0x36AF6144, 0x0F, "83fd23a244a74cf358da3019f1722635",
     "35c68716633c66fb750c266865d53c11ea05b1e9fa49c8398d48e1efa5909d39"
     "47902837f5ae96d5a05bc8d61ca8dbef1b13a4b4abfe4fb1006045b674bb5472"
     "9304c382be53a5af05556176f6eaa2ef1d05e4b083181ee674cda5a485f74d7a",
     768, "e657e182"),
]


@pytest.mark.parametrize("d,count,bearer,key,msg,bl,exp", EEA1_SETS)
def test_eea1_vectors(d, count, bearer, key, msg, bl, exp):
    out = eea1(H(key), count, bearer, d, H(msg), bl)
    assert out == H(exp)
    # decipher = re-apply
    assert eea1(H(key), count, bearer, d, out, bl) == \
        eea1(H(key), count, bearer, d, H(exp), bl)


@pytest.mark.parametrize("d,count,bearer,key,msg,bl,exp", EIA1_SETS)
def test_eia1_vectors(d, count, bearer, key, msg, bl, exp):
    assert eia1(H(key), count, bearer, d, H(msg), bl) == H(exp)


@pytest.mark.parametrize("d,count,bearer,key,msg,bl,exp", EEA2_SETS)
def test_eea2_vectors(d, count, bearer, key, msg, bl, exp):
    assert eea2(H(key), count, bearer, d, H(msg), bl) == H(exp)


@pytest.mark.parametrize("d,count,bearer,key,msg,bl,exp", EIA2_SETS)
def test_eia2_vectors(d, count, bearer, key, msg, bl, exp):
    assert eia2(H(key), count, bearer, d, H(msg), bl) == H(exp)


def test_dispatch_roundtrip():
    key = bytes(range(16))
    msg = b"nas message body for dispatch"
    for alg in (0, 1, 2):
        ct = eea_apply(alg, key, 9, 3, 1, msg)
        assert eea_apply(alg, key, 9, 3, 1, ct) == msg
        if alg == 0:
            assert ct == msg
        else:
            assert ct != msg
    m1 = eia_compute(1, key, 9, 3, 1, msg)
    m2 = eia_compute(2, key, 9, 3, 1, msg)
    assert len(m1) == len(m2) == 4 and m1 != m2
