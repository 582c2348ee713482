"""PDCP: sequence numbering, header compression hook, ciphering hook,
in-order delivery (36.323).

Reference parity: openair2/LAYER2/PDCP_v10.1.0/pdcp.c (SN/HFN "COUNT"
maintenance, pdcp_data_req/ind) — the ROHC hook and the EEA ciphering hook
are interfaces there too (openair-cn SECU provides the real EEA1/2); here
EEA0 (null) is implemented and a deterministic XOR keystream stands in for
simulation (NOT cryptographic — marked as such).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _keystream(key: int, count: int, bearer: int, length: int) -> bytes:
    """Deterministic keystream for link simulation (stand-in for EEA2;
    NOT cryptographically secure — do not use outside simulators)."""
    rng = np.random.default_rng((key * 2654435761 + count * 40503
                                 + bearer) & 0xFFFFFFFF)
    return rng.integers(0, 256, length, dtype=np.uint8).tobytes()


def _xor(a: bytes, b: bytes) -> bytes:
    return (np.frombuffer(a, np.uint8) ^ np.frombuffer(b, np.uint8)
            ).tobytes()


@dataclass
class PdcpConfig:
    sn_bits: int = 12              # 7 or 12 (36.323 §6.3.2)
    bearer: int = 1
    ciphering: str = "none"        # "none" (EEA0) | "xor" (sim stand-in)
    key: int = 0
    rohc: bool = False             # ROHC-lite UDP/IP compression (mac/rohc)


class PdcpEntity:
    """One direction of a DRB PDCP entity."""

    def __init__(self, cfg: PdcpConfig = PdcpConfig()):
        self.cfg = cfg
        self.mod = 1 << cfg.sn_bits
        self.tx_sn = 0
        self.tx_hfn = 0
        self.rx_sn = -1            # last received SN
        self.rx_hfn = 0
        self.delivered: list[bytes] = []
        if cfg.rohc:
            from .rohc import RohcCompressor, RohcDecompressor
            self._rohc_c = RohcCompressor()
            self._rohc_d = RohcDecompressor()

    # ------------------------------------------------------------------ TX --
    def _count(self, hfn: int, sn: int) -> int:
        return (hfn << self.cfg.sn_bits) | sn

    def data_req(self, sdu: bytes) -> bytes:
        """SDU -> PDCP PDU (2-byte header for 12-bit SN + ciphered body)."""
        sn = self.tx_sn
        count = self._count(self.tx_hfn, sn)
        self.tx_sn = (self.tx_sn + 1) % self.mod
        if self.tx_sn == 0:
            self.tx_hfn += 1
        body = sdu
        if self.cfg.rohc:
            body = self._rohc_c.compress(body)
        if self.cfg.ciphering == "xor":
            body = _xor(body, _keystream(self.cfg.key, count,
                                         self.cfg.bearer, len(body)))
        hdr = bytes([0x80 | (sn >> 8), sn & 0xFF])   # D/C=1 | SN
        return hdr + body

    # ------------------------------------------------------------------ RX --
    def data_ind(self, pdu: bytes) -> bytes | None:
        """PDU -> deciphered SDU (HFN inferred across SN wrap, 36.323
        §5.1.2.1.2); duplicates/stale PDUs return None."""
        sn = ((pdu[0] & 0x0F) << 8) | pdu[1]
        # infer HFN: if SN jumped backwards by more than half the space,
        # the SN counter wrapped
        hfn = self.rx_hfn
        if self.rx_sn >= 0:
            delta = (sn - self.rx_sn) % self.mod
            if delta == 0:
                return None                      # duplicate
            if sn < self.rx_sn and (self.rx_sn - sn) > self.mod // 2:
                hfn = self.rx_hfn + 1
            elif sn > self.rx_sn and (sn - self.rx_sn) > self.mod // 2:
                return None                      # stale (pre-wrap)
        count = self._count(hfn, sn)
        self.rx_hfn = hfn
        self.rx_sn = sn
        body = pdu[2:]
        if self.cfg.ciphering == "xor":
            body = _xor(body, _keystream(self.cfg.key, count,
                                         self.cfg.bearer, len(body)))
        if self.cfg.rohc:
            body = self._rohc_d.decompress(body)
        self.delivered.append(body)
        return body
