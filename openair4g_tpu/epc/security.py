"""EIA-lite integrity protection for NAS (and the RRC/PDCP MAC-I hook).

Reference parity: openair-cn/SECU — nas_message.c wraps every NAS message
in a security-protected header (security header type, MAC, sequence
number) once the security mode procedure completes, with EIA1/EIA2
computing the 32-bit MAC over (COUNT, BEARER, DIRECTION, message);
secu_defs.h nas_stream_encrypt. Like the EEA-lite keystream in
epc/nas.py, the MAC here is an HMAC-SHA256 truncation — the protocol
shape (activation at SMC, per-direction counts, MAC-failure -> message
discarded) is the capability; the cipher itself is a documented
non-cryptographic stand-in.
"""
from __future__ import annotations

import hashlib
import hmac
from dataclasses import dataclass, field

SECURED_TAG = 0xE7        # security-protected NAS header byte

DIR_UPLINK = 0
DIR_DOWNLINK = 1


def eia_mac(key: bytes, count: int, bearer: int, direction: int,
            msg: bytes) -> bytes:
    """32-bit message authentication code (EIA2 input layout)."""
    block = (count.to_bytes(4, "big") + bytes([bearer & 0x1F])
             + bytes([direction & 1]) + msg)
    return hmac.new(key, block, hashlib.sha256).digest()[:4]


def derive_k_nas_int(kasme: bytes) -> bytes:
    """KASME -> K_NASint (33.401 KDF shape, SHA-256 stand-in)."""
    return hashlib.sha256(kasme + b"nas-int").digest()[:16]


def derive_k_enb(kasme: bytes) -> bytes:
    """KASME -> K_eNB (33.401 §A.3 shape): the AS root key the MME hands
    the eNB in S1AP InitialContextSetupRequest (36.413 SecurityKey IE)."""
    return hashlib.sha256(kasme + b"k-enb").digest()[:16]


def derive_k_rrc_int(k_enb: bytes) -> bytes:
    """K_eNB -> K_RRCint (33.401 §A.7 shape): integrity key for SRB PDCP
    MAC-I (the PDCP hook the reference exposes in pdcp.c ->
    openair-cn/SECU EIA1/2)."""
    return hashlib.sha256(k_enb + b"rrc-int").digest()[:16]


class IntegrityError(ValueError):
    pass


@dataclass
class NasSecurityContext:
    """Per-UE NAS security context: activated by the security mode
    procedure; wraps/unwraps the security-protected header."""
    k_nas_int: bytes = b""
    ul_count: int = 0
    dl_count: int = 0
    active: bool = False

    def activate(self, kasme: bytes) -> None:
        self.k_nas_int = derive_k_nas_int(kasme)
        self.ul_count = self.dl_count = 0
        self.active = True

    def protect(self, msg: bytes, direction: int) -> bytes:
        """Plain NAS -> security-protected NAS (header + MAC + SN)."""
        if not self.active:
            return msg
        count = self.ul_count if direction == DIR_UPLINK else self.dl_count
        mac = eia_mac(self.k_nas_int, count, 0, direction, msg)
        if direction == DIR_UPLINK:
            self.ul_count += 1
        else:
            self.dl_count += 1
        return bytes([SECURED_TAG]) + count.to_bytes(3, "big") + mac + msg

    def unprotect(self, data: bytes, direction: int) -> bytes:
        """Security-protected NAS -> plain NAS; raises IntegrityError on a
        bad MAC (the reference discards the message, nas_message.c)."""
        if not data or data[0] != SECURED_TAG:
            if self.active:
                raise IntegrityError("unprotected NAS after SMC")
            return data
        assert self.active, "secured NAS before security activation"
        count = int.from_bytes(data[1:4], "big")
        mac, msg = data[4:8], data[8:]
        want = eia_mac(self.k_nas_int, count, 0, direction, msg)
        if not hmac.compare_digest(mac, want):
            raise IntegrityError("NAS MAC failure")
        # replay protection: the receive count must not run backwards
        cur = self.ul_count if direction == DIR_UPLINK else self.dl_count
        if count < cur:
            raise IntegrityError("NAS replay (stale COUNT)")
        if direction == DIR_UPLINK:
            self.ul_count = count + 1
        else:
            self.dl_count = count + 1
        return msg
