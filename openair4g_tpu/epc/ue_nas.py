"""UE NAS (EMM/ESM) state machine.

Reference parity: openair-cn/NAS/EURECOM-NAS/src UE side — emm attach
procedure (emm/Attach.c), authentication response computation
(emm/Authentication.c), security mode (emm/SecurityModeControl.c), ESM
default-bearer accept (esm/DefaultEpsBearerContextActivation.c).
"""
from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from .nas import (AttachRequest, AuthenticationRequest,
                  AuthenticationResponse, SecurityModeCommand,
                  SecurityModeComplete, AttachAccept, AttachComplete,
                  ActivateDefaultBearerRequest, ActivateDefaultBearerAccept,
                  decode_nas, auth_vector)


class UeEmmState(Enum):
    DEREGISTERED = 0
    ATTACHING = 1
    REGISTERED = 2


class UeNas:
    def __init__(self, imsi: int, k: bytes):
        assert len(k) == 16
        self.imsi = imsi
        self.k = k
        self.state = UeEmmState.DEREGISTERED
        self.guti = 0
        self.ip = 0
        self.ebi = 0
        self.kasme = b""
        from .security import NasSecurityContext
        self.sec = NasSecurityContext()

    def attach_request(self) -> bytes:
        self.state = UeEmmState.ATTACHING
        return AttachRequest(imsi=self.imsi).pack()

    def handle_downlink(self, nas_pdu: bytes) -> bytes | None:
        """DL NAS in -> optional UL NAS out. Integrity: the first secured
        message (the SMC) activates the context from KASME; every later
        message must pass the MAC check (epc/security.py EIA-lite)."""
        from .security import SECURED_TAG, DIR_DOWNLINK, DIR_UPLINK
        if nas_pdu and nas_pdu[0] == SECURED_TAG and not self.sec.active:
            assert self.kasme, "secured NAS before authentication"
            self.sec.activate(self.kasme)
        nas_pdu = self.sec.unprotect(nas_pdu, DIR_DOWNLINK)
        out = self._handle_plain(nas_pdu)
        if out is not None:
            out = self.sec.protect(out, DIR_UPLINK)
        return out

    def _handle_plain(self, nas_pdu: bytes) -> bytes | None:
        msg = decode_nas(nas_pdu)
        if isinstance(msg, AuthenticationRequest):
            # recompute from (K, RAND); verify the network via AUTN
            autn, res, kasme = auth_vector(self.k, msg.rand)
            assert autn == msg.autn, "network authentication failed"
            self.kasme = kasme
            return AuthenticationResponse(res=res).pack()
        if isinstance(msg, SecurityModeCommand):
            return SecurityModeComplete().pack()
        if isinstance(msg, AttachAccept):
            esm = decode_nas(msg.esm_container)
            assert isinstance(esm, ActivateDefaultBearerRequest)
            self.guti = msg.guti
            self.ip = esm.pdn_ipv4
            self.ebi = esm.ebi
            self.state = UeEmmState.REGISTERED
            acc = ActivateDefaultBearerAccept(ebi=esm.ebi)
            return AttachComplete(esm_container=acc.pack()).pack()
        raise ValueError(f"unhandled DL NAS {msg}")
