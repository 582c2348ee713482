"""MME-lite: S1AP endpoint + EMM attach state machine per UE.

Reference parity: openair-cn/MME_APP (UE context store, attach
orchestration), NAS/EURECOM-NAS/src/emm/sap (EMM state machine:
DEREGISTERED -> COMMON-PROCEDURE (auth, SMC) -> REGISTERED), S1AP MME
handlers (s1ap_mme_nas_procedures.c). The S11 interface to the SGW is a
direct object call (the reference's ITTI SGW_CREATE_SESSION_REQUEST /
MODIFY_BEARER messages).

Flow per UE (the ladder the integration test climbs):
  InitialUEMessage(AttachRequest)
    -> HSS auth vector -> DownlinkNASTransport(AuthenticationRequest)
  UplinkNASTransport(AuthenticationResponse)  [XRES check]
    -> DownlinkNASTransport(SecurityModeCommand)
  UplinkNASTransport(SecurityModeComplete)
    -> SGW create_session -> InitialContextSetupRequest(AttachAccept +
       ActivateDefaultBearerRequest, SGW UL TEID)
  InitialContextSetupResponse -> SGW modify_bearer (eNB DL TEID)
  UplinkNASTransport(AttachComplete(BearerAccept)) -> EMM-REGISTERED
"""
from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from .nas import (AttachRequest, AuthenticationRequest,
                  AuthenticationResponse, SecurityModeCommand,
                  SecurityModeComplete, AttachAccept, AttachComplete,
                  ActivateDefaultBearerRequest, ActivateDefaultBearerAccept,
                  decode_nas)
from .s1ap import (S1SetupRequest, S1SetupResponse, InitialUeMessage,
                   DownlinkNasTransport, UplinkNasTransport,
                   InitialContextSetupRequest, InitialContextSetupResponse,
                   UeContextReleaseCommand, UeContextReleaseComplete,
                   PathSwitchRequest, PathSwitchRequestAcknowledge,
                   decode_s1ap)
from .hss import Hss
from .sgw import SgwPgw
from .security import (NasSecurityContext, IntegrityError, DIR_UPLINK,
                       DIR_DOWNLINK)


class EmmState(Enum):
    DEREGISTERED = 0
    AUTH_PENDING = 1
    SMC_PENDING = 2
    CTX_PENDING = 3
    REGISTERED = 4


@dataclass
class MmeUeContext:
    mme_ue_id: int
    enb_ue_id: int
    imsi: int = 0
    state: EmmState = EmmState.DEREGISTERED
    xres: bytes = b""
    kasme: bytes = b""
    guti: int = 0
    bearer = None
    sec: NasSecurityContext = field(default_factory=NasSecurityContext)


class Mme:
    def __init__(self, hss: Hss, sgw: SgwPgw, mme_group: int = 4,
                 mme_code: int = 1):
        self.hss = hss
        self.sgw = sgw
        self.mme_group = mme_group
        self.mme_code = mme_code
        self.ues: dict[int, MmeUeContext] = {}
        self._next_id = 1
        self._next_mtmsi = 0xC0000001

    # ------------------------------------------------------- S1 endpoint --
    def handle_s1ap(self, pdu: bytes) -> list:
        """One S1AP PDU in -> list of S1AP PDUs out (the reference's SCTP
        stream, in-process)."""
        msg = decode_s1ap(pdu)
        if isinstance(msg, S1SetupRequest):
            return [S1SetupResponse(mme_group=self.mme_group,
                                    mme_code=self.mme_code).pack()]
        if isinstance(msg, InitialUeMessage):
            return self._initial_ue(msg)
        if isinstance(msg, UplinkNasTransport):
            return self._uplink_nas(msg)
        if isinstance(msg, InitialContextSetupResponse):
            ctx = self.ues[msg.mme_ue_id]
            self.sgw.modify_bearer(ctx.bearer.sgw_teid_ul,
                                   msg.enb_teid_dl, msg.enb_addr)
            return []
        if isinstance(msg, PathSwitchRequest):
            # X2 handover completion: re-point the S1-U downlink tunnel at
            # the target eNB (s1ap_mme handler -> SGW Modify Bearer)
            ctx = self.ues[msg.mme_ue_id]
            assert ctx.state == EmmState.REGISTERED, ctx.state
            self.sgw.modify_bearer(ctx.bearer.sgw_teid_ul,
                                   msg.enb_teid_dl, msg.enb_addr)
            ctx.enb_ue_id = msg.enb_ue_id
            return [PathSwitchRequestAcknowledge(
                mme_ue_id=msg.mme_ue_id, enb_ue_id=msg.enb_ue_id).pack()]
        if isinstance(msg, UeContextReleaseComplete):
            self.ues.pop(msg.mme_ue_id, None)
            return []
        raise ValueError(f"unhandled S1AP {msg}")

    # --------------------------------------------------------- procedures --
    def _initial_ue(self, msg: InitialUeMessage) -> list:
        nas = decode_nas(msg.nas_pdu)
        assert isinstance(nas, AttachRequest), nas
        assert self.hss.known(nas.imsi), f"unknown IMSI {nas.imsi}"
        ctx = MmeUeContext(mme_ue_id=self._next_id,
                           enb_ue_id=msg.enb_ue_id, imsi=nas.imsi)
        self._next_id += 1
        self.ues[ctx.mme_ue_id] = ctx
        vec = self.hss.authentication_info(nas.imsi)
        ctx.xres, ctx.kasme = vec["xres"], vec["kasme"]
        ctx.state = EmmState.AUTH_PENDING
        auth = AuthenticationRequest(rand=vec["rand"], autn=vec["autn"])
        return [DownlinkNasTransport(mme_ue_id=ctx.mme_ue_id,
                                     enb_ue_id=ctx.enb_ue_id,
                                     nas_pdu=auth.pack()).pack()]

    def _uplink_nas(self, msg: UplinkNasTransport) -> list:
        ctx = self.ues[msg.mme_ue_id]
        try:
            plain = ctx.sec.unprotect(msg.nas_pdu, DIR_UPLINK)
        except IntegrityError:
            return []                  # reference: discard on MAC failure
        nas = decode_nas(plain)
        if isinstance(nas, AuthenticationResponse):
            assert ctx.state == EmmState.AUTH_PENDING, ctx.state
            assert nas.res == ctx.xres, "authentication failure (RES!=XRES)"
            ctx.state = EmmState.SMC_PENDING
            # NAS security activates with the SMC: the command itself is
            # integrity-protected with the new context (nas_message.c)
            ctx.sec.activate(ctx.kasme)
            return [DownlinkNasTransport(
                mme_ue_id=ctx.mme_ue_id, enb_ue_id=ctx.enb_ue_id,
                nas_pdu=ctx.sec.protect(SecurityModeCommand().pack(),
                                        DIR_DOWNLINK)).pack()]
        if isinstance(nas, SecurityModeComplete):
            assert ctx.state == EmmState.SMC_PENDING, ctx.state
            ctx.state = EmmState.CTX_PENDING
            ctx.bearer = self.sgw.create_session(ctx.imsi, ebi=5)
            ctx.guti = ((self.mme_group << 40) | (self.mme_code << 32)
                        | self._next_mtmsi)
            self._next_mtmsi += 1
            esm = ActivateDefaultBearerRequest(
                ebi=5, pdn_ipv4=ctx.bearer.ue_ipv4)
            accept = AttachAccept(guti=ctx.guti, esm_container=esm.pack())
            from .security import derive_k_enb
            return [InitialContextSetupRequest(
                mme_ue_id=ctx.mme_ue_id, enb_ue_id=ctx.enb_ue_id,
                erab_id=5, sgw_teid_ul=ctx.bearer.sgw_teid_ul,
                nas_pdu=ctx.sec.protect(accept.pack(),
                                        DIR_DOWNLINK),
                security_key=derive_k_enb(ctx.kasme)).pack()]
        if isinstance(nas, AttachComplete):
            assert ctx.state == EmmState.CTX_PENDING, ctx.state
            acc = decode_nas(nas.esm_container)
            assert isinstance(acc, ActivateDefaultBearerAccept)
            assert acc.ebi == 5
            ctx.state = EmmState.REGISTERED
            return []
        raise ValueError(f"unhandled NAS {nas}")

    def release(self, mme_ue_id: int) -> bytes:
        ctx = self.ues[mme_ue_id]
        return UeContextReleaseCommand(mme_ue_id=ctx.mme_ue_id,
                                       enb_ue_id=ctx.enb_ue_id).pack()

    def page(self, imsi: int) -> bytes:
        """Mobile-terminated traffic for an idle UE -> S1AP Paging toward
        every eNB in the tracking area (s1ap_mme paging procedure)."""
        from .s1ap import S1apPaging
        assert self.hss.known(imsi), imsi
        return S1apPaging(ue_paging_id=imsi).pack()
