"""DCI payload formats 0 (UL grant), 1 (DL type-0), 2A (open-loop MIMO),
36.212 §5.3.3.1.

Reference parity: openair1/PHY/LTE_TRANSPORT/dci.c (format structs
DCI0_5MHz_TDD_1_6_t etc.) and dci_tools.c (generate_eNB_dlsch_params_from
_dci / generate_ue_ulsch_params_from_dci — payload -> HARQ/allocation
parameter extraction, which `unpack_*` mirrors).

Format 1A lives in phy/pdcch.py (the original blind-decode target); these
share its bit conventions (MSB-first fields). Format 0 is sized to format
1A on purpose (the spec disambiguates them by the leading flag bit) — the
blind decoder needs only one size hypothesis for both.
"""
from __future__ import annotations

import math

import numpy as np

from .pdcch import dci_format1a_size


def _pack(fields) -> np.ndarray:
    bits = []
    for val, width in fields:
        assert 0 <= val < (1 << width), (val, width)
        bits += [(val >> (width - 1 - i)) & 1 for i in range(width)]
    return np.asarray(bits, np.int8)


class _Reader:
    def __init__(self, bits):
        self.bits = np.asarray(bits, np.int64)
        self.pos = 0

    def take(self, w: int) -> int:
        v = 0
        for _ in range(w):
            v = (v << 1) | int(self.bits[self.pos])
            self.pos += 1
        return v


def _riv(n_rb: int, rb_start: int, n_prb: int) -> int:
    if (n_prb - 1) <= n_rb // 2:
        return n_rb * (n_prb - 1) + rb_start
    return n_rb * (n_rb - n_prb + 1) + (n_rb - 1 - rb_start)


def _unriv(riv: int, n_rb: int) -> tuple:
    lcrb = riv // n_rb + 1
    rb_start = riv % n_rb
    if rb_start + lcrb > n_rb:
        lcrb = n_rb - lcrb + 2
        rb_start = n_rb - 1 - rb_start
    return rb_start, lcrb


def n_rbg(n_rb_dl: int) -> int:
    """Resource-block-group count for type-0 allocation (36.213 Table
    7.1.6.1-1: P = 1/2/3/4 for <=10/<=26/<=63/<=110 RB)."""
    p = 1 if n_rb_dl <= 10 else 2 if n_rb_dl <= 26 else \
        3 if n_rb_dl <= 63 else 4
    return -(-n_rb_dl // p), p


# ------------------------------------------------------------- format 0 --

def dci_format0_size(n_rb_ul: int, tdd: bool = False) -> int:
    """Padded to format 1A's size (36.212: one blind-decode size covers
    both; the leading flag bit disambiguates). The TDD variant carries a
    2-bit UL-index (uplink-downlink config 0) / DAI (configs 1-6) field
    and pads to the TDD 1A size (the reference's DCI0_*_TDD_* structs,
    dci.h)."""
    return dci_format1a_size(n_rb_ul, tdd=tdd)


def pack_dci_format0(n_rb_ul: int, rb_start: int, n_prb: int, mcs: int,
                     ndi: int, tpc: int = 0, cshift_dmrs: int = 0,
                     cqi_req: int = 0, hopping: int = 0,
                     tdd: bool = False, ul_index: int = 0) -> np.ndarray:
    """tdd=True inserts the 2-bit UL-index/DAI field (36.212 §5.3.3.1.1:
    present only for TDD; UL index for uplink-downlink config 0, DAI for
    configs 1-6)."""
    nriv = math.ceil(math.log2(n_rb_ul * (n_rb_ul + 1) / 2))
    fields = [(0, 1),                       # flag: 0 = format 0
              (hopping, 1),
              (_riv(n_rb_ul, rb_start, n_prb), nriv),
              (mcs, 5), (ndi, 1), (tpc, 2), (cshift_dmrs, 3)]
    if tdd:
        fields.append((ul_index, 2))
    fields.append((cqi_req, 1))
    bits = _pack(fields)
    pad = dci_format0_size(n_rb_ul, tdd=tdd) - len(bits)
    if pad > 0:
        bits = np.concatenate([bits, np.zeros(pad, np.int8)])
    return bits[:dci_format0_size(n_rb_ul, tdd=tdd)]


def unpack_dci_format0(bits: np.ndarray, n_rb_ul: int,
                       tdd: bool = False) -> dict:
    r = _Reader(bits)
    flag = r.take(1)
    nriv = math.ceil(math.log2(n_rb_ul * (n_rb_ul + 1) / 2))
    hopping = r.take(1)
    rb_start, n_prb = _unriv(r.take(nriv), n_rb_ul)
    out = dict(is_format0=flag == 0, hopping=hopping, rb_start=rb_start,
               n_prb=n_prb, mcs=r.take(5), ndi=r.take(1), tpc=r.take(2),
               cshift_dmrs=r.take(3))
    if tdd:
        out["ul_index"] = r.take(2)
    out["cqi_req"] = r.take(1)
    return out


# ------------------------------------------------------------- format 1 --

def dci_format1_size(n_rb_dl: int, tdd: bool = False) -> int:
    nbg, _ = n_rbg(n_rb_dl)
    return nbg + 5 + (4 if tdd else 3) + 1 + 2 + 2 + (2 if tdd else 0)


def pack_dci_format1(n_rb_dl: int, rbg_bitmap: int, mcs: int, harq_pid: int,
                     ndi: int, rv: int, tpc: int = 0,
                     tdd: bool = False, dai: int = 0) -> np.ndarray:
    nbg, _ = n_rbg(n_rb_dl)
    fields = [(rbg_bitmap, nbg), (mcs, 5), (harq_pid, 4 if tdd else 3),
              (ndi, 1), (rv, 2), (tpc, 2)]
    if tdd:
        fields.append((dai, 2))
    return _pack(fields)


def unpack_dci_format1(bits: np.ndarray, n_rb_dl: int,
                       tdd: bool = False) -> dict:
    nbg, p = n_rbg(n_rb_dl)
    r = _Reader(bits)
    bitmap = r.take(nbg)
    rbs = []
    for g in range(nbg):
        if (bitmap >> (nbg - 1 - g)) & 1:
            rbs += [g * p + i for i in range(p) if g * p + i < n_rb_dl]
    out = dict(rbg_bitmap=bitmap, rb_list=tuple(rbs), mcs=r.take(5),
               harq_pid=r.take(4 if tdd else 3), ndi=r.take(1),
               rv=r.take(2), tpc=r.take(2))
    if tdd:
        out["dai"] = r.take(2)
    return out


# ------------------------------------------------------------ format 2A --

def dci_format2a_size(n_rb_dl: int, n_tx: int = 2,
                      tdd: bool = False) -> int:
    nbg, _ = n_rbg(n_rb_dl)
    precoding = 0 if n_tx == 2 else 2       # 36.212 Table 5.3.3.1.5A
    return nbg + 2 + (4 if tdd else 3) + 1 + (5 + 1 + 2) * 2 + precoding \
        + (2 if tdd else 0)


def pack_dci_format2a(n_rb_dl: int, rbg_bitmap: int, harq_pid: int,
                      tb_swap: int, mcs1: int, ndi1: int, rv1: int,
                      mcs2: int, ndi2: int, rv2: int, tpc: int = 0,
                      n_tx: int = 2, tdd: bool = False,
                      dai: int = 0) -> np.ndarray:
    nbg, _ = n_rbg(n_rb_dl)
    fields = [(rbg_bitmap, nbg), (tpc, 2)]
    if tdd:
        fields.append((dai, 2))
    fields += [(harq_pid, 4 if tdd else 3), (tb_swap, 1),
               (mcs1, 5), (ndi1, 1), (rv1, 2),
               (mcs2, 5), (ndi2, 1), (rv2, 2)]
    if n_tx == 4:
        fields.append((0, 2))
    return _pack(fields)


def unpack_dci_format2a(bits: np.ndarray, n_rb_dl: int,
                        n_tx: int = 2, tdd: bool = False) -> dict:
    nbg, _ = n_rbg(n_rb_dl)
    r = _Reader(bits)
    out = dict(rbg_bitmap=r.take(nbg), tpc=r.take(2))
    if tdd:
        out["dai"] = r.take(2)
    out.update(harq_pid=r.take(4 if tdd else 3), tb_swap=r.take(1))
    for q in (1, 2):
        out[f"mcs{q}"] = r.take(5)
        out[f"ndi{q}"] = r.take(1)
        out[f"rv{q}"] = r.take(2)
    return out


# ------------------------------------------------------------- format 2 --
# Closed-loop spatial multiplexing (TM4): format 2A + a precoding-
# information field telling the UE which codebook entry (and rank) the
# eNB applied (36.212 §5.3.3.1.5, Table 5.3.3.1.5-4: 3 bits for 2 TX
# ports, 6 bits for 4). Reference parity: dci.c format-2 structs
# (DCI2_5MHz_2A_M10PRB... ) and dci_tools.c's precoding-info -> PMI
# mapping.
#
# 2-TX precoding-info codepoints (Table 5.3.3.1.5-4):
#   2 codewords (rank 2): 0 -> identity/2 layers no PMI swap,
#     1/2 -> codebook index 1/2 (the two rank-2 entries)
#   1 codeword (rank 1): 0..3 -> codebook index 0..3

def dci_format2_precoding_bits(n_tx: int = 2) -> int:
    return 3 if n_tx == 2 else 6


def dci_format2_size(n_rb_dl: int, n_tx: int = 2,
                     tdd: bool = False) -> int:
    return dci_format2a_size(n_rb_dl, n_tx=4 if n_tx == 4 else 2,
                             tdd=tdd) + \
        dci_format2_precoding_bits(n_tx) - (0 if n_tx == 2 else 2)


def pack_dci_format2(n_rb_dl: int, rbg_bitmap: int, harq_pid: int,
                     tb_swap: int, mcs1: int, ndi1: int, rv1: int,
                     mcs2: int, ndi2: int, rv2: int, precoding: int,
                     tpc: int = 0, n_tx: int = 2, tdd: bool = False,
                     dai: int = 0) -> np.ndarray:
    nbg, _ = n_rbg(n_rb_dl)
    fields = [(rbg_bitmap, nbg), (tpc, 2)]
    if tdd:
        fields.append((dai, 2))
    fields += [(harq_pid, 4 if tdd else 3), (tb_swap, 1),
               (mcs1, 5), (ndi1, 1), (rv1, 2),
               (mcs2, 5), (ndi2, 1), (rv2, 2),
               (precoding, dci_format2_precoding_bits(n_tx))]
    return _pack(fields)


def unpack_dci_format2(bits: np.ndarray, n_rb_dl: int,
                       n_tx: int = 2, tdd: bool = False) -> dict:
    out = unpack_dci_format2a(bits, n_rb_dl, n_tx=2, tdd=tdd)
    r = _Reader(bits)
    r.pos = dci_format2a_size(n_rb_dl, n_tx=2, tdd=tdd)
    pinfo = r.take(dci_format2_precoding_bits(n_tx))
    # decode to (rank, pmi) for the 2-TX codebook; cw2 enabled => rank 2
    two_cw = out["mcs2"] != 0 or out["rv2"] != 0
    if n_tx == 2:
        if two_cw:
            rank, pmi = 2, pinfo  # 0: no-PMI(identity), 1/2: CB idx 1/2
        else:
            rank, pmi = 1, pinfo
    else:
        rank, pmi = (2 if two_cw else 1), pinfo
    out.update(precoding_info=pinfo, rank=rank, pmi=pmi)
    return out


# ------------------------------------------------------------- format 1C --
# Compact DL assignment for SI-RNTI / RA-RNTI / P-RNTI control traffic
# (36.212 Table 5.3.3.1.4-1; 36.213 §7.1.6.3 distributed-VRB step RIV).
# Reference parity: dci.h DCI1C_{1_5,5,10,20}MHz_t (8/12/13/15 bits,
# dci.h:833-896), size selection dci.c:2805-2925, RIV conversion
# conv_1C_RIV (dci_tools.c:412-453).

_F1C = {   # N_RB_DL -> (NpDLVRB, N_RB_step, rballoc bits, has Ngap bit)
    6: (3, 2, 3, False),
    25: (12, 2, 7, False),
    50: (11, 4, 7, True),
    100: (24, 4, 9, True),
}


def dci_format1c_size(n_rb_dl: int) -> int:
    np_vrb, step, nbits, has_gap = _F1C[n_rb_dl]
    return 5 + nbits + (1 if has_gap else 0)


def pack_dci_format1c(n_rb_dl: int, rb_start: int, n_prb: int,
                      mcs: int, ngap: int = 0) -> np.ndarray:
    """rb_start/n_prb in PRBs; both must be multiples of N_RB_step."""
    np_vrb, step, nbits, has_gap = _F1C[n_rb_dl]
    assert rb_start % step == 0 and n_prb % step == 0 and n_prb > 0
    rbp, lp = rb_start // step, n_prb // step       # step-granular units
    if (lp - 1) <= np_vrb // 2:
        riv = np_vrb * (lp - 1) + rbp
    else:
        riv = np_vrb * (np_vrb - lp + 1) + (np_vrb - 1 - rbp)
    fields = [(mcs, 5), (riv, nbits)]
    if has_gap:
        fields.append((ngap, 1))
    return _pack(fields)


def unpack_dci_format1c(bits: np.ndarray, n_rb_dl: int) -> dict:
    """Mirrors conv_1C_RIV (dci_tools.c:412): step-granular RIV -> PRB
    start/length (localized interpretation, as the reference applies it)."""
    np_vrb, step, nbits, has_gap = _F1C[n_rb_dl]
    r = _Reader(bits)
    mcs = r.take(5)
    riv = r.take(nbits)
    ngap = r.take(1) if has_gap else 0
    lp = riv // np_vrb
    if lp <= np_vrb // 2:
        rbp = riv % np_vrb
    else:
        lp = np_vrb - lp
        rbp = np_vrb - (riv % np_vrb)
    return dict(mcs=mcs, rb_start=step * rbp, n_prb=step * (lp + 1),
                ngap=ngap)


# --------------------------------------------------------- formats 1B/1D --
# Rank-1 closed-loop precoding grants (1B: TM6; 1D: TM5 MU-MIMO with the
# dl_power_off flag). 36.212 §5.3.3.1.3/.3A. Reference parity: dci.h
# DCI1B_5MHz_2A_FDD_t :727-751 / DCI1D_5MHz_2A_FDD_t :901-925 — RIV (type-2)
# allocation + TPMI/PMI-confirm; 1B pads 1 bit to break the 1A ambiguity.

def _tpmi_bits(n_tx: int) -> int:
    return 2 if n_tx == 2 else 4


def dci_format1b_size(n_rb_dl: int, n_tx: int = 2) -> int:
    nriv = math.ceil(math.log2(n_rb_dl * (n_rb_dl + 1) / 2))
    base = 1 + nriv + 5 + 3 + 1 + 2 + 2 + _tpmi_bits(n_tx) + 1
    # 2-port variant pads 1 bit to break size ambiguity (dci.h:746: 26->27);
    # the 4-port variant is already unambiguous at 28 (dci.h:803).
    return base + (1 if n_tx == 2 else 0)


def pack_dci_format1b(n_rb_dl: int, rb_start: int, n_prb: int, mcs: int,
                      harq_pid: int, ndi: int, rv: int, tpmi: int,
                      pmi_confirm: int, tpc: int = 0, vrb_type: int = 0,
                      n_tx: int = 2) -> np.ndarray:
    nriv = math.ceil(math.log2(n_rb_dl * (n_rb_dl + 1) / 2))
    fields = [(vrb_type, 1), (_riv(n_rb_dl, rb_start, n_prb), nriv),
              (mcs, 5), (harq_pid, 3), (ndi, 1), (rv, 2), (tpc, 2),
              (tpmi, _tpmi_bits(n_tx)), (pmi_confirm, 1)]
    if n_tx == 2:
        fields.append((0, 1))
    return _pack(fields)


def unpack_dci_format1b(bits: np.ndarray, n_rb_dl: int,
                        n_tx: int = 2) -> dict:
    nriv = math.ceil(math.log2(n_rb_dl * (n_rb_dl + 1) / 2))
    r = _Reader(bits)
    vrb_type = r.take(1)
    rb_start, n_prb = _unriv(r.take(nriv), n_rb_dl)
    return dict(vrb_type=vrb_type, rb_start=rb_start, n_prb=n_prb,
                mcs=r.take(5), harq_pid=r.take(3), ndi=r.take(1),
                rv=r.take(2), tpc=r.take(2), tpmi=r.take(_tpmi_bits(n_tx)),
                pmi_confirm=r.take(1))


def dci_format1d_size(n_rb_dl: int, n_tx: int = 2) -> int:
    nriv = math.ceil(math.log2(n_rb_dl * (n_rb_dl + 1) / 2))
    return 1 + nriv + 5 + 3 + 1 + 2 + 2 + _tpmi_bits(n_tx) + 1


def pack_dci_format1d(n_rb_dl: int, rb_start: int, n_prb: int, mcs: int,
                      harq_pid: int, ndi: int, rv: int, tpmi: int,
                      dl_power_off: int, tpc: int = 0, vrb_type: int = 0,
                      n_tx: int = 2) -> np.ndarray:
    nriv = math.ceil(math.log2(n_rb_dl * (n_rb_dl + 1) / 2))
    fields = [(vrb_type, 1), (_riv(n_rb_dl, rb_start, n_prb), nriv),
              (mcs, 5), (harq_pid, 3), (ndi, 1), (rv, 2), (tpc, 2),
              (tpmi, _tpmi_bits(n_tx)), (dl_power_off, 1)]
    return _pack(fields)


def unpack_dci_format1d(bits: np.ndarray, n_rb_dl: int,
                        n_tx: int = 2) -> dict:
    nriv = math.ceil(math.log2(n_rb_dl * (n_rb_dl + 1) / 2))
    r = _Reader(bits)
    vrb_type = r.take(1)
    rb_start, n_prb = _unriv(r.take(nriv), n_rb_dl)
    return dict(vrb_type=vrb_type, rb_start=rb_start, n_prb=n_prb,
                mcs=r.take(5), harq_pid=r.take(3), ndi=r.take(1),
                rv=r.take(2), tpc=r.take(2), tpmi=r.take(_tpmi_bits(n_tx)),
                dl_power_off=r.take(1))


# --------------------------------------------------------- formats 3/3A --
# Group TPC commands for PUCCH/PUSCH power control (36.212 §5.3.3.1.6/7),
# CRC-masked with TPC-PUCCH-RNTI / TPC-PUSCH-RNTI and sized EXACTLY to
# format 0/1A so the common-search blind decode reuses one size hypothesis.
# Reference parity: dci.h sizeof_DCI3_5MHz_FDD_t 25 (= format-0 size @25RB),
# dci.c format3/3A handling.

def dci_format3_n_cmds(n_rb: int) -> int:
    return dci_format0_size(n_rb) // 2


def dci_format3a_n_cmds(n_rb: int) -> int:
    return dci_format0_size(n_rb)


def pack_dci_format3(n_rb: int, tpc_cmds) -> np.ndarray:
    """tpc_cmds: per-UE 2-bit commands (index = tpc-Index from RRC)."""
    n = dci_format3_n_cmds(n_rb)
    cmds = list(tpc_cmds) + [0] * (n - len(tpc_cmds))
    bits = _pack([(c, 2) for c in cmds[:n]])
    pad = dci_format0_size(n_rb) - len(bits)
    return np.concatenate([bits, np.zeros(pad, np.int8)]) if pad else bits


def unpack_dci_format3(bits: np.ndarray, n_rb: int) -> dict:
    r = _Reader(bits)
    return dict(tpc_cmds=tuple(r.take(2)
                               for _ in range(dci_format3_n_cmds(n_rb))))


def pack_dci_format3a(n_rb: int, tpc_cmds) -> np.ndarray:
    n = dci_format3a_n_cmds(n_rb)
    cmds = list(tpc_cmds) + [0] * (n - len(tpc_cmds))
    return _pack([(c, 1) for c in cmds[:n]])


def unpack_dci_format3a(bits: np.ndarray, n_rb: int) -> dict:
    r = _Reader(bits)
    return dict(tpc_cmds=tuple(r.take(1)
                               for _ in range(dci_format3a_n_cmds(n_rb))))
