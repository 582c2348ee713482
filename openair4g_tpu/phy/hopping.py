"""UL sequence-group / sequence / cyclic-shift hopping, 36.211 §5.5.1.3-4,
§5.5.2.1.1.

Reference parity: openair1/PHY/LTE_TRANSPORT/group_hopping.c (f_gh, f_ss
patterns) and drs_modulation.c (per-slot cyclic shift n_PN).

All patterns are tiny per-cell constants computed once on the host from the
Gold sequence generator (ops/gold.py); device code only sees the resulting
per-slot DMRS constants.
"""
from __future__ import annotations

import functools

import numpy as np

from ..ops.gold import gold_sequence
from .ulref import zc_base_sequence


@functools.lru_cache(maxsize=None)
def group_hop_pattern(nid_cell: int, enabled: bool = True) -> np.ndarray:
    """f_gh(ns) for ns in [0, 20): 8 Gold bits per slot mod 30
    (36.211 §5.5.1.3, c_init = floor(Nid/30))."""
    if not enabled:
        return np.zeros(20, np.int32)
    c = np.asarray(gold_sequence(nid_cell // 30, 160))
    w = 1 << np.arange(8)
    return (c.reshape(20, 8) @ w % 30).astype(np.int32)


def f_ss_pusch(nid_cell: int, delta_ss: int = 0) -> int:
    return (nid_cell % 30 + delta_ss) % 30


def f_ss_pucch(nid_cell: int) -> int:
    return nid_cell % 30


def pusch_group_number(nid_cell: int, ns: int, group_hopping: bool = True,
                       delta_ss: int = 0) -> int:
    """u(ns) = (f_gh(ns) + f_ss^PUSCH) mod 30."""
    fgh = int(group_hop_pattern(nid_cell, group_hopping)[ns % 20])
    return (fgh + f_ss_pusch(nid_cell, delta_ss)) % 30


@functools.lru_cache(maxsize=None)
def sequence_hop_pattern(nid_cell: int, delta_ss: int = 0,
                         enabled: bool = False) -> np.ndarray:
    """v(ns): base-sequence number hopping (only when group hopping is OFF
    and M_sc >= 6 RB; c_init = floor(Nid/30)*32 + f_ss^PUSCH)."""
    if not enabled:
        return np.zeros(20, np.int32)
    cinit = (nid_cell // 30) * 32 + f_ss_pusch(nid_cell, delta_ss)
    return np.asarray(gold_sequence(cinit, 20), np.int32)


@functools.lru_cache(maxsize=None)
def dmrs_cs_hop_pattern(nid_cell: int, delta_ss: int = 0,
                        nsymb_ul: int = 7) -> np.ndarray:
    """n_PN(ns): per-slot pseudo-random cyclic-shift offset of the PUSCH
    DMRS (36.211 §5.5.2.1.1; c_init = floor(Nid/30)*32 + f_ss^PUSCH)."""
    cinit = (nid_cell // 30) * 32 + f_ss_pusch(nid_cell, delta_ss)
    c = np.asarray(gold_sequence(cinit, 8 * nsymb_ul * 20 * 2))
    w = 1 << np.arange(8)
    out = np.zeros(20, np.int32)
    for ns in range(20):
        out[ns] = int(c[8 * nsymb_ul * 2 * ns: 8 * nsymb_ul * 2 * ns + 8] @ w)
    return out % 12


def pusch_dmrs_slots(m_sc: int, nid_cell: int, subframe: int,
                     n_dmrs1: int = 0, n_dmrs2: int = 0,
                     group_hopping: bool = True, sequence_hopping: bool = False,
                     cs_hopping: bool = True, delta_ss: int = 0) -> np.ndarray:
    """Per-slot PUSCH DMRS [2, m_sc] with group/sequence/CS hopping.

    Generalizes ulref.pusch_dmrs (which is the hopping-off special case)."""
    out = np.zeros((2, m_sc), np.complex64)
    vpat = sequence_hop_pattern(nid_cell, delta_ss,
                                sequence_hopping and not group_hopping
                                and m_sc >= 72)
    cspat = dmrs_cs_hop_pattern(nid_cell, delta_ss) if cs_hopping else \
        np.zeros(20, np.int32)
    for i, ns in enumerate((2 * subframe, 2 * subframe + 1)):
        u = pusch_group_number(nid_cell, ns, group_hopping, delta_ss)
        v = int(vpat[ns % 20])
        ncs = (n_dmrs1 + n_dmrs2 + int(cspat[ns % 20])) % 12
        alpha = 2.0 * np.pi * ncs / 12.0
        n = np.arange(m_sc)
        out[i] = np.exp(1j * alpha * n) * zc_base_sequence(u, v, m_sc)
    return out
