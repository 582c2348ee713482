"""UE-specific reference signals (antenna port 5) and TM7 beamforming,
36.211 §6.10.3.

Reference parity: openair1/PHY/LTE_REFSIG/lte_dl_uespec.c (lte_gold_ue_spec
— per-RNTI Gold sequence, c_init = (ns/2+1)(2Nid+1)2^16 + rnti) and the
TM7 path of dlsch_modulation.c (data and DMRS transmitted through the same
arbitrary beamforming vector, so the UE estimates the *effective* beamformed
channel directly from port 5 — no codebook).

TPU-native: the RS lattice is one static map per allocation; beamforming is
an outer product with the beam vector; channel estimation is LS at the RS
comb + the same delay-domain LMMSE smoother as the cell-specific path.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..config import FrameParms
from ..ops.gold import gold_sequence

# port-5 RS symbols within a subframe (normal CP) and per-symbol comb
# offsets: density 12 RE/PRB/subframe on a spacing-4 comb (36.211 Fig.
# 6.10.3.2-1)
UE_RS_SYMS = (3, 6, 9, 12)
UE_RS_OFFS = (0, 2, 0, 2)


def ue_rs_values(rnti: int, nid_cell: int, subframe: int, sym: int,
                 n_prb: int) -> np.ndarray:
    """QPSK r(m) for one RS symbol over n_prb PRBs (3 REs/PRB).

    c_init = ((ns/2)+1) * (2*Nid+1) * 2^16 + rnti (36.211 §6.10.3.1)."""
    ns = 2 * subframe + (1 if sym >= 7 else 0)
    cinit = (((ns // 2) + 1) * (2 * nid_cell + 1) << 16) + rnti
    c = gold_sequence(cinit, 6 * n_prb).astype(np.float64)
    m = np.arange(3 * n_prb)
    re = (1 - 2 * c[2 * m]) / np.sqrt(2)
    im = (1 - 2 * c[2 * m + 1]) / np.sqrt(2)
    return (re + 1j * im).astype(np.complex64)


@dataclass(frozen=True)
class UeSpecMap:
    """RE map of one TM7 allocation: beamformed data + port-5 RS."""
    fp: FrameParms
    rb_start: int
    n_prb: int
    n_data_re: int
    data_sym: np.ndarray
    data_sc: np.ndarray
    data_bin: np.ndarray
    rs_sym: np.ndarray
    rs_sc: np.ndarray
    rs_bin: np.ndarray
    rs_val: np.ndarray


@functools.lru_cache(maxsize=None)
def make_uespec_map(n_rb: int, rb_start: int, n_prb: int, rnti: int,
                    nid_cell: int = 0, subframe: int = 7,
                    n_pdcch: int = 1) -> UeSpecMap:
    """Data REs = allocation minus cell RS (port 0) minus port-5 RS."""
    from .resource_grid import pilot_symbol_indices, pilot_sc_positions
    fp = FrameParms(n_rb=n_rb, n_id_cell=nid_cell)
    crs_syms = set(pilot_symbol_indices(fp))
    rs_sym, rs_sc, rs_val = [], [], []
    rs_at = {}
    for sym, off in zip(UE_RS_SYMS, UE_RS_OFFS):
        k = 12 * rb_start + np.arange(off, 12 * n_prb, 4, dtype=np.int32)
        rs_at[sym] = set(k.tolist())
        rs_sym.append(np.full(len(k), sym, np.int32))
        rs_sc.append(k)
        rs_val.append(ue_rs_values(rnti, nid_cell, subframe, sym, n_prb))
    rs_sym = np.concatenate(rs_sym)
    rs_sc = np.concatenate(rs_sc)
    rs_val = np.concatenate(rs_val)

    data_sym, data_sc = [], []
    for sym in range(n_pdcch, fp.symbols_per_subframe):
        skip = set(rs_at.get(sym, set()))
        if sym in crs_syms:
            skip |= set(pilot_sc_positions(fp, sym, 0).tolist())
        for k in range(12 * rb_start, 12 * (rb_start + n_prb)):
            if k not in skip:
                data_sym.append(sym)
                data_sc.append(k)
    data_sym = np.asarray(data_sym, np.int32)
    data_sc = np.asarray(data_sc, np.int32)
    return UeSpecMap(fp=fp, rb_start=rb_start, n_prb=n_prb,
                     n_data_re=len(data_sym), data_sym=data_sym,
                     data_sc=data_sc, data_bin=fp.sc_to_bin(data_sc),
                     rs_sym=rs_sym, rs_sc=rs_sc,
                     rs_bin=fp.sc_to_bin(rs_sc), rs_val=rs_val)


def tm7_fill_ports(symbols, um: UeSpecMap, beam):
    """symbols [B, n_data_re], beam [B, P] -> per-port grids [B, P, 14, F].

    Data AND port-5 RS go through the same beam (the whole point of TM7:
    the UE sees one effective channel h_eff = H @ w)."""
    B = symbols.shape[0]
    fp = um.fp
    P = beam.shape[1]
    grid = jnp.zeros((B, fp.symbols_per_subframe, fp.n_fft), jnp.complex64)
    grid = grid.at[:, jnp.asarray(um.data_sym),
                   jnp.asarray(um.data_bin)].set(symbols)
    grid = grid.at[:, jnp.asarray(um.rs_sym), jnp.asarray(um.rs_bin)].set(
        jnp.asarray(um.rs_val))
    return grid[:, None] * beam[:, :, None, None]


def tm7_estimate(rgrid, um: UeSpecMap, n0: float):
    """LS at the port-5 comb -> delay-domain LMMSE smooth -> per-symbol
    linear time interpolation. rgrid [B, 14, F] -> h_eff [B, n_data_re]."""
    fp = um.fp
    n_per = 3 * um.n_prb
    hs = []
    for i, sym in enumerate(UE_RS_SYMS):
        W = _uespec_wiener(fp.n_rb, um.n_prb, float(n0), UE_RS_OFFS[i])
        sl = slice(i * n_per, (i + 1) * n_per)
        ls = rgrid[:, sym, jnp.asarray(um.rs_bin[sl])] * \
            jnp.conj(jnp.asarray(um.rs_val[sl]))
        hs.append(jnp.matmul(ls, jnp.asarray(W),
                             preferred_element_type=jnp.complex64))
    h_rs = jnp.stack(hs, axis=1)       # [B, 4, n_sc_alloc]
    # quasi-static assumption (beamformed PDSCH): average over RS symbols
    h_bar = jnp.mean(h_rs, axis=1)     # [B, 12*n_prb]
    rel = um.data_sc - 12 * um.rb_start
    return h_bar[:, jnp.asarray(rel)]


@functools.lru_cache(maxsize=None)
def _uespec_wiener(n_rb: int, n_prb: int, n0: float,
                   off: int = 0) -> np.ndarray:
    """[3*n_prb, 12*n_prb] LMMSE interpolator from the spacing-4 comb (at
    offset `off`) to every subcarrier of the allocation (delay prior
    uniform over the CP)."""
    fp = FrameParms(n_rb=n_rb)
    k_rs = np.arange(off, 12 * n_prb, 4)
    k_all = np.arange(12 * n_prb)
    L = fp.cp
    taps = np.arange(L)
    F_rs = np.exp(-2j * np.pi * k_rs[:, None] * taps[None, :] / fp.n_fft)
    F_all = np.exp(-2j * np.pi * k_all[:, None] * taps[None, :] / fp.n_fft)
    P = 1.0 / L
    A = (F_rs * P) @ F_rs.conj().T + n0 * np.eye(len(k_rs))
    W = (F_all * P) @ F_rs.conj().T @ np.linalg.inv(A)   # [12n, 3n]
    return W.T.astype(np.complex64)                       # ls @ W
