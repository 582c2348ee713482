"""scansim: carrier scan — find cells across a grid of frequency offsets.

Reference parity: openair1/SIMULATION/LTE_PHY/scansim.c (sweeps candidate
carriers running initial_sync at each) — here a batched coarse-CFO x
cell-search scan: each frequency hypothesis de-rotates the capture and the
strongest PSS correlation across hypotheses wins.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FrameParms
from ..phy.sync import CellSearch, estimate_cfo


@dataclass(frozen=True)
class ScanConfig:
    n_rb: int = 25
    # coarse frequency hypotheses, in subcarrier spacings
    freq_hyps: tuple = (-2.0, -1.0, 0.0, 1.0, 2.0)


class CarrierScan:
    def __init__(self, cfg: ScanConfig):
        self.cfg = cfg
        self.fp = FrameParms(n_rb=cfg.n_rb)
        self.search = CellSearch(self.fp)
        self._jit = jax.jit(self._scan)

    def _scan(self, cap):
        """cap [B, L] -> best hypothesis per trial + its search result."""
        fp = self.fp
        L = cap.shape[-1]
        t = jnp.arange(L)
        res_by_h = []
        for f in self.cfg.freq_hyps:
            derot = cap * jnp.exp(-2j * np.pi * f / fp.n_fft * t)
            r = self.search.search(derot)
            res_by_h.append(r)
        peaks = jnp.stack([r["peak"] for r in res_by_h])      # [H, B]
        best = jnp.argmax(peaks, axis=0)                      # [B]

        def sel(key):
            vals = jnp.stack([r[key] for r in res_by_h])      # [H, B]
            return jnp.take_along_axis(vals, best[None, :], axis=0)[0]

        out = {k: sel(k) for k in ("nid1", "nid2", "pss_pos", "half")}
        out["hyp"] = best
        out["coarse_cfo"] = jnp.asarray(self.cfg.freq_hyps)[best]
        # residual fine CFO at the winning hypothesis
        derot = cap * jnp.exp(-2j * np.pi / fp.n_fft
                              * out["coarse_cfo"][:, None] * t[None, :])
        out["fine_cfo"] = estimate_cfo(derot, out["pss_pos"], out["nid2"],
                                       fp.n_fft)
        return out

    def scan(self, cap):
        return {k: np.asarray(v) for k, v in self._jit(cap).items()}
