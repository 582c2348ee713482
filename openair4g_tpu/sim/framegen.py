"""framegen: LTE downlink frame waveform generator.

Reference parity: openair1/SIMULATION/LTE_PHY/framegen.c — generates a
standards-compliant DL frame waveform (PSS/SSS/PBCH/pilots + optional
PDSCH filler) for driving signal generators / offline receivers.

The waveform is assembled on the host from the sched/enb_tx builders and
written as .npy and/or the reference's Octave write_output format.
"""
from __future__ import annotations

import numpy as np

from ..config import FrameParms
from ..sched.enb_tx import CellConfig, EnbTx
from ..phy import ofdm
from ..phy.resource_grid import make_grid_map
from ..phy.sync import pss_sequence, sss_sequence, center62_bins
from ..utils.octave_io import write_output


def generate_frame(cell: CellConfig, sfn: int = 0,
                   fill_pdsch: bool = False, seed: int = 0) -> np.ndarray:
    """One 10 ms frame [samples] (complex64): subframe 0 carries
    PSS/SSS/PBCH, subframe 5 carries PSS/SSS; all subframes carry pilots;
    optionally random-QPSK PDSCH filler on every data RE."""
    enb = EnbTx(cell)
    fp = enb.fp
    rng = np.random.default_rng(seed)
    nid1, nid2 = cell.n_id_cell // 3, cell.n_id_cell % 3
    bins62 = center62_bins(fp)
    parts = []
    for sf in range(10):
        if sf == 0:
            grid = enb.sync_subframe_host(sfn=sfn).copy()
        else:
            gm = make_grid_map(cell.n_rb, cell.n_pdcch, cell.n_id_cell,
                               subframe=sf)
            grid = np.zeros((fp.symbols_per_subframe, fp.n_fft),
                            np.complex64)
            grid[gm.pilot_sym, gm.pilot_bin] = gm.pilot_val
            if sf == 5:
                grid[5, bins62] = sss_sequence(nid1, nid2, True)
                grid[6, bins62] = pss_sequence(nid2)
            if fill_pdsch:
                q = rng.integers(0, 4, gm.n_data_re)
                qpsk = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j],
                                np.complex64) / np.sqrt(2)
                grid[gm.data_sym, gm.data_bin] = qpsk[q]
        parts.append(ofdm.ofdm_modulate_host(grid[None], fp)[0])
    return np.concatenate(parts).astype(np.complex64)


def main():
    import argparse
    p = argparse.ArgumentParser(description="DL frame waveform generator")
    p.add_argument("-B", "--n-rb", type=int, default=25)
    p.add_argument("-N", "--n-id-cell", type=int, default=0)
    p.add_argument("--sfn", type=int, default=0)
    p.add_argument("--pdsch", action="store_true")
    p.add_argument("-o", "--out", default="frame.npy")
    p.add_argument("--octave", default=None,
                   help="also dump as Octave .m (write_output format)")
    a = p.parse_args()
    cell = CellConfig(n_rb=a.n_rb, n_id_cell=a.n_id_cell)
    wave = generate_frame(cell, sfn=a.sfn, fill_pdsch=a.pdsch)
    np.save(a.out, wave)
    print(f"wrote {len(wave)} samples ({len(wave) / 15360 / 2:.1f} ms at "
          f"{FrameParms(n_rb=a.n_rb).sample_rate_hz / 1e6:.2f} Msps) "
          f"-> {a.out}")
    if a.octave:
        write_output(a.octave, "txs", wave)


if __name__ == "__main__":
    main()
