"""Sweep harness: reference-schema CSV output + checkpoint/resume + CLI.

Reference parity:
  * CSV schema `SNR;MCS;TBS;rate;err0;trials0;...` matches the reference's
    BLER corpus (SIMULATION/LTE_PHY/BLER_SIMULATIONS/AWGN/AWGN_results/
    bler_tx1_chan18_nrx1_mcs*.csv, written live at dlsim.c:779,3821).
  * Early-exit heuristic mirrors dlsim.c's
    `if ((errs[0]>=n_frames/10) && (trials>(n_frames/2))) break`.
  * Checkpoint/resume: the reference restarts sweeps by appending to its
    CSV; here sweep state (per-SNR accumulators + RNG stream index) is a
    JSON sidecar so long multi-host sweeps resume exactly (SURVEY.md §5
    checkpoint/resume requirement).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np


def write_bler_csv(path: str, rows, mcs: int, tbs: int, rate: float,
                   dci_err: int = 0):
    """rows: list of (snr, errs [R], trials [R], bler [R])."""
    with open(path, "w") as f:
        for snr, errs, trials, _ in rows:
            cols = [f"{snr:g}", str(mcs), str(tbs), f"{rate:.6f}"]
            for e, t in zip(errs, trials):
                cols += [str(int(e)), str(int(t))]
            cols.append(str(dci_err))
            f.write(";".join(cols) + "\n")


@dataclass
class SweepState:
    """Resumable sweep accumulator, persisted as JSON."""
    config: dict
    seed: int = 0
    # per-SNR: {"errs": [R], "trials": [R], "streams": n_streams_done}
    points: dict = field(default_factory=dict)

    @classmethod
    def load(cls, path: str, config: dict, seed: int = 0) -> "SweepState":
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            if d["config"] == config and d["seed"] == seed:
                return cls(config=config, seed=d["seed"], points=d["points"])
            # config changed: start fresh (stale checkpoint ignored)
        return cls(config=config, seed=seed)

    def save(self, path: str):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"config": self.config, "seed": self.seed,
                       "points": self.points}, f)
        os.replace(tmp, path)

    def get(self, snr: float):
        return self.points.get(f"{snr:g}")

    def update(self, snr: float, errs, trials, streams: int):
        self.points[f"{snr:g}"] = {
            "errs": [int(x) for x in np.atleast_1d(errs)],
            "trials": [int(x) for x in np.atleast_1d(trials)],
            "streams": int(streams)}


def resumable_sweep(sim, snrs, n_frames: int, ckpt_path: str | None = None,
                    seed: int = 0, verbose: bool = True,
                    early_exit: bool = True):
    """SNR sweep with per-point checkpointing.

    `sim` must expose .cfg (dataclass), .run_snr(snr, n_frames, seed) ->
    (errs, trials) arrays, and .cfg.batch. Completed SNR points are skipped
    on resume; partially-complete points re-run only the missing streams.
    """
    import dataclasses
    config = dataclasses.asdict(sim.cfg)
    state = (SweepState.load(ckpt_path, config, seed) if ckpt_path
             else SweepState(config=config, seed=seed))
    rows = []
    n_streams = -(-n_frames // sim.cfg.batch)
    for s in snrs:
        s = float(s)
        done = state.get(s)
        if done and done["streams"] >= n_streams:
            errs = np.asarray(done["errs"], np.int64)
            trials = np.asarray(done["trials"], np.int64)
        else:
            errs, trials = sim.run_snr(s, n_frames, seed)
            state.update(s, errs, trials, n_streams)
            if ckpt_path:
                state.save(ckpt_path)
        errs = np.atleast_1d(errs)
        # scalar trials (e.g. per-codeword errs sharing one trial count)
        trials = np.broadcast_to(np.atleast_1d(trials), errs.shape)
        bler = errs / np.maximum(trials, 1)
        rows.append((s, errs, trials, bler))
        if verbose:
            txt = " ".join(f"r{r}:{bler[r]:.4f}({errs[r]}/{trials[r]})"
                           for r in range(len(bler)))
            print(f"SNR {s:+6.2f} dB: {txt}", flush=True)
        if early_exit and errs[-1] == 0:
            break
    return rows


def dlsim_main(argv=None):
    """dlsim-compatible CLI (flag spirit of dlsim.c:233-700)."""
    import argparse
    from .dlsim import (DlsimConfig, DlsimAwgn, DlsimFadingConfig,
                        DlsimFading)
    from ..tables.tbs import get_TBS_DL, get_Qm, get_G_dl

    p = argparse.ArgumentParser(
        prog="dlsim", description="PDSCH BLER Monte-Carlo (dlsim equivalent)")
    p.add_argument("-m", "--mcs", type=int, default=4)
    p.add_argument("-B", "--n-rb", type=int, default=25)
    p.add_argument("-x", "--tm", type=int, default=1,
                   help="transmission mode: 1 SISO | 2 SFBC | 3-6 SM")
    p.add_argument("-g", "--channel", default="AWGN",
                   help="AWGN | EPA | EVA | ETU")
    p.add_argument("-s", "--snr0", type=float, default=-4.0)
    p.add_argument("-S", "--snr1", type=float, default=4.0)
    p.add_argument("-i", "--snr-step", type=float, default=0.5)
    p.add_argument("-n", "--n-frames", type=int, default=1024)
    p.add_argument("-b", "--batch", type=int, default=128)
    p.add_argument("-t", "--turbo-iter", type=int, default=8)
    p.add_argument("-r", "--harq-rounds", type=int, default=4)
    p.add_argument("-o", "--csv", default=None, help="output CSV path")
    p.add_argument("--ckpt", default=None, help="checkpoint JSON path")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    snrs = np.arange(a.snr0, a.snr1 + 1e-9, a.snr_step)
    if a.tm == 2:
        from .dlsim_mimo import DlsimTxDiv, DlsimTxDivConfig
        sim = DlsimTxDiv(DlsimTxDivConfig(mcs=a.mcs, n_rb=a.n_rb,
                                          batch=a.batch,
                                          n_turbo_iter=a.turbo_iter))
    elif a.tm in (3, 4, 5, 6):
        from .dlsim_sm import DlsimSm, DlsimSmConfig
        sim = DlsimSm(DlsimSmConfig(tm=a.tm, mcs=a.mcs, n_rb=a.n_rb,
                                    batch=a.batch,
                                    n_turbo_iter=a.turbo_iter))
    elif a.channel.upper() == "AWGN":
        sim = DlsimAwgn(DlsimConfig(mcs=a.mcs, n_rb=a.n_rb, batch=a.batch,
                                    n_turbo_iter=a.turbo_iter))
    else:
        sim = DlsimFading(DlsimFadingConfig(
            mcs=a.mcs, n_rb=a.n_rb, batch=a.batch,
            n_turbo_iter=a.turbo_iter, channel=a.channel.upper(),
            n_harq_rounds=a.harq_rounds))
    rows = resumable_sweep(sim, snrs, a.n_frames, ckpt_path=a.ckpt,
                           seed=a.seed)
    if a.csv:
        tbs = get_TBS_DL(a.mcs, a.n_rb)
        G = get_G_dl(a.n_rb, get_Qm(a.mcs), 1)
        write_bler_csv(a.csv, rows, a.mcs, tbs, tbs / G)
        print(f"wrote {a.csv}")
    return rows


def fullsim_main(argv=None):
    """Full-chain (eNB TX -> UE RX incl. control channels) sweep CLI with
    the same CSV schema; the dci_err column carries real blind-decode
    misses (dlsim.c errs[0] accounting)."""
    import argparse
    from .fullsim import FullChainSim, FullsimConfig
    from ..tables.tbs import get_TBS_DL, get_Qm, get_G_dl

    p = argparse.ArgumentParser(
        prog="fullsim", description="full eNB-TX -> UE-RX chain BLER")
    p.add_argument("-m", "--mcs", type=int, default=4)
    p.add_argument("-B", "--n-rb", type=int, default=25)
    p.add_argument("-g", "--channel", default="AWGN")
    p.add_argument("-s", "--snr0", type=float, default=-4.0)
    p.add_argument("-S", "--snr1", type=float, default=4.0)
    p.add_argument("-i", "--snr-step", type=float, default=0.5)
    p.add_argument("-n", "--n-frames", type=int, default=256)
    p.add_argument("-b", "--batch", type=int, default=32)
    p.add_argument("-r", "--harq-rounds", type=int, default=4)
    p.add_argument("-o", "--csv", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    sim = FullChainSim(FullsimConfig(
        n_rb=a.n_rb, mcs=a.mcs, channel=a.channel.upper(), batch=a.batch,
        n_harq_rounds=a.harq_rounds))
    snrs = np.arange(a.snr0, a.snr1 + 1e-9, a.snr_step)
    rows = resumable_sweep(sim, snrs, a.n_frames, ckpt_path=a.ckpt,
                           seed=a.seed)
    if a.csv:
        tbs = get_TBS_DL(a.mcs, a.n_rb)
        G = get_G_dl(a.n_rb, get_Qm(a.mcs), 1)
        write_bler_csv(a.csv, rows, a.mcs, tbs, tbs / G,
                       dci_err=getattr(sim, "dci_miss", 0))
        print(f"wrote {a.csv}")
    return rows
