"""PRACH detection-threshold ROC calibration (VERDICT r3 weak #7).

Sweeps the normalized-peak threshold over many noise-only occasions (per
threshold: false-alarm probability of ANY preamble firing) against the
detection rate at the link-budget SNR. Output pins the production default
threshold in phy/prach.py.

Usage:  python scripts/prach_roc.py [n_batches] [out.json]
"""
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out_path = sys.argv[2] if len(sys.argv) > 2 else "prach_roc.json"
    from openair4g_tpu.sim.prachsim import Prachsim, PrachsimConfig

    ths = np.arange(6.0, 30.0, 1.0)
    out = {}
    for name, cfg, snr in [
        ("fmt0_ncs13", PrachsimConfig(batch=256), -6.0),
        ("fmt0_ncs13_lowsnr", PrachsimConfig(batch=256), -12.0),
        ("restricted_ncs15",
         PrachsimConfig(root_u=500, ncs=15, high_speed=True, max_delay=10,
                        batch=256), -6.0),
        ("fmt4_ncs15",
         PrachsimConfig(root_u=3, ncs=15, fmt=4, max_delay=6, batch=256),
         -6.0),
    ]:
        sim = Prachsim(cfg)
        rows = sim.roc(snr, ths, n_batches=n_batches)
        # operating point: smallest threshold with FA < 1e-3/occasion
        ok = [r for r in rows if r["fa_per_occasion"] < 1e-3]
        op = ok[0] if ok else rows[-1]
        out[name] = dict(snr_db=snr, rows=rows, operating_point=op,
                         occasions=n_batches * cfg.batch)
        print(f"{name}: th*={op['threshold']} det={op['det_rate']:.4f} "
              f"fa={op['fa_per_occasion']:.2e} "
              f"({n_batches * cfg.batch} occasions)", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
