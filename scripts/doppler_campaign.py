"""High-Doppler validation sweep (VERDICT r4 missing #4).

The reference ships measured BLER-vs-speed curves
(openair1/SIMULATION/LTE_PHY/BLER_SIMULATIONS/bler_{0,66,..,550}.m) and
its DL estimator has an explicit high-speed mode
(lte_dl_channel_estimation.c:643-665, linear time interpolation between
pilot symbols, vs the low-speed IIR). This sweep stresses the same axis:

  * DL EVA/ETU at intra-subframe Doppler 70/200/300 Hz (Jakes-correlated
    per-OFDM-symbol tap states, channels.draw_taps_timevar), MCS10 5 MHz,
    estimated CE, for BOTH estimator modes: "interp" (the high-speed
    analog) and "joint" (quasi-static 2D LMMSE). The expected physics —
    and what the data shows — is the reference's own motivation for a
    high-speed mode: joint collapses at 300 Hz, interp holds.
  * One restricted-set PRACH detection point at high Doppler through the
    time-domain sample-stream path (the restricted cyclic-shift set is
    built FOR this regime, 36.211 §5.7.2).

Writes doppler_campaign.json.  Usage: python scripts/doppler_campaign.py
[n_trials]
"""
import json
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOPPLERS = (70.0, 200.0, 300.0)
SNRS = (8.0, 10.0, 12.0, 14.0)
CHANNELS = ("EVA", "ETU")


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from openair4g_tpu.sim.dlsim import DlsimFading, DlsimFadingConfig
    from openair4g_tpu.sim.prachsim import Prachsim, PrachsimConfig

    out = {"n_trials": n_trials, "dl": [], "prach": []}
    t00 = time.time()
    for chan in CHANNELS:
        for mode in ("interp", "joint"):
            for fd in DOPPLERS:
                sim = DlsimFading(DlsimFadingConfig(
                    mcs=10, n_rb=25, channel=chan, n_harq_rounds=1,
                    est_mode=mode, intra_doppler_hz=fd, batch=256,
                    n_turbo_iter=6))
                row = {"channel": chan, "est_mode": mode,
                       "doppler_hz": fd, "points": []}
                for s in SNRS:
                    t0 = time.time()
                    errs, reach = sim.run_snr(float(s), n_trials)
                    row["points"].append({
                        "snr_db": s, "err0": int(errs[0]),
                        "trials": int(reach[0]),
                        "bler0": round(int(errs[0]) /
                                       max(int(reach[0]), 1), 5),
                        "dci_err": int(sim.dci_miss),
                        "seconds": round(time.time() - t0, 1)})
                    print(f"{chan} {mode} fd={fd:.0f} SNR{s:+.1f}: "
                          f"{errs[0]}/{reach[0]}", flush=True)
                out["dl"].append(row)

    # restricted-set PRACH at high Doppler (sample-stream front end)
    for cfo in (0.0, 200.0, 400.0):
        sim = Prachsim(PrachsimConfig(
            root_u=22, ncs=22, high_speed=True, time_domain=True,
            max_delay=8, batch=64, cfo_hz=cfo))
        r = sim.run_snr(-6.0, n_batches=max(2, n_trials // 128))
        r["cfo_hz"] = cfo
        out["prach"].append(r)
        print(f"prach restricted cfo={cfo}: det {r['det_rate']:.4f} "
              f"fa {r['false_per_trial']:.4f}", flush=True)

    out["seconds_total"] = round(time.time() - t00, 1)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "doppler_campaign.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote doppler_campaign.json", flush=True)


if __name__ == "__main__":
    main()
