"""PBCH / PDCCH reference-data anchors (round-2 verdict item 7).

Reference corpora:
  * SIMULATION/LTE_PHY/pbch_awgn.txt — PBCH BLER vs SNR (the table the
    abstraction polynomial fits, abstraction.c:246-290): BLER 0.499 at
    -6.2 dB, 0.088 at -4.2 dB, 0.0092 at -2.2 dB.
  * REFERENCE_DATA/pdcch_20MHz_awgn.m — format-0 missed-detection vs SNR
    per aggregation level at 20 MHz: L=4 Pe~0.49 @ -0.4 dB, L=8 Pe~0.27
    @ -2.0 dB.

Our float receiver with 2D-LMMSE estimation beats the reference's
Q15 + 24-tap-FIR receiver on both channels (PBCH ~0.7 dB, PDCCH blind
decode several dB at 20 MHz); the anchors therefore assert (a) we are at
least as good as the reference at its published points and (b) our OWN
waterfall stays pinned (regression bounds from 512-trial measurements).
"""
import numpy as np
import pytest

from openair4g_tpu.sim.pbchsim import Pbchsim, PbchsimConfig
from openair4g_tpu.sim.pdcchsim import Pdcchsim, PdcchsimConfig

# (snr_db, reference BLER) from pbch_awgn.txt
PBCH_REF = [(-6.2, 0.499), (-4.2, 0.088), (-2.2, 0.0092)]
# (L, snr_db, reference missed-detection) from pdcch_20MHz_awgn.m (Fmt0)
PDCCH_REF = [(4, -0.4, 0.49), (8, -2.0, 0.27)]


def test_pbch_beats_reference_curve():
    sim = Pbchsim(PbchsimConfig(batch=256))
    for snr, ref in PBCH_REF:
        r = sim.run_snr(snr, n_batches=2)
        assert r["bler"] <= ref + 0.05, (snr, r["bler"], ref)


def test_pbch_own_waterfall_pinned():
    """Regression anchor: our 50% point sits at -6.9 +- 0.4 dB
    (measured 0.434 at -7.0 dB, 512 trials)."""
    sim = Pbchsim(PbchsimConfig(batch=256))
    r = sim.run_snr(-7.0, n_batches=2)
    assert 0.28 <= r["bler"] <= 0.58, r["bler"]
    r = sim.run_snr(-5.0, n_batches=2)
    assert r["bler"] <= 0.10, r["bler"]


def test_pdcch_beats_reference_curve_20mhz():
    for L, snr, ref in PDCCH_REF:
        sim = Pdcchsim(PdcchsimConfig(n_rb=100, n_pdcch=2, L=L, batch=128))
        r = sim.run_snr(snr, n_batches=2)
        assert r["dci_err"] <= min(ref, 0.05), (L, snr, r)


def test_pdcch_own_waterfall_pinned_20mhz():
    """Regression anchors from 512-trial measurements: L=4 err 0.074 at
    -3.0 dB; L=8 err 0.148 at -6.0 dB."""
    sim4 = Pdcchsim(PdcchsimConfig(n_rb=100, n_pdcch=2, L=4, batch=128))
    r = sim4.run_snr(-3.0, n_batches=4)
    assert 0.02 <= r["dci_err"] <= 0.17, r
    sim8 = Pdcchsim(PdcchsimConfig(n_rb=100, n_pdcch=2, L=8, batch=128))
    r = sim8.run_snr(-6.0, n_batches=4)
    assert 0.05 <= r["dci_err"] <= 0.28, r
