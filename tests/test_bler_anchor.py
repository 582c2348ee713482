"""BLER waterfall anchor: the estimated-CE AWGN curve must stay within
~0.5 dB of its validated location (VALIDATION.md; reference corpus
bler_tx1_chan18_nrx1_mcs4.csv). Reduced trials for CI — the assertions
use operating points where 256 trials give unambiguous margins."""
import numpy as np

from openair4g_tpu.sim.dlsim import DlsimFading, DlsimFadingConfig


def test_mcs4_estimated_ce_waterfall_location():
    """Estimated-CE waterfall pinned at its validated location. The
    exp-delay-prior LMMSE estimator puts the knee at -1.8 dB, ~2.4 dB left
    of the reference corpus knee (+0.6 dB, bler_tx1_chan18_nrx1_mcs4.csv)
    and ~0.5 dB right of perfect-CE — a documented estimator gain
    (VALIDATION.md); the assertions below catch regressions >0.4 dB in
    either direction (incl. SNR-calibration bugs)."""
    sim = DlsimFading(DlsimFadingConfig(mcs=4, n_rb=25, channel="AWGN",
                                        batch=128, n_turbo_iter=8,
                                        n_harq_rounds=1))
    # below the knee: essentially everything fails
    errs, reach = sim.run_snr(-2.6, 256)
    assert errs[0] >= reach[0] * 0.9, (errs, reach)
    # mid-knee
    errs, reach = sim.run_snr(-1.8, 256)
    assert reach[0] * 0.2 <= errs[0] <= reach[0] * 0.8, (errs, reach)
    # above the knee
    errs, reach = sim.run_snr(-1.0, 256)
    assert errs[0] <= reach[0] * 0.1, (errs, reach)


def test_mcs4_perfect_ce_beats_reference_anchor():
    sim = DlsimFading(DlsimFadingConfig(mcs=4, n_rb=25, channel="AWGN",
                                        batch=128, n_turbo_iter=8,
                                        n_harq_rounds=1, perfect_ce=True))
    errs, reach = sim.run_snr(0.6, 256)    # reference <0.1 here
    assert errs[0] == 0, (errs, reach)
