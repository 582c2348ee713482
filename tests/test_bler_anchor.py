"""BLER waterfall anchor: the estimated-CE AWGN curve must stay within
~0.5 dB of its validated location (VALIDATION.md; reference corpus
bler_tx1_chan18_nrx1_mcs4.csv). Reduced trials for CI — the assertions
use operating points where 256 trials give unambiguous margins."""
import numpy as np

from openair4g_tpu.sim.dlsim import DlsimFading, DlsimFadingConfig


def test_mcs4_estimated_ce_waterfall_location():
    sim = DlsimFading(DlsimFadingConfig(mcs=4, n_rb=25, channel="AWGN",
                                        batch=128, n_turbo_iter=8,
                                        n_harq_rounds=1))
    # 1 dB below the knee: essentially everything fails
    errs, reach = sim.run_snr(-1.0, 256)
    assert errs[0] >= reach[0] * 0.9, (errs, reach)
    # reference 10% point +0.6 dB: we must beat it (float margin),
    # but not by more than ~1 dB (catches SNR-calibration bugs)
    errs, reach = sim.run_snr(0.6, 256)
    assert errs[0] <= reach[0] * 0.1, (errs, reach)
    errs, reach = sim.run_snr(-0.6, 256)
    assert errs[0] >= reach[0] * 0.5, (errs, reach)


def test_mcs4_perfect_ce_beats_reference_anchor():
    sim = DlsimFading(DlsimFadingConfig(mcs=4, n_rb=25, channel="AWGN",
                                        batch=128, n_turbo_iter=8,
                                        n_harq_rounds=1, perfect_ce=True))
    errs, reach = sim.run_snr(0.6, 256)    # reference <0.1 here
    assert errs[0] == 0, (errs, reach)
