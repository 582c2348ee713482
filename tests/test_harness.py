"""Tests for the sweep harness (CSV schema, checkpoint/resume, profiler)."""
import os
import numpy as np

from openair4g_tpu.sim.harness import (write_bler_csv, SweepState,
                                       resumable_sweep)
from openair4g_tpu.utils import profiler


class TestCsv:
    def test_reference_schema(self, tmp_path):
        rows = [(-2.0, np.array([10, 3]), np.array([100, 10]),
                 np.array([0.1, 0.3]))]
        path = str(tmp_path / "b.csv")
        write_bler_csv(path, rows, mcs=5, tbs=2216, rate=0.3)
        line = open(path).read().strip()
        cols = line.split(";")
        assert cols[:4] == ["-2", "5", "2216", "0.300000"]
        assert cols[4:8] == ["10", "100", "3", "10"]
        assert cols[-1] == "0"   # dci_err


class TestCheckpoint:
    def test_roundtrip_and_stale_config(self, tmp_path):
        path = str(tmp_path / "ck.json")
        st = SweepState(config={"mcs": 4}, seed=1)
        st.update(-2.0, [5], [64], 2)
        st.save(path)
        st2 = SweepState.load(path, {"mcs": 4}, seed=1)
        assert st2.get(-2.0) == {"errs": [5], "trials": [64], "streams": 2}
        # different config invalidates the checkpoint
        st3 = SweepState.load(path, {"mcs": 5}, seed=1)
        assert st3.get(-2.0) is None

    def test_resume_skips_completed(self, tmp_path):
        calls = []

        class FakeSim:
            from dataclasses import dataclass

            @dataclass(frozen=True)
            class _C:
                batch: int = 8
            cfg = _C()

            def run_snr(self, s, n, seed):
                calls.append(s)
                return np.array([1]), np.array([8])

        path = str(tmp_path / "ck.json")
        sim = FakeSim()
        resumable_sweep(sim, [-1.0, 0.0], 8, ckpt_path=path, verbose=False,
                        early_exit=False)
        assert calls == [-1.0, 0.0]
        calls.clear()
        resumable_sweep(sim, [-1.0, 0.0], 8, ckpt_path=path, verbose=False,
                        early_exit=False)
        assert calls == []   # all cached


class TestProfiler:
    def test_stats(self):
        profiler.reset_meas()

        @profiler.timed("stage_x")
        def f():
            return sum(range(1000))

        for _ in range(3):
            f()
        stats = profiler.get_meas()
        assert stats["stage_x"][0] == 3
        assert stats["stage_x"][1] > 0
        profiler.reset_meas("stage_x")
        assert "stage_x" not in profiler.get_meas()


def test_dlsim_cli_tm_modes(tmp_path):
    """-x flag routes to the TM2 (SFBC) and TM3 (SM) simulators and the
    CSV schema stays reference-compatible."""
    from openair4g_tpu.sim.harness import dlsim_main
    csv = str(tmp_path / "tm3.csv")
    rows = dlsim_main(["-x", "3", "-m", "4", "-B", "6", "-s", "6", "-S",
                       "6", "-n", "16", "-b", "8", "-t", "4", "-o", csv])
    assert len(rows) >= 1
    line = open(csv).read().strip().split(";")
    assert line[0] == "6" and line[1] == "4"


def test_fullsim_cli(tmp_path):
    from openair4g_tpu.sim.harness import fullsim_main
    csv = str(tmp_path / "full.csv")
    rows = fullsim_main(["-m", "0", "-B", "6", "-s", "8", "-S", "8",
                         "-n", "8", "-b", "8", "-r", "1", "-o", csv])
    snr, errs, trials, bler = rows[0]
    assert trials[0] == 8
    assert open(csv).read().count(";") >= 6
