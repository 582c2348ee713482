"""Benchmark: flagship PDSCH subframe pipeline throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: complete PDSCH subframes processed per second — the full eNB-TX ->
AWGN -> UE-RX chain including 8-iteration turbo decode (MCS4, 25 PRB).
Baseline: the reference's implicit real-time spec is 1 subframe / 1 ms / core
(lte-softmodem SCHED_DEADLINE, BASELINE.md) => 1000 subframes/s;
vs_baseline = our subframes/s / 1000.

Measurement notes: the axon TPU tunnel's block_until_ready can return
before compute completes, and every host sync costs a ~20 ms round trip —
so the timing loop dispatches a pipeline of steps and forces ONE final
device->host materialization (np.asarray), best of several windows.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from openair4g_tpu.sim.dlsim import DlsimConfig, DlsimAwgn
    from openair4g_tpu.utils.rng import host_keys

    batch = 512
    sim = DlsimAwgn(DlsimConfig(mcs=4, n_rb=25, batch=batch, n_turbo_iter=8))
    n0 = jnp.float32(10.0 ** (-1.0 / 10.0))

    keys0 = jnp.asarray(host_keys(0, batch))
    np.asarray(sim._step(keys0, n0)[0])        # compile + settle

    n_rep = 20
    best = float("inf")
    ok_total = 0
    for w in range(3):
        outs = []
        t0 = time.perf_counter()
        for i in range(n_rep):
            keys = jnp.asarray(host_keys(0, batch, stream=w * n_rep + i + 1))
            outs.append(sim._step(keys, n0)[0])
        ok_total = int(np.asarray(outs[-1]).sum())   # forces the pipeline
        best = min(best, time.perf_counter() - t0)

    sf_per_s = n_rep * batch / best
    assert ok_total > 0
    print(json.dumps({
        "metric": "pdsch_subframes_per_s_per_chip(mcs4_25prb_8iter)",
        "value": round(sf_per_s, 1),
        "unit": "subframes/s",
        "vs_baseline": round(sf_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
