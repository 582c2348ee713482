"""Benchmark: flagship PDSCH subframe pipeline throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: complete PDSCH subframes processed per second — the full eNB-TX ->
AWGN -> UE-RX chain including 8-iteration turbo decode (MCS4, 25 PRB).
Baseline: the reference's implicit real-time spec is 1 subframe / 1 ms / core
(lte-softmodem SCHED_DEADLINE, BASELINE.md) => 1000 subframes/s;
vs_baseline = our subframes/s / 1000.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from openair4g_tpu.sim.dlsim import DlsimConfig, DlsimAwgn

    batch = 128
    sim = DlsimAwgn(DlsimConfig(mcs=4, n_rb=25, batch=batch, n_turbo_iter=8))
    n0 = jnp.float32(10.0 ** (-1.0 / 10.0))

    from openair4g_tpu.utils.rng import host_keys
    keys = jnp.asarray(host_keys(0, batch))
    # warmup / compile
    ok, _ = sim._step(keys, n0)
    jax.block_until_ready(ok)

    n_rep = 10
    t0 = time.perf_counter()
    for i in range(n_rep):
        keys = jnp.asarray(host_keys(0, batch, stream=i + 1))
        ok, be = sim._step(keys, n0)
    jax.block_until_ready(ok)
    dt = time.perf_counter() - t0

    sf_per_s = n_rep * batch / dt
    print(json.dumps({
        "metric": "pdsch_subframes_per_s_per_chip(mcs4_25prb_8iter)",
        "value": round(sf_per_s, 1),
        "unit": "subframes/s",
        "vs_baseline": round(sf_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
