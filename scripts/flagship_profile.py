"""A/B ablation profile of the 20 MHz flagship chain (round-5 perf work).

Times the FULL jitted round-0 program with pieces swapped out, pipelined
windows (ROUND_NOTES: never time standalone ops — dispatch floor + DCE).
Each variant still materializes ok (scalar-reducible) so nothing DCEs.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.append(".")

from openair4g_tpu.sim.dlsim import DlsimFading, DlsimFadingConfig
from openair4g_tpu.utils.rng import host_keys

BATCH = 64
SNR = 24.0


def timeit(step, n_rep=8, windows=3):
    out = step(0)
    np.asarray(out).sum()
    best = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        outs = [step(w * n_rep + i + 1) for i in range(n_rep)]
        np.asarray(outs[-1]).sum()
        best = min(best, time.perf_counter() - t0)
    return best / n_rep


def make_step(**kw):
    cfg = dict(mcs=26, n_rb=100, channel="EVA", n_rx=1, n_harq_rounds=1,
               batch=BATCH, est_mode="joint", n_turbo_iter=8)
    cfg.update(kw)
    sim = DlsimFading(DlsimFadingConfig(**cfg))
    n0 = jnp.float32(10.0 ** (-SNR / 10.0))
    W = sim.wiener(SNR)
    ev = sim.err_var(SNR)
    rnd0 = sim._round(0)

    def step(i):
        keys = jnp.asarray(host_keys(0, BATCH, stream=i))
        d, kc, kn = sim._tx(keys)
        ok, _, _, _ = rnd0(d, kc[0], kn[0], n0, W, ev)
        return ok

    return step, sim


def main():
    rows = []
    for name, kw in [
        ("full", {}),
        ("no_pdcch", dict(with_pdcch=False)),
        ("perfect_ce", dict(perfect_ce=True)),
        ("iter4", dict(n_turbo_iter=4)),
        ("iter2", dict(n_turbo_iter=2)),
        ("mcs4(QPSK small TBS)", dict(mcs=4)),
    ]:
        step, sim = make_step(**kw)
        dt = timeit(step)
        rows.append((name, dt))
        print(f"{name:24s}: {dt*1e3:7.2f} ms/batch  "
              f"{BATCH/dt:8.1f} sf/s", flush=True)
    full = rows[0][1]
    for name, dt in rows[1:]:
        print(f"{name:24s}: delta {1e3*(full-dt):+6.2f} ms")


if __name__ == "__main__":
    main()
