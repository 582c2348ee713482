"""prachsim equivalent: PRACH detection-rate / false-alarm Monte-Carlo.

Reference parity: openair1/SIMULATION/LTE_PHY/prachsim.c — UE generate_prach
-> channel -> eNB rx_prach, detection probability + timing error vs SNR.

The sim runs on the 839 PRACH bins (the big 24576-pt transform of the
reference is a sample-rate conversion, exact under the unitary convention);
random preamble index and delay per trial, batched detection via the MXU
DFT matmul.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.rng import host_keys
from ..phy.prach import preamble_freq, prach_detect, n_preambles, N_ZC


@dataclass(frozen=True)
class PrachsimConfig:
    root_u: int = 129
    ncs: int = 13              # zeroCorrelationZoneConfig -> NCS
    max_delay: int = 10        # ZC samples (~ cell radius)
    batch: int = 64
    threshold: float = 15.0


class Prachsim:
    def __init__(self, cfg: PrachsimConfig):
        self.cfg = cfg
        self.npre = n_preambles(cfg.ncs)
        assert cfg.max_delay < cfg.ncs, "delay must fit the ZCZ window"
        # precompute all preamble spectra [npre, 839]
        self.pre_f = np.stack([preamble_freq(cfg.root_u, v, cfg.ncs)
                               for v in range(self.npre)])
        self._jit = jax.jit(self._trial_step)

    def _trial_step(self, keys, n0):
        """Random (preamble, delay) per trial -> (det_ok, delay_ok, n_false)."""
        cfg = self.cfg
        B = keys.shape[0]
        k = jnp.arange(N_ZC)

        def one(key):
            kv, kd, kn = jax.random.split(key, 3)
            v = jax.random.randint(kv, (), 0, self.npre)
            dly = jax.random.randint(kd, (), 0, cfg.max_delay + 1)
            xf = jnp.asarray(self.pre_f)[v] * jnp.exp(
                -2j * jnp.pi * k * dly / N_ZC)
            noise = jax.random.normal(kn, (N_ZC, 2)) * jnp.sqrt(n0 / 2)
            return xf + noise[:, 0] + 1j * noise[:, 1], v, dly

        rx, v_true, d_true = jax.vmap(one)(keys)
        energy, delay, det = prach_detect(rx, cfg.root_u, cfg.ncs,
                                          cfg.threshold)
        det_v = jnp.take_along_axis(det, v_true[:, None], axis=1)[:, 0]
        d_v = jnp.take_along_axis(delay, v_true[:, None], axis=1)[:, 0]
        n_false = det.sum(axis=1) - det_v.astype(jnp.int32)
        return det_v, det_v & (d_v == d_true), n_false

    def run_snr(self, snr_db: float, n_batches: int = 2, seed: int = 0):
        """snr_db = per-PRACH-bin Es/N0 (the preamble is unit-amplitude per
        bin; total processing gain is 10log10(839) ~ 29 dB)."""
        n0 = jnp.float32(10.0 ** (-snr_db / 10.0))
        det = dok = fa = tot = 0
        for i in range(n_batches):
            keys = jnp.asarray(host_keys(seed, self.cfg.batch, stream=i))
            d, dk, nf = self._jit(keys, n0)
            det += int(np.sum(np.asarray(d)))
            dok += int(np.sum(np.asarray(dk)))
            fa += int(np.sum(np.asarray(nf)))
            tot += self.cfg.batch
        return dict(snr_db=snr_db, det_rate=det / tot,
                    delay_ok_rate=dok / tot, false_per_trial=fa / tot,
                    trials=tot)


def main():
    import argparse
    p = argparse.ArgumentParser(description="PRACH detection sweep")
    p.add_argument("-s", "--snr0", type=float, default=-22.0)
    p.add_argument("-S", "--snr1", type=float, default=-8.0)
    p.add_argument("--step", type=float, default=2.0)
    p.add_argument("-n", "--batches", type=int, default=2)
    p.add_argument("--ncs", type=int, default=13)
    a = p.parse_args()
    sim = Prachsim(PrachsimConfig(ncs=a.ncs))
    for snr in np.arange(a.snr0, a.snr1 + 1e-9, a.step):
        r = sim.run_snr(float(snr), n_batches=a.batches)
        print(f"SNR {snr:6.1f} dB/bin  det {r['det_rate']:.3f}  "
              f"delay_ok {r['delay_ok_rate']:.3f}  "
              f"false/trial {r['false_per_trial']:.4f}")


if __name__ == "__main__":
    main()
