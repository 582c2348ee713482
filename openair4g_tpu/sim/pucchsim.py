"""pucchsim equivalent: PUCCH ACK/NACK + CQI error-rate Monte-Carlo.

Reference parity: openair1/SIMULATION/LTE_PHY/pucchsim.c — UE generate_pucch
-> AWGN -> eNB rx_pucch, ACK error / DTX detection stats vs SNR.

The sim works at the RE level (PUCCH occupies one edge RB; the OFDM round
trip is exact under the unitary convention, so per-RE AWGN is equivalent and
much faster). Format 1a: BPSK ACK/NACK, coherent detection with W4/W3
despreading. Format 2: (20,A) CQI payload, ML decoding.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.rng import host_keys
from ..phy.pucch import (pucch1_slot_symbols, pucch1_detect,
                         pucch2_slot_symbols, pucch2_equalize,
                         pucch2x_slot_symbols, pucch2x_detect,
                         pucch2x_ack_symbol, rm20_encode, rm20_decode)
from ..ops.llr import demap_llr


@dataclass(frozen=True)
class PucchsimConfig:
    n_id_cell: int = 0
    subframe: int = 2
    n_cs1: int = 3            # cyclic-shift resource
    n_oc: int = 1             # orthogonal cover resource (format 1)
    batch: int = 256
    fmt: str = "1a"           # "1a", "2", "2a" (CQI+1 ACK) or "2b" (+2)
    cqi_bits: int = 4         # format 2 payload size A


class Pucchsim:
    def __init__(self, cfg: PucchsimConfig):
        self.cfg = cfg
        ns = 2 * cfg.subframe
        if cfg.fmt == "1a":
            # precompute both slots for d = +1; d = -1 is a global sign
            d_ref, r_ref = [], []
            for s in (ns, ns + 1):
                d, r = pucch1_slot_symbols(cfg.n_id_cell, s, cfg.n_cs1,
                                           cfg.n_oc, 1.0)
                d_ref.append(d)
                r_ref.append(r)
            self.tx_data = np.stack(d_ref)      # [2, 4, 12]
            self.tx_rs = np.stack(r_ref)        # [2, 3, 12]
        else:
            rng = np.random.default_rng(7)
            self.cqi_payload = rng.integers(
                0, 2, size=cfg.cqi_bits).astype(np.int8)
            self.n_ack = {"2": 0, "2a": 1, "2b": 2}[cfg.fmt]
            self.ack_payload = rng.integers(
                0, 2, size=max(self.n_ack, 1)).astype(np.int8)
            b20 = rm20_encode(self.cqi_payload)
            d10 = ((1 - 2 * b20[0::2].astype(np.float64))
                   + 1j * (1 - 2 * b20[1::2].astype(np.float64))) / np.sqrt(2)
            d_ref, r_ref = [], []
            for i, s in enumerate((ns, ns + 1)):
                if self.n_ack:
                    d, r = pucch2x_slot_symbols(
                        cfg.n_id_cell, s, cfg.n_cs1, d10[5 * i:5 * i + 5],
                        pucch2x_ack_symbol(self.ack_payload[:self.n_ack]))
                else:
                    d, r = pucch2_slot_symbols(cfg.n_id_cell, s, cfg.n_cs1,
                                               d10[5 * i:5 * i + 5])
                d_ref.append(d)
                r_ref.append(r)
            self.tx_data = np.stack(d_ref)      # [2, 5, 12]
            self.tx_rs = np.stack(r_ref)        # [2, 2, 12]
        self._jit = jax.jit(self._trial_step)

    def _trial_step(self, keys, n0):
        """ACK bit (format 1a) or CQI payload error per trial."""
        cfg = self.cfg
        ns = 2 * cfg.subframe
        B = keys.shape[0]

        def add_noise(key, x):
            n = jax.random.normal(key, x.shape + (2,)) * jnp.sqrt(n0 / 2)
            return x + n[..., 0] + 1j * n[..., 1]

        if cfg.fmt == "1a":
            # alternate ACK(+1)/NACK(-1) across the batch
            d = 1.0 - 2.0 * (jnp.arange(B) % 2).astype(jnp.float32)
            tx_d = d[:, None, None, None] * jnp.asarray(self.tx_data)
            tx_r = jnp.broadcast_to(jnp.asarray(self.tx_rs),
                                    (B,) + self.tx_rs.shape)
            rx_d = jax.vmap(add_noise)(keys, tx_d)
            kk = jax.vmap(lambda k: jax.random.split(k, 1)[0])(keys)
            rx_r = jax.vmap(add_noise)(kk, tx_r)
            z = 0.0
            for sl, s in enumerate((ns, ns + 1)):
                zc, _ = pucch1_detect(rx_d[:, sl], rx_r[:, sl],
                                      cfg.n_id_cell, s, cfg.n_cs1, cfg.n_oc)
                z = z + zc
            d_hat = jnp.sign(jnp.real(z))
            return d_hat == d
        else:
            tx_d = jnp.broadcast_to(jnp.asarray(self.tx_data),
                                    (B,) + self.tx_data.shape)
            tx_r = jnp.broadcast_to(jnp.asarray(self.tx_rs),
                                    (B,) + self.tx_rs.shape)
            rx_d = jax.vmap(add_noise)(keys, tx_d)
            kk = jax.vmap(lambda k: jax.random.split(k, 1)[0])(keys)
            rx_r = jax.vmap(add_noise)(kk, tx_r)
            zs, acks = [], []
            for sl, s in enumerate((ns, ns + 1)):
                if self.n_ack:
                    z, h2, ack = pucch2x_detect(
                        rx_d[:, sl], rx_r[:, sl],
                        cfg.n_id_cell, s, cfg.n_cs1, self.n_ack)
                    acks.append(ack)
                else:
                    z, h2 = pucch2_equalize(rx_d[:, sl], rx_r[:, sl],
                                            cfg.n_id_cell, s, cfg.n_cs1)
                zs.append(z / jnp.maximum(h2, 1e-12)[:, None])
            d_hat = jnp.concatenate(zs, axis=-1)            # [B, 10]
            llr2 = demap_llr(d_hat, n0, 2)                  # [B, 10, 2]
            bits = rm20_decode(llr2.reshape(B, 20), cfg.cqi_bits)
            true = jnp.asarray(self.cqi_payload.astype(np.int32))
            cqi_ok = jnp.all(bits == true, axis=-1)
            if not self.n_ack:
                return cqi_ok
            # ACK decided per slot; majority/first-slot rule (both slots
            # carry the same d_ack)
            ack_true = jnp.asarray(self.ack_payload[:self.n_ack]
                                   .astype(np.int32))
            ack_ok = jnp.all(acks[0] == ack_true, axis=-1) \
                & jnp.all(acks[1] == ack_true, axis=-1)
            return cqi_ok & ack_ok

    def run_snr(self, snr_db: float, n_batches: int = 2, seed: int = 0):
        n0 = jnp.float32(10.0 ** (-snr_db / 10.0))
        ok = tot = 0
        for i in range(n_batches):
            keys = jnp.asarray(host_keys(seed, self.cfg.batch, stream=i))
            good = self._jit(keys, n0)
            ok += int(np.sum(np.asarray(good)))
            tot += self.cfg.batch
        return dict(snr_db=snr_db, err_rate=1.0 - ok / tot, trials=tot)


def main():
    import argparse
    p = argparse.ArgumentParser(description="PUCCH error-rate sweep")
    p.add_argument("-f", "--fmt", default="1a",
                   choices=("1a", "2", "2a", "2b"))
    p.add_argument("-s", "--snr0", type=float, default=-16.0)
    p.add_argument("-S", "--snr1", type=float, default=-4.0)
    p.add_argument("--step", type=float, default=2.0)
    p.add_argument("-n", "--batches", type=int, default=2)
    a = p.parse_args()
    sim = Pucchsim(PucchsimConfig(fmt=a.fmt))
    for snr in np.arange(a.snr0, a.snr1 + 1e-9, a.step):
        r = sim.run_snr(float(snr), n_batches=a.batches)
        print(f"SNR {snr:6.1f} dB  {a.fmt} err {r['err_rate']:.5f} "
              f"({r['trials']} trials)")


if __name__ == "__main__":
    main()
