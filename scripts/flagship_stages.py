"""Cumulative-stage timing of the 20 MHz flagship round-0 program.

Each program runs the chain up to stage k and reduces the last tensor to
a scalar ON DEVICE (DCE-safe, transfer-free). Successive deltas = stage
costs. Pipelined windows per ROUND_NOTES.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.append(".")

from openair4g_tpu.sim.dlsim import DlsimFading, DlsimFadingConfig
from openair4g_tpu.sim.channels import apply_channel_grid
from openair4g_tpu.phy.resource_grid import fill_grid, extract_data_res
from openair4g_tpu.phy import ofdm
from openair4g_tpu.phy.channel_est import estimate_channel_joint
from openair4g_tpu.ops.gold import scramble_bits, unscramble_llrs
from openair4g_tpu.ops.llr import map_symbols
from openair4g_tpu.ops.equalize_llr import mrc_llr
from openair4g_tpu.utils.rng import host_keys

BATCH = 64
SNR = 24.0


def main():
    sim = DlsimFading(DlsimFadingConfig(
        mcs=26, n_rb=100, channel="EVA", n_rx=1, n_harq_rounds=1,
        batch=BATCH, est_mode="joint", n_turbo_iter=8))
    cfg = sim.cfg
    codec = sim.dlsch
    Qm = codec.cfg.Qm
    n0 = jnp.float32(10.0 ** (-SNR / 10.0))
    W = sim.wiener(SNR)
    ev = sim.err_var(SNR)
    gm, fp = sim.gm, sim.fp
    data_sym = np.asarray(gm.data_sym)
    data_sc = np.asarray(gm.data_sc)

    def upto(stage):
        def f(keys):
            B = BATCH
            splits = jax.vmap(lambda k: jax.random.split(k, 4))(keys)
            tb = jax.vmap(lambda k: jax.random.bernoulli(
                k, 0.5, (codec.cfg.tbs,)))(splits[:, 0]).astype(jnp.int32)
            d_flats = codec.encode_to_d(tb)
            if stage == "encode":
                return sum(jnp.sum(x) for x in jax.tree.leaves(d_flats))
            e = codec.select_e(d_flats, 0)
            e = scramble_bits(e, sim.scr_seq)
            sym = map_symbols(e, Qm)
            if stage == "map":
                return jnp.sum(jnp.abs(sym))
            grid = fill_grid(sym.astype(jnp.complex64), gm)
            if stage == "fill":
                return jnp.sum(jnp.abs(grid))
            taps = sim.chan.draw_taps(splits[:, 1], B)
            H = sim.chan.freq_response(taps)
            grid = apply_channel_grid(grid, H, fp)
            t = ofdm.ofdm_modulate(grid, fp)
            if stage == "ofdm_tx":
                return jnp.sum(jnp.abs(t))
            nr = jax.vmap(lambda k: jax.random.normal(
                k, t.shape[1:] + (2,)))(splits[:, 2])
            rx = t + jnp.sqrt(n0 / 2) * (nr[..., 0] + 1j * nr[..., 1])
            rgrid = ofdm.ofdm_demodulate(rx, fp)
            if stage == "ofdm_rx":
                return jnp.sum(jnp.abs(rgrid))
            H_hat = estimate_channel_joint(rgrid, gm, W)
            if stage == "ce":
                return jnp.sum(jnp.abs(H_hat))
            H_data = H_hat[:, data_sym, data_sc].reshape(B, 1, -1)
            y = extract_data_res(rgrid, gm).reshape(B, 1, -1)
            llr = mrc_llr(jnp.moveaxis(y, 1, -1),
                          jnp.moveaxis(H_data, 1, -1), n0 + ev,
                          Qm).reshape(B, -1)
            if stage == "llr":
                return jnp.sum(jnp.abs(llr))
            llr = unscramble_llrs(llr, sim.scr_seq)
            _, ok, _ = codec.decode(llr)
            return jnp.sum(ok)
        return jax.jit(f)

    stages = ["encode", "map", "fill", "ofdm_tx", "ofdm_rx", "ce",
              "llr", "decode"]
    prev = 0.0
    for st in stages:
        f = upto(st)

        def step(i, f=f):
            return f(jnp.asarray(host_keys(0, BATCH, stream=i)))

        out = step(0); np.asarray(out)
        best = float("inf")
        n_rep = 8
        for w in range(3):
            t0 = time.perf_counter()
            outs = [step(w * n_rep + i + 1) for i in range(n_rep)]
            np.asarray(outs[-1])
            best = min(best, time.perf_counter() - t0)
        dt = best / n_rep * 1e3
        print(f"upto {st:10s}: {dt:7.2f} ms  (delta {dt-prev:+6.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
