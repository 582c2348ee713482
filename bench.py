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
    # HEADLINE (VERDICT r3 item 4): the reference's 1 ms SCHED_DEADLINE
    # budget is defined for a 20 MHz eNB subframe (lte-softmodem.c:1031),
    # so the vs_baseline metric is the 100-PRB MCS26 FULL chain —
    # eNB TX -> EVA fading -> estimated-CE UE RX -> 8-iter decode.
    sf20 = _bench_fullchain_20mhz()

    extras = {"pdsch_20mhz_mcs26_fading_estce_subframes_per_s": sf20}
    try:
        extras["pdsch_5mhz_mcs4_awgn_subframes_per_s"] = _bench_light()
        extras["turbo_decode_mbit_per_s"] = _bench_turbo()
        extras["ofdm_equalize_msamples_per_s"] = _bench_ofdm_equalize()
    except Exception as e:          # pragma: no cover
        extras["error"] = repr(e)
    with open("BENCH_extra.json", "w") as f:
        json.dump(extras, f, indent=1)

    print(json.dumps({
        "metric": "pdsch_subframes_per_s_per_chip"
                  "(mcs26_100prb_EVA_estCE_8iter)",
        "value": round(sf20, 1),
        "unit": "subframes/s",
        "vs_baseline": round(sf20 / 1000.0, 3),
    }))


def _bench_fullchain_20mhz() -> float:
    """100 PRB / MCS26 / EVA fading / estimated (joint-LMMSE) CE / MRC /
    8-iteration decode — the honest 20 MHz flagship subframes/s."""
    from openair4g_tpu.sim.dlsim import DlsimFading, DlsimFadingConfig
    from openair4g_tpu.utils.rng import host_keys
    batch = 128      # r5 re-sweep: 128 > 64 now (the v2 turbo kernel's
    #   smaller scratch + the lighter non-decode middle moved the VMEM
    #   knee; r4 measured 128 -> 1821 on the old kernel)
    sim = DlsimFading(DlsimFadingConfig(
        mcs=26, n_rb=100, channel="EVA", n_rx=1, n_harq_rounds=1,
        batch=batch, est_mode="joint", n_turbo_iter=8))
    snr = 24.0
    n0 = jnp.float32(10.0 ** (-snr / 10.0))
    W = sim.wiener(snr)
    ev = sim.err_var(snr)
    rnd0 = sim._round(0)

    def step(i):
        keys = jnp.asarray(host_keys(0, batch, stream=i))
        d, kc, kn = sim._tx(keys)
        ok, _, _, _ = rnd0(d, kc[0], kn[0], n0, W, ev)
        return ok

    ok0 = np.asarray(step(0))                   # compile + settle
    assert ok0.sum() > 0, "20 MHz chain not decoding at bench SNR"
    n_rep = 10
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        outs = [step(w * n_rep + i + 1) for i in range(n_rep)]
        np.asarray(outs[-1]).sum()              # force the pipeline
        best = min(best, time.perf_counter() - t0)
    return n_rep * batch / best


def _bench_light() -> float:
    """Secondary: the light 5 MHz MCS4 AWGN chain (rounds 1-3 record)."""
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
    assert ok_total > 0
    return round(n_rep * batch / best, 1)


def _pipeline_best(fn, args_fn, n_rep: int = 10, windows: int = 3):
    """Best-of-N wall time for n_rep pipelined dispatches with one final
    materialization (the honest axon-tunnel timing pattern)."""
    outs = [fn(*args_fn(0))]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    best = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        outs = [fn(*args_fn(w * n_rep + i + 1)) for i in range(n_rep)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best / n_rep


def _bench_turbo() -> dict:
    """Turbo decode Mbit/s/chip at K=6144, batch 512. Two numbers:
    `fixed_8iter` (dynamic stop off — the speed-of-light kernel metric,
    every block runs all 8 iterations) and `earlystop_operating`
    (dynamic stop at decodable SNR — what the flagship chain sees; the
    reference's CRC early-return gives it the same asymmetry)."""
    from openair4g_tpu.ops.turbo import TurboDecoderConfig, turbo_decode
    from openair4g_tpu.phy.pdsch import DlschConfig, DlschCodec
    from openair4g_tpu.utils.rng import host_keys
    codec = DlschCodec(DlschConfig(mcs=10, n_rb=50, n_turbo_iter=8))
    batch = 512
    key_llr = jnp.asarray(host_keys(7, 1)[0])
    tb = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.5, (batch, codec.cfg.tbs)).astype(jnp.int32)
    e = codec.encode(tb)
    llr_clean = (1.0 - 2.0 * e.astype(jnp.float32)) * 4.0
    noise = jax.random.normal(key_llr, llr_clean.shape)
    llr = llr_clean + noise
    out = {}
    for name, dyn in (("fixed_8iter", False), ("earlystop_operating", True)):
        dec = jax.jit(lambda l, dyn=dyn: codec.decode(l, dynamic_stop=dyn)[1])
        dt = _pipeline_best(dec, lambda i: (llr,), n_rep=5)
        out[name] = round(batch * codec.cfg.tbs / dt / 1e6, 1)
    return out


def _bench_ofdm_equalize() -> float:
    """OFDM demod + LMMSE channel estimate + MRC equalize + LLR demap
    Msamples/s/chip at 20 MHz (100 PRB) — the inner-receiver front end."""
    from openair4g_tpu.config import FrameParms
    from openair4g_tpu.phy import ofdm
    from openair4g_tpu.phy.resource_grid import make_grid_map, extract_data_res
    from openair4g_tpu.phy.channel_est import (make_wiener_joint,
                                               estimate_channel_joint)
    from openair4g_tpu.phy.equalize import mrc_equalize
    from openair4g_tpu.ops.llr import demap_llr
    fp = FrameParms(n_rb=100)
    gm = make_grid_map(100, 1)
    n0 = jnp.float32(0.1)
    W = jnp.asarray(make_wiener_joint(gm, 0.1))
    batch = 32
    data_sym = jnp.asarray(gm.data_sym)
    data_sc = jnp.asarray(gm.data_sc)

    def rx_front(keys):
        nr = jax.vmap(lambda k: jax.random.normal(
            k, (fp.samples_per_tti, 2)))(keys)
        t = nr[..., 0] + 1j * nr[..., 1]
        rgrid = ofdm.ofdm_demodulate(t, fp)
        H = estimate_channel_joint(rgrid, gm, W)
        y = extract_data_res(rgrid, gm)
        h = H[:, data_sym, data_sc]
        x, n0e = mrc_equalize(y[..., None], h[..., None], n0)
        return jnp.sum(jnp.abs(demap_llr(x, n0e, 4))).astype(jnp.float32)

    # ON-DEVICE repeat loop (r4 weak #6: the per-call form bounced
    # 139-181 Ms/s run to run — tunnel jitter on a ~3 ms program). One
    # dispatch covers REPS sequentially-dependent repetitions (the next
    # iteration's keys fold in the previous output, so XLA can neither
    # reorder nor elide them): ~100 ms of pure device work per timing.
    REPS = 32

    def rx_front_loop(keys):
        def body(i, carry):
            acc, ks = carry
            out = rx_front(ks)
            dep = (jnp.abs(out).astype(jnp.int32) & 1) + i
            ks = jax.vmap(lambda k: jax.random.fold_in(k, dep))(ks)
            return acc + out, ks
        acc, _ = jax.lax.fori_loop(
            0, REPS, body, (jnp.float32(0.0), keys))
        return acc

    from openair4g_tpu.utils.rng import host_keys
    f = jax.jit(rx_front_loop)
    dt = _pipeline_best(
        f, lambda i: (jnp.asarray(host_keys(3, batch, stream=i)),),
        n_rep=2)
    return round(REPS * batch * fp.samples_per_tti / dt / 1e6, 1)


if __name__ == "__main__":
    main()
