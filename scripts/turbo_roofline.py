"""Turbo-decoder speed-of-light analysis (round-2 verdict item 6).

Measures the decode stage split on the attached accelerator — windowed
MAP sweeps (VPU elementwise) vs one-hot QPP permutations (MXU matmul) —
and compares achieved throughput against first-principles ceilings:

  VPU ceiling: ~200 f32 ops/bit/half-iteration (8 states x 2 preds x
    add/mul/max for alpha, beta, extrinsic) x 2 half-iters x n_iter.
  MXU ceiling: 2 K x K one-hot bf16 matmuls per iteration = 2*K MAC/bit
    x n_iter (+1 decision reorder).

Usage: python scripts/turbo_roofline.py [K] [batch] [n_iter]
Writes turbo_roofline.json at the repo root.
"""
import json
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from openair4g_tpu.ops import turbo


def _force(out):
    """Honest completion barrier: the axon tunnel's block_until_ready can
    return before compute finishes — materialize one element to host."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def timed(fn, *args, n=5):
    """PIPELINED timing (r5: aligned with bench.py's methodology — the
    axon dispatch floor is ~5 ms/call synced; issuing n calls and
    forcing only the last amortizes it, which is also how the flagship
    consumes the decoder). The r4 sync-loop numbers read ~10-20% lower;
    ROUND_NOTES policy: quote the tracked artifact."""
    _force(fn(*args))                       # compile + settle
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        _force(outs[-1])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1824
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rng = np.random.default_rng(0)
    d1 = turbo.turbo_encode_host(rng.integers(0, 2, K))    # [3, K+4]
    d = np.broadcast_to(d1, (B,) + d1.shape)
    llr = jnp.asarray((1.0 - 2.0 * d) * 4.0, jnp.float32)

    out = {"K": K, "batch": B, "n_iter": n_iter,
           "backend": jax.default_backend()}

    # full decode at n_iter and at 1 iteration -> per-iteration slope
    # (every benched fn reduces to a scalar ON DEVICE: materializing a
    # full [B, K] output would time the ~50 MB/s tunnel, not the chip)
    for it in (n_iter, 1):
        cfg = turbo.TurboDecoderConfig(K=K, F=0, n_iter=it, window=96,
                                       warmup=32, crc_kind="crc24a")
        f = jax.jit(lambda x, c=cfg: jnp.sum(turbo.turbo_decode(x, c)[0]))
        dt = timed(f, llr)
        out[f"decode_{it}iter_ms"] = dt * 1e3
        out[f"decode_{it}iter_mbps"] = B * K / dt / 1e6
        print(f"decode {it} iter: {dt*1e3:.2f} ms "
              f"({out[f'decode_{it}iter_mbps']:.1f} Mbit/s)", flush=True)
    per_iter = (out[f"decode_{n_iter}iter_ms"] - out["decode_1iter_ms"]) \
        / (n_iter - 1)
    out["per_iteration_ms"] = per_iter
    out["fixed_overhead_ms"] = out["decode_1iter_ms"] - per_iter

    # permutation alone (one interleave matmul)
    x = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    perm = jax.jit(lambda z: jnp.sum(turbo._permute(z, K, False)))
    out["permute_ms"] = timed(perm, x) * 1e3

    # one half-iteration alone (gamma + windowed alpha/beta + extrinsic);
    # N must be padded to a window multiple, as turbo_decode does
    N = turbo._padded_len(K + 3, 96)
    lin = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
    lp = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
    half = jax.jit(
        lambda a, b: jnp.sum(turbo._half_iteration_dispatch(
            a, turbo._parity_prep_dispatch(b, 96, 32), 96, 32)))
    out["half_iteration_ms"] = timed(half, lin, lp) * 1e3
    halfx = jax.jit(
        lambda a, b: jnp.sum(turbo._half_iteration(a, b, 96, 32)))
    out["half_iteration_xla_ms"] = timed(halfx, lin, lp) * 1e3
    crc = turbo._make_crc_checker(K, "crc24a")
    bits = jnp.asarray(rng.integers(0, 2, (B, K)), jnp.int32)
    crcf = jax.jit(lambda b_: jnp.sum(crc(b_)))
    out["crc_check_ms"] = timed(crcf, bits) * 1e3

    # first-principles ceilings (peak numbers are platform estimates:
    # ~200 TFLOP/s bf16 MXU, ~5 TFLOP/s f32 VPU per chip). NOTE r5: the
    # QPP permute is a plain gather at most K (ops/turbo._permute picks
    # per K), so the MXU series term is an over-charge there; the
    # combined ceiling is kept for continuity with the r3/r4 artifacts
    # and is CONSERVATIVE (the true ceiling is higher, the fraction
    # lower) when the matmul path is active.
    vpu_flops_per_bit = 200 * 2 * n_iter
    mxu_macs_per_bit = 2 * K * n_iter + K
    out["vpu_ceiling_gbps"] = 5e12 / vpu_flops_per_bit / 1e9
    out["mxu_ceiling_gbps"] = 200e12 / (2 * mxu_macs_per_bit) / 1e9
    out["combined_ceiling_gbps"] = 1.0 / (
        1.0 / out["vpu_ceiling_gbps"] + 1.0 / out["mxu_ceiling_gbps"])
    out["achieved_gbps"] = out[f"decode_{n_iter}iter_mbps"] / 1e3
    out["fraction_of_ceiling"] = out["achieved_gbps"] / \
        out["combined_ceiling_gbps"]
    out["note"] = ("decode_*iter and per_iteration are trustworthy "
                   "(pipelined full programs, same resident args); the "
                   "standalone permute/half_iteration/crc timings are "
                   "POLLUTED by per-call argument re-upload on the axon "
                   "tunnel and overstate by ~5-10 ms - use the "
                   "in-program ablation numbers in ROUND_NOTES instead")

    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "turbo_roofline.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
