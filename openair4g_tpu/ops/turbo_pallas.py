"""Pallas TPU kernel for the windowed max-log-MAP half-iteration.

Reference parity: the same BCJR math as ops/turbo._half_iteration (which
remains the portable XLA path and the CPU/test oracle); this kernel keeps
the alpha/beta recursions entirely in VMEM — the XLA scan materializes
[T, 8, B, n_w] alpha/beta stacks to HBM every half-iteration, which is the
decoder's bandwidth bottleneck.

Layout: the 8 trellis states ride the sublane axis and (batch x window)
rides the lane axis, so one [8, 128] vreg holds 128 independent trellis
columns. Grid = lane tiles; per tile:
  1. backward sweep: beta_t stored to a [T, 8, 128] VMEM scratch,
  2. forward sweep: alpha in registers, LLR emitted on the fly using the
     stored beta — one pass, zero HBM traffic between trellis steps.

Throughput structure (round-3 speed-of-light work): the trellis loops
unroll R=8 steps per fori iteration — at ~160 vector ops per trellis
step the per-iteration loop sequencing dominated the un-unrolled kernel
— and metric normalization runs once per R-block instead of every step
(max-log metrics are offset-invariant: a common per-node offset cancels
in the LLR max-difference, so normalization is purely f32 range control;
drift over 8 steps is bounded by 8*max|gamma| ~ 1.6e5, keeping the ulp
~0.016, far below LLR resolution). The forward pass is split into a
warmup-only loop (t < U) and a work loop (t >= U) so the per-step
pl.when branch disappears; the window-0 exact-start override happens
once between them.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import turbo as _t

LANES = 1024   # 8 vregs wide: amortizes loop overhead within VMEM budget
NEG = _t.NEG


def _pick_unroll(T: int, U: int) -> int:
    for r in (8, 4, 2):
        if T % r == 0 and U % r == 0:
            return r
    return 1


def _beta_step(beta, gu, gp):
    """beta = list of 8 [L] rows -> the previous node's rows (static
    trellis wiring as Python indexing; every op is a full-width vreg op,
    no sublane shuffles)."""
    new = []
    for s in range(8):
        c = []
        for u in (0, 1):
            nx = int(_t.NEXT_STATE[s, u])
            su = 1.0 - 2.0 * u
            sz = 1.0 - 2.0 * float(_t.PARITY[s, u])
            c.append(beta[nx] + su * gu + sz * gp)
        new.append(jnp.maximum(c[0], c[1]))
    return new


def _alpha_step(alpha, gu, gp):
    new = []
    for s in range(8):
        c = []
        for j in (0, 1):
            pr = int(_t.PRED_S[s, j])
            su = 1.0 - 2.0 * float(_t.PRED_U[s, j])
            sz = 1.0 - 2.0 * float(_t.PRED_Z[s, j])
            c.append(alpha[pr] + su * gu + sz * gp)
        new.append(jnp.maximum(c[0], c[1]))
    return new


def _normalize(rows):
    m = rows[0]
    for s in range(1, 8):
        m = jnp.maximum(m, rows[s])
    return [x - m for x in rows]


def _make_kernel(T: int, W: int, U: int):
    R = _pick_unroll(T, U)

    def kernel(guf_ref, gpf_ref, gub_ref, gpb_ref, win0_ref, out_ref,
               beta_scr):
        win0 = win0_ref[0, :] > 0.5                       # [L]
        zeros8 = tuple(jnp.zeros((LANES,), jnp.float32) for _ in range(8))

        # ---- backward sweep: beta at node t into scratch ----------------
        def bwd(i, beta_flat):
            beta = list(beta_flat)
            for r in range(R):
                t = T - 1 - (i * R + r)
                beta = _beta_step(beta, gub_ref[t, :], gpb_ref[t, :])
                beta_scr[t] = jnp.stack(beta)
            return tuple(_normalize(beta))

        jax.lax.fori_loop(0, T // R, bwd, zeros8)

        # ---- forward warmup (t < U): alpha only -------------------------
        def warm(i, alpha_flat):
            alpha = list(alpha_flat)
            for r in range(R):
                t = i * R + r
                alpha = _alpha_step(alpha, guf_ref[t, :], gpf_ref[t, :])
            return tuple(_normalize(alpha))

        alpha0 = jax.lax.fori_loop(0, U // R, warm, zeros8)

        # window 0 starts at the true trellis head: exact state-0 init
        alpha0 = tuple(
            jnp.where(win0, 0.0 if s == 0 else NEG, alpha0[s])
            for s in range(8))

        # ---- forward work (t >= U): alpha + fused LLR -------------------
        def work(i, alpha_flat):
            alpha = list(alpha_flat)
            for r in range(R):
                tau = i * R + r               # node index within window
                gu_n = gub_ref[tau, :]
                gp_n = gpb_ref[tau, :]
                beta_next = beta_scr[tau + 1]             # [8, L]
                ms = []
                for u in (0, 1):
                    m = None
                    for s in range(8):
                        sz = 1.0 - 2.0 * float(_t.PARITY[s, u])
                        nx = int(_t.NEXT_STATE[s, u])
                        c = alpha[s] + sz * gp_n + beta_next[nx]
                        m = c if m is None else jnp.maximum(m, c)
                    ms.append(m)
                out_ref[tau, :] = (ms[0] + gu_n) - (ms[1] - gu_n)
                alpha = _alpha_step(alpha, guf_ref[U + tau, :],
                                    gpf_ref[U + tau, :])
            return tuple(_normalize(alpha))

        jax.lax.fori_loop(0, W // R, work, alpha0)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(T: int, W: int, U: int, n_tiles: int,
                interpret: bool = False):
    kernel = _make_kernel(T, W, U)
    L = n_tiles * LANES
    in_spec_T = pl.BlockSpec((T, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[in_spec_T, in_spec_T, in_spec_T, in_spec_T,
                  pl.BlockSpec((1, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((W, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, 8, LANES), jnp.float32)],
        interpret=interpret,
    )


def half_iteration_pallas(lin, lp, W: int, U: int, interpret: bool = False):
    """Drop-in replacement for turbo._half_iteration (beta at the last
    window node uses U-1 in-window warmup steps instead of the neighbor
    window's converged value — within the windowed-decoding design margin).
    interpret=True runs the Pallas interpreter (CPU testing).
    """
    B, N = lin.shape
    n_w = N // W
    T = W + U
    gu = 0.5 * lin
    gp = 0.5 * lp

    # forward-framed gammas [T, B*n_w] (front warmup pad)
    guf = jnp.moveaxis(_t._frame_fwd(gu, W, U), -1, 0).reshape(T, B * n_w)
    gpf = jnp.moveaxis(_t._frame_fwd(gp, W, U), -1, 0).reshape(T, B * n_w)
    # natural-order backward gammas: window w node t (end pad +BIG)
    gub = jnp.moveaxis(_t._frame_bwd(gu, W, U, _t.BIG), -1, 0
                       ).reshape(T, B * n_w)
    gpb = jnp.moveaxis(_t._frame_bwd(gp, W, U, _t.BIG), -1, 0
                       ).reshape(T, B * n_w)
    win0 = jnp.asarray(
        np.tile((np.arange(n_w) == 0), B).astype(np.float32))[None, :]

    L0 = B * n_w
    n_tiles = -(-L0 // LANES)
    pad = n_tiles * LANES - L0
    if pad:
        guf = jnp.pad(guf, ((0, 0), (0, pad)))
        gpf = jnp.pad(gpf, ((0, 0), (0, pad)))
        gub = jnp.pad(gub, ((0, 0), (0, pad)), constant_values=_t.BIG)
        gpb = jnp.pad(gpb, ((0, 0), (0, pad)), constant_values=_t.BIG)
        win0 = jnp.pad(win0, ((0, 0), (0, pad)))

    out = _build_call(T, W, U, n_tiles, interpret)(guf, gpf, gub, gpb, win0)
    out = out[:, :L0].reshape(W, B, n_w)
    # node order: [B, n_w, W] -> [B, N]
    return jnp.moveaxis(out, 0, 2).reshape(B, N)
