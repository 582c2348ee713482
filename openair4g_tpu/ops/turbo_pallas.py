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
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import turbo as _t

LANES = 1024   # 8 vregs wide: amortizes fori overhead within the VMEM budget
NEG = _t.NEG


# Static trellis wiring as whole-[8, L] sublane permutations + [8, 1] sign
# masks: every op touches the full vreg (8 sublanes x 128 lanes) instead of
# one sublane row at a time. Pallas kernels may not capture array constants,
# so permutations/signs are rebuilt inside the trace from python scalars.
_PRED0 = tuple(int(v) for v in _t.PRED_S[:, 0])
_PRED1 = tuple(int(v) for v in _t.PRED_S[:, 1])
_SGNU0 = tuple(1.0 - 2.0 * float(v) for v in _t.PRED_U[:, 0])
_SGNU1 = tuple(1.0 - 2.0 * float(v) for v in _t.PRED_U[:, 1])
_SGNZ0 = tuple(1.0 - 2.0 * float(v) for v in _t.PRED_Z[:, 0])
_SGNZ1 = tuple(1.0 - 2.0 * float(v) for v in _t.PRED_Z[:, 1])
_NEXT0 = tuple(int(v) for v in _t.NEXT_STATE[:, 0])
_NEXT1 = tuple(int(v) for v in _t.NEXT_STATE[:, 1])
_BSGNZ0 = tuple(1.0 - 2.0 * float(v) for v in _t.PARITY[:, 0])
_BSGNZ1 = tuple(1.0 - 2.0 * float(v) for v in _t.PARITY[:, 1])


def _beta_step(beta, gu, gp):
    """beta [8, L], gu/gp [L] -> beta at the previous node (row ops over
    the 8 states; lanes saturate the VPU at wide tile widths)."""
    new = []
    for s in range(8):
        c = []
        for u in (0, 1):
            nx = int(_t.NEXT_STATE[s, u])
            su = 1.0 - 2.0 * u
            sz = 1.0 - 2.0 * float(_t.PARITY[s, u])
            c.append(beta[nx] + su * gu + sz * gp)
        new.append(jnp.maximum(c[0], c[1]))
    m = new[0]
    for s in range(1, 8):
        m = jnp.maximum(m, new[s])
    return jnp.stack([x - m for x in new])


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
    m = new[0]
    for s in range(1, 8):
        m = jnp.maximum(m, new[s])
    return jnp.stack([x - m for x in new])


def _make_kernel(T: int, W: int, U: int):
    def kernel(guf_ref, gpf_ref, gub_ref, gpb_ref, win0_ref, out_ref,
               beta_scr):
        win0 = win0_ref[0, :] > 0.5                       # [L]
        state_ids = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        exact0 = jnp.where(state_ids == 0, 0.0, NEG)      # [8, L]

        # ---- backward sweep: beta at node t into scratch ----------------
        def bwd(i, beta):
            t = T - 1 - i
            beta = _beta_step(beta, gub_ref[t, :], gpb_ref[t, :])
            beta_scr[t] = beta
            return beta

        jax.lax.fori_loop(0, T, bwd, jnp.zeros((8, LANES), jnp.float32))

        # ---- forward sweep + fused LLR ----------------------------------
        def fwd(t, alpha):
            alpha = jnp.where((t == U) & win0[None, :], exact0, alpha)

            @pl.when(t >= U)
            def _():
                tau = t - U                               # real node index
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

            return _alpha_step(alpha, guf_ref[t, :], gpf_ref[t, :])

        jax.lax.fori_loop(0, T, fwd, jnp.zeros((8, LANES), jnp.float32))

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
