"""Pallas TPU kernel: the fused PSO swarm update.

One kernel applies the complete post-fitness update chain —
personal-best refresh → global-best argmin reduce → velocity/position
integration — over the whole swarm resident in VMEM, replacing ~20 XLA HLOs
with a single VPU pass (the candidate kernel from SURVEY.md §7 "Pallas
kernels only where XLA fusion is insufficient").

Semantics are identical to pso.swarm.pso_iteration (which remains the
reference path and the autodiff-able one); equality is asserted in
tests/test_pallas.py. Swarms are small (N ≤ ~4096, d ≤ ~1024) so a single
grid cell holds everything: positions/velocities/p_best [N_pad, d_pad]
padded to (8, 128) tiles, fitness replicated across one lane block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    scal_ref,  # SMEM [1, 6]: w, w_cogn, w_soci, g_best_val, g_prev_val, n_valid
    pos_ref,  # VMEM [n, d]
    vel_ref,
    pbp_ref,  # p_best_pos [n, d]
    pbv_ref,  # p_best_val [n, 128] (value broadcast across lanes)
    fit_ref,  # fitness    [n, 128]
    r1_ref,  # [n, 128]
    r2_ref,  # [n, 128]
    gbp_ref,  # g_best_pos [8, d] (row 0 live)
    out_pos_ref,
    out_vel_ref,
    out_pbp_ref,
    out_pbv_ref,
    out_gbp_ref,
    out_scal_ref,  # SMEM [1, 3]: g_best_val, g_prev_val, g_improved(0/1)
):
    w = scal_ref[0, 0]
    w_cogn = scal_ref[0, 1]
    w_soci = scal_ref[0, 2]
    g_best_val = scal_ref[0, 3]
    g_prev_val = scal_ref[0, 4]
    n_valid = scal_ref[0, 5]

    n = pos_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 0)
    valid = row_ids < n_valid.astype(jnp.int32)

    fit = jnp.where(valid, fit_ref[:], jnp.inf)
    pbv = jnp.where(valid, pbv_ref[:], jnp.inf)

    # 1) personal best
    improved = fit < pbv
    pbv_new = jnp.where(improved, fit, pbv)
    imp_col = improved[:, 0:1]  # all lanes equal
    pbp_new = jnp.where(imp_col, pos_ref[:], pbp_ref[:])
    out_pbv_ref[:] = pbv_new
    out_pbp_ref[:] = pbp_new

    # 2) global best: argmin over valid rows. Mosaic has no dynamic_slice on
    # values, so the winning row is extracted with a one-hot masked reduce.
    col = pbv_new[:, 0]
    cand_idx = jnp.argmin(col)
    cand_val = jnp.min(col)
    g_improved = cand_val < g_best_val
    is_cand = (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == cand_idx.astype(jnp.int32)
    )
    cand_row = jnp.sum(jnp.where(is_cand, pbp_new, 0.0), axis=0, keepdims=True)  # [1, d]
    gbp_old = gbp_ref[0:1, :]
    gbp_new = jnp.where(g_improved, cand_row, gbp_old)
    out_gbp_ref[:] = jnp.broadcast_to(gbp_new, out_gbp_ref.shape)

    first = g_best_val == jnp.inf
    out_scal_ref[0, 0] = jnp.where(g_improved, cand_val, g_best_val)
    out_scal_ref[0, 1] = jnp.where(
        jnp.logical_and(g_improved, jnp.logical_not(first)), g_best_val, g_prev_val
    )
    out_scal_ref[0, 2] = jnp.where(
        jnp.logical_and(g_improved, jnp.logical_not(first)), 1.0, 0.0
    )

    # 3) move (reference naming swap preserved: cogn couples g_best)
    r1 = r1_ref[:, 0:1]
    r2 = r2_ref[:, 0:1]
    vel = (
        w * vel_ref[:]
        + w_cogn * r1 * (gbp_new - pos_ref[:])
        + w_soci * r2 * (pbp_new - pos_ref[:])
    )
    out_vel_ref[:] = vel
    out_pos_ref[:] = pos_ref[:] + vel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pso_update_pallas(
    positions,
    velocities,
    p_best_pos,
    p_best_val,
    fitness,
    r1,
    r2,
    g_best_pos,
    g_best_val,
    g_prev_val,
    w_inertia,
    w_cognitive,
    w_social,
    interpret: bool = False,
):
    """Fused swarm update. Returns (positions, velocities, p_best_pos,
    p_best_val, g_best_pos, g_best_val, g_prev_val, g_improved_flag)."""
    n, d = positions.shape
    n_pad, d_pad = _round_up(max(n, 8), 8), _round_up(max(d, 128), 128)

    def pad2(x, fill=0.0):
        return jnp.pad(x, ((0, n_pad - n), (0, d_pad - d)), constant_values=fill)

    def pad_col(v, fill):
        col = jnp.pad(v.astype(jnp.float32), (0, n_pad - n), constant_values=fill)
        return jnp.broadcast_to(col[:, None], (n_pad, 128))

    # 2-D [1, 6] (not [6]): under a class vmap the batch dim lands in front,
    # and Mosaic's SMEM block check wants the LAST TWO dims of the block to
    # equal the array dims — with a 1-D operand the batch dim itself becomes
    # the second-to-last dim and the (Squeezed, 6) block is rejected.
    scal = jnp.stack(
        [
            jnp.float32(w_inertia),
            jnp.float32(w_cognitive),
            jnp.float32(w_social),
            jnp.float32(g_best_val),
            jnp.float32(g_prev_val),
            jnp.float32(n),
        ]
    )[None, :]
    gbp = jnp.broadcast_to(
        jnp.pad(g_best_pos, (0, d_pad - d))[None, :], (8, d_pad)
    )

    out_shapes = (
        jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),  # pos
        jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),  # vel
        jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),  # pbp
        jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),  # pbv
        jax.ShapeDtypeStruct((8, d_pad), jnp.float32),  # gbp
        jax.ShapeDtypeStruct((1, 3), jnp.float32),  # scalars out
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _kernel,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem,
        ],
        out_specs=(
            vmem, vmem, vmem, vmem, vmem,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(
        scal,
        pad2(positions),
        pad2(velocities),
        pad2(p_best_pos),
        pad_col(p_best_val, jnp.inf),
        pad_col(fitness, jnp.inf),
        pad_col(r1, 0.0),
        pad_col(r2, 0.0),
        gbp,
    )
    pos, vel, pbp, pbv, gbp_out, scal_out = outs
    return (
        pos[:n, :d],
        vel[:n, :d],
        pbp[:n, :d],
        pbv[:n, 0],
        gbp_out[0, :d],
        scal_out[0, 0],
        scal_out[0, 1],
        scal_out[0, 2] > 0.5,
    )
