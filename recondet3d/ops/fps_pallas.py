"""Furthest point sampling as a Pallas TPU kernel.

The XLA while-loop formulation of FPS pays per-iteration kernel-dispatch
overhead x K (25k-40k iterations in the ResDet3D pipeline — reference:
respoint_post_processing.py FPSDownsample/BallQueryDownsample). Here one
``pallas_call`` with ``grid=(K,)`` runs the whole selection: the running
min-distance array lives in a VMEM output that persists across grid
steps, the previously selected index is carried in SMEM scratch, and each
grid step is two fused VPU passes over the resident points.

VMEM budget: N*16 bytes (xyz planes + min-dist, fp32) — N up to ~850k on
a v5e. Selection semantics match
recondet3d.ops.sampling.furthest_point_sample exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["furthest_point_sample_pallas"]

_LANES = 128


def _fps_kernel(pts_ref, dist_in_ref, idx_ref, dist_ref, last_ref, *, rows):
    """Grid step i selects point i. pts_ref (3, rows, 128); dist refs
    (rows, 128) aliased; idx_ref (1, Kpad); last_ref SMEM (1,) carry."""
    del dist_in_ref  # aliased with dist_ref
    i = pl.program_id(0)
    big = jnp.int32(rows * _LANES)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    flat = r_iota * _LANES + c_iota
    kidx = jax.lax.broadcasted_iota(jnp.int32, idx_ref.shape, 1)

    @pl.when(i == 0)
    def _():
        valid = dist_ref[:] > -jnp.inf
        first = jnp.min(jnp.where(valid, flat, big))
        idx_ref[:] = jnp.where(kidx == 0, first, 0)
        last_ref[0] = first

    @pl.when(i > 0)
    def _():
        last = last_ref[0]
        sel = (flat == last).astype(jnp.float32)
        px = jnp.sum(pts_ref[0] * sel)
        py = jnp.sum(pts_ref[1] * sel)
        pz = jnp.sum(pts_ref[2] * sel)
        dx = pts_ref[0] - px
        dy = pts_ref[1] - py
        dz = pts_ref[2] - pz
        nd = jnp.minimum(dist_ref[:], dx * dx + dy * dy + dz * dz)
        dist_ref[:] = nd
        m = jnp.max(nd)
        nxt = jnp.min(jnp.where(nd == m, flat, big))
        idx_ref[:] = jnp.where(kidx == i, nxt, idx_ref[:])
        last_ref[0] = nxt


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def furthest_point_sample_pallas(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, 3) [+ (N,) mask] -> (num_samples,) int32 indices."""
    N = points.shape[0]
    pad = (-N) % _LANES
    rows = (N + pad) // _LANES

    pts = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    planes = pts.T.reshape(3, rows, _LANES)

    dist0 = jnp.full((N + pad,), 1e10, jnp.float32)
    if valid_mask is not None:
        dist0 = dist0.at[:N].set(
            jnp.where(valid_mask.astype(bool), 1e10, -jnp.inf)
        )
    dist0 = dist0.at[N:].set(-jnp.inf)
    dist0 = dist0.reshape(rows, _LANES)

    kpad = (-num_samples) % _LANES
    vmem_bytes = (4 * rows * _LANES * 4) + (num_samples + kpad) * 4 + (4 << 20)

    idx, _ = pl.pallas_call(
        functools.partial(_fps_kernel, rows=rows),
        grid=(num_samples,),
        out_shape=(
            jax.ShapeDtypeStruct((1, num_samples + kpad), jnp.int32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((3, rows, _LANES), lambda i: (0, 0, 0)),
            pl.BlockSpec((rows, _LANES), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, num_samples + kpad), lambda i: (0, 0)),
            pl.BlockSpec((rows, _LANES), lambda i: (0, 0)),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem_bytes, 120 * 1024 * 1024)),
        ),
        input_output_aliases={1: 1},
        interpret=interpret,
    )(planes, dist0)
    return idx[0, :num_samples]
