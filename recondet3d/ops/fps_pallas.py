"""Furthest point sampling as a Pallas TPU kernel.

The XLA while-loop formulation of FPS pays per-iteration kernel-dispatch
overhead x K (25k-40k iterations in the ResDet3D pipeline — reference:
respoint_post_processing.py FPSDownsample/BallQueryDownsample). Here one
``pallas_call`` with ``grid=(K,)`` runs the whole selection:

- the point planes + running min-distances live in VMEM *scratch* (which
  persists across grid steps) and are DMA'd from HBM once at step 0 —
  block-spec'd inputs would be double-buffered by the pallas pipeline and
  blow VMEM at N~850k;
- the previously selected index is carried in SMEM scratch;
- each grid step is two fused VPU passes over the resident points.

VMEM budget: N*16 bytes (xyz + min-dist, fp32) — N up to ~850k on a
v5e. Selection semantics match recondet3d.ops.sampling.
furthest_point_sample_xla exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["furthest_point_sample_pallas"]

_LANES = 128


_BLOCK_ROWS = 512


def _fps_kernel(pts_hbm, dist_hbm, idx_ref, pts_ref, dist_ref, last_ref,
                coord_ref, sem, *, rows):
    """Grid step i selects point i. The per-step pass runs in static row
    blocks so live temporaries stay ~0.25 MB next to the ~14 MB resident
    scratch. The selected point's coordinates are extracted IN the same
    distance-update pass (carried in SMEM), so each step is one fused
    sweep over the points instead of two."""
    i = pl.program_id(0)
    big = jnp.int32(rows * _LANES)
    n_blocks = rows // _BLOCK_ROWS
    kidx = jax.lax.broadcasted_iota(jnp.int32, idx_ref.shape, 1)

    def block_iota(b):
        r = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_ROWS, _LANES), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_ROWS, _LANES), 1)
        return (b * _BLOCK_ROWS + r) * _LANES + c

    @pl.when(i == 0)
    def _():
        cp1 = pltpu.make_async_copy(pts_hbm, pts_ref, sem.at[0])
        cp2 = pltpu.make_async_copy(dist_hbm, dist_ref, sem.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        def first_body(b, acc):
            first, fx, fy, fz = acc
            sl = pl.ds(b * _BLOCK_ROWS, _BLOCK_ROWS)
            v = dist_ref[sl, :] > -jnp.inf
            bi = jnp.min(jnp.where(v, block_iota(b), big))
            take = bi < first
            sel = (block_iota(b) == bi).astype(jnp.float32)
            bx = jnp.sum(pts_ref[0, sl, :] * sel)
            by = jnp.sum(pts_ref[1, sl, :] * sel)
            bz = jnp.sum(pts_ref[2, sl, :] * sel)
            return (
                jnp.where(take, bi, first),
                jnp.where(take, bx, fx),
                jnp.where(take, by, fy),
                jnp.where(take, bz, fz),
            )

        first, fx, fy, fz = jax.lax.fori_loop(
            0, n_blocks, first_body,
            (big, jnp.float32(0), jnp.float32(0), jnp.float32(0)),
        )
        idx_ref[:] = jnp.where(kidx == 0, first, 0)
        last_ref[0] = first
        coord_ref[0] = fx
        coord_ref[1] = fy
        coord_ref[2] = fz

    @pl.when(i > 0)
    def _():
        px = coord_ref[0]
        py = coord_ref[1]
        pz = coord_ref[2]

        def update(b, acc):
            best, best_idx = acc
            sl = pl.ds(b * _BLOCK_ROWS, _BLOCK_ROWS)
            dx = pts_ref[0, sl, :] - px
            dy = pts_ref[1, sl, :] - py
            dz = pts_ref[2, sl, :] - pz
            nd = jnp.minimum(dist_ref[sl, :], dx * dx + dy * dy + dz * dz)
            dist_ref[sl, :] = nd
            m = jnp.max(nd)
            bidx = jnp.min(jnp.where(nd == m, block_iota(b), big))
            take = m > best
            return jnp.where(take, m, best), jnp.where(take, bidx, best_idx)

        _, nxt = jax.lax.fori_loop(0, n_blocks, update, (-jnp.inf, big))
        idx_ref[:] = jnp.where(kidx == i, nxt, idx_ref[:])
        last_ref[0] = nxt

        # extract the selected coords from just its block (dynamic sublane
        # start, provably a multiple of _BLOCK_ROWS)
        blk = nxt // (_BLOCK_ROWS * _LANES)
        start = pl.multiple_of(blk * _BLOCK_ROWS, _BLOCK_ROWS)
        sel = (block_iota(blk) == nxt).astype(jnp.float32)
        coord_ref[0] = jnp.sum(pts_ref[0, pl.ds(start, _BLOCK_ROWS), :] * sel)
        coord_ref[1] = jnp.sum(pts_ref[1, pl.ds(start, _BLOCK_ROWS), :] * sel)
        coord_ref[2] = jnp.sum(pts_ref[2, pl.ds(start, _BLOCK_ROWS), :] * sel)


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def furthest_point_sample_pallas(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, 3) [+ (N,) mask] -> (num_samples,) int32 indices."""
    N = points.shape[0]
    per_block = _BLOCK_ROWS * _LANES
    pad = (-N) % per_block
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

    idx = pl.pallas_call(
        functools.partial(_fps_kernel, rows=rows),
        grid=(num_samples,),
        out_shape=jax.ShapeDtypeStruct((1, num_samples + kpad), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, num_samples + kpad), lambda i: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((3, rows, _LANES), jnp.float32),
            pltpu.VMEM((rows, _LANES), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((3,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem_bytes, 120 * 1024 * 1024)),
        ),
        interpret=interpret,
    )(planes, dist0)
    return idx[0, :num_samples]
