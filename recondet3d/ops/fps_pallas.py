"""Furthest point sampling as a single Pallas TPU kernel.

The XLA while-loop formulation of FPS pays per-iteration kernel-launch
overhead x K (25k-40k iterations in the ResDet3D pipeline — reference:
respoint_post_processing.py FPSDownsample/BallQueryDownsample). This
kernel keeps the point cloud and the running min-distance array resident
in VMEM and runs all K argmax/update iterations inside one kernel; each
iteration streams the N points in static row blocks so live temporaries
stay ~0.5 MB (v5e scoped VMEM is ~14 MB and the resident buffers already
use ~13 MB at N=850k).

Selection semantics match recondet3d.ops.sampling.furthest_point_sample
exactly (first valid point first, then iterative argmax; invalid points
never selected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["furthest_point_sample_pallas"]

_LANES = 128
_BLOCK_ROWS = 1024


def _fps_kernel(pts_ref, dist_in_ref, idx_ref, dist_ref, *, num_samples, rows, n_blocks):
    """pts_ref: (3, rows, 128) xyz planes; dist_in/dist_ref: (rows, 128)
    min-dist (same buffer via input_output_aliases; -inf marks invalid);
    idx_ref: (1, Kpad) int32 out."""
    del dist_in_ref  # aliased with dist_ref
    big = jnp.int32(rows * _LANES)

    def block_iota(b):
        r = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_ROWS, _LANES), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_ROWS, _LANES), 1)
        return (b * _BLOCK_ROWS + r) * _LANES + c

    # first selected point = first valid index
    def first_body(b, acc):
        sl = pl.ds(b * _BLOCK_ROWS, _BLOCK_ROWS)
        v = dist_ref[sl, :] > -jnp.inf
        return jnp.minimum(acc, jnp.min(jnp.where(v, block_iota(b), big)))

    first = jax.lax.fori_loop(0, n_blocks, first_body, big)
    kidx = jax.lax.broadcasted_iota(jnp.int32, idx_ref.shape, 1)
    idx_ref[:] = jnp.where(kidx == 0, first, 0)

    def body(i, last):
        # pass 1: extract the selected xyz with masked reductions
        def extract(b, acc):
            sl = pl.ds(b * _BLOCK_ROWS, _BLOCK_ROWS)
            sel = (block_iota(b) == last).astype(jnp.float32)
            return (
                acc[0] + jnp.sum(pts_ref[0, sl, :] * sel),
                acc[1] + jnp.sum(pts_ref[1, sl, :] * sel),
                acc[2] + jnp.sum(pts_ref[2, sl, :] * sel),
            )

        px, py, pz = jax.lax.fori_loop(0, n_blocks, extract, (0.0, 0.0, 0.0))

        # pass 2: update min-distances blockwise, tracking the global argmax
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
        return nxt

    jax.lax.fori_loop(1, num_samples, body, first)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def furthest_point_sample_pallas(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(N, 3) [+ (N,) mask] -> (num_samples,) int32 indices."""
    N = points.shape[0]
    per_block = _BLOCK_ROWS * _LANES
    pad = (-N) % per_block
    rows = (N + pad) // _LANES
    n_blocks = rows // _BLOCK_ROWS

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
    vmem_bytes = (4 * rows * _LANES * 4) + (num_samples + kpad) * 4 + (2 << 20)

    idx, _ = pl.pallas_call(
        functools.partial(
            _fps_kernel, num_samples=num_samples, rows=rows, n_blocks=n_blocks
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, num_samples + kpad), jnp.int32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem_bytes, 120 * 1024 * 1024)),
        ),
        # alias the initial-distance input onto the distance output so only
        # one (rows, 128) fp32 buffer lives in VMEM
        input_output_aliases={1: 1},
    )(planes, dist0)
    return idx[0, :num_samples]
