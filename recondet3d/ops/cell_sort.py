"""Shared BEV cell-sort structure for the point-pipeline ops.

The production point pipeline runs three spatial sorts over essentially
the same cloud: the FPS anchor kernel's 16x16 bucket sort, the grid ball
query's grid_dim^2 point sort, and the FPS-40k kernel's sort of the
ball-query union (reference pipeline: respoint_post_processing.py
BallQueryDownsample:102 + FPSDownsample:209 — the reference's CUDA ops
each build their own structures too). One cell-sort (argsort + row
gathers) measures ~11 ms at the production 393k-point buffer on v5e
(scripts/bench_bq_sweep.py), so sharing ONE structure between the FPS
anchor selection and the ball query removes ~a third of the point path's
sort overhead.

``cell_sort`` computes the one structure both consumers accept:

- ``furthest_point_sample_pallas(..., presorted=cs)`` skips its own
  bucket sort and builds its per-block AABBs over ``cs.spts`` — any
  spatially-coherent order works for AABB pruning, and the row-major
  order of a fine grid is strictly more coherent than the kernel's own
  16x16 default.
- ``ball_query(..., structure=cs)`` skips its point sort and cell
  boundary build. Exactness is preserved: the grid is sized from the
  POINTS' valid extent with ``cell >= max_radius``, so a point within
  radius of any center (centers are selected points, hence in-extent)
  differs from the center's cell by at most one row/column per axis —
  exactly the +-1 band the query scans.

Results are bit-identical for the ball query ('first' selection scores
by ORIGINAL index, independent of scan order) and identical up to
exact-distance ties for FPS (the kernel's documented contract).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["CellSort", "cell_sort"]


class CellSort(NamedTuple):
    """Cell-sorted view of a (N, 3) cloud over a G x G BEV grid.

    ``grid_dim`` is recoverable statically as isqrt(len(cell_start) - 2),
    so the structure stays a pure array pytree (jit-argument friendly).
    """

    spts: jnp.ndarray        # (N, 3) f32, sorted by cell id (invalid last)
    sval: jnp.ndarray        # (N,) bool, sorted
    sorig: jnp.ndarray       # (N,) int32: sorted position -> original index
    scell: jnp.ndarray       # (N,) int32: cell id per sorted row
    cell_start: jnp.ndarray  # (G*G + 2,) int32: first sorted row per cell
    lo: jnp.ndarray          # (2,) f32 grid origin (xy)
    cell: jnp.ndarray        # (2,) f32 cell size (xy)
    # static python float: the min_cell the structure was built with. A
    # consumer querying radius r needs min_cell >= r for the +-1-cell
    # correctness bound — ball_query raises at trace time when it can see
    # this value (i.e. whenever the structure was built in the same trace
    # or outside jit; a jit-argument structure lifts it to a tracer and
    # the check is skipped).
    min_cell: float = 0.0

    @property
    def grid_dim(self) -> int:
        import math

        return math.isqrt(self.cell_start.shape[0] - 2)


def cell_sort(
    points: jnp.ndarray,
    valid: jnp.ndarray | None,
    grid_dim: int = 128,
    min_cell: float = 0.5,
) -> CellSort:
    """Sort ``points`` (N, >=3; xy used for cells) by a grid_dim^2 BEV
    grid over the VALID extent. ``min_cell`` must be >= the largest query
    radius any consumer will use (the ball query's +-1-cell correctness
    bound)."""
    N = points.shape[0]
    G = grid_dim
    n_cells = G * G
    pts = points[:, :3].astype(jnp.float32)
    v = (
        valid.astype(bool) if valid is not None
        else jnp.ones((N,), bool)
    )

    lo = jnp.min(jnp.where(v[:, None], pts[:, :2], jnp.inf), axis=0)
    hi = jnp.max(jnp.where(v[:, None], pts[:, :2], -jnp.inf), axis=0)
    cell = jnp.maximum((hi - lo) / G, jnp.float32(min_cell))
    rc = jnp.clip(
        jnp.floor((pts[:, :2] - lo) / cell).astype(jnp.int32), 0, G - 1
    )
    pcell = jnp.where(v, rc[:, 0] * G + rc[:, 1], n_cells)

    order = jnp.argsort(pcell, stable=True).astype(jnp.int32)
    spts = pts[order]
    sval = v[order]
    scell = pcell[order]

    counts = jnp.zeros((n_cells + 1,), jnp.int32).at[scell].add(1)
    cell_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    return CellSort(spts, sval, order, scell, cell_start, lo, cell,
                    float(min_cell))
