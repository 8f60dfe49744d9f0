"""Fixed-radius ball query with static shapes.

TPU-native equivalent of the reference CUDA op (reference:
mmdetection3d/mmdet3d/ops/ball_query/ball_query_cuda.cu). Contract: for
each query center, return the indices of the first ``nsample`` points (in
input order) whose distance lies in [min_radius, max_radius]; remaining
slots are filled with the first found index (CUDA behavior). Centers with
no neighbor return all zeros.

TPU design, two exact implementations:

- ``scan``: centers in chunks; the point axis streams in blocks through a
  ``lax.scan`` carrying a running smallest-nsample set of order-encoded
  scores — peak memory (chunk x block), never (M x N).
- ``grid`` (default for large N): points are bucket-sorted by a BEV cell
  grid sized from the centers' extent; each (cell-sorted) center chunk
  scans ONLY the blocks covering its 3-row cell neighborhood, via
  dynamic-bound while loops. Selection is "smallest nsample original
  indices in radius", which is scan-order invariant, so the pre-sort
  changes nothing — measured ~6x over the full scan at nuScenes scales.

Perf note (v5e, N=2.7M / M=25k / r=0.5): ~143ms. A Pallas kernel with
VMEM-resident sorted points was built and benchmarked in several shapes;
none beat this meaningfully, so it was dropped. Findings for future
attempts: (a) Mosaic dynamic-trip fori_loops cost ~0.7ms per construct —
band scans must use static trip counts; (b) large mutable while-loop
carries (the candidate buffer) cost a VMEM copy per iteration (~10x);
(c) with both fixed, the floor is the per-event top-nsample extraction
(~25us per (chunk, band) even via an early-exit threshold chain), ~100ms
total at the ~4k extraction events any compact-chunk tiling needs — only
~1.4x under this implementation, and exact only with data-dependent span
caps. A second attempt (fully static per-cell work items, scalar-prefetch
block routing, unconditional 16-round threshold chains on (64, 128)
tiles) measured ~24us per item — the nsample-deep serial reduce chain is
latency-bound no matter the tiling, and clustered data overflows any
static item cap. A fundamentally cheaper exact small-k selection
primitive is the prerequisite for a kernel win here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["ball_query"]


def ball_query(
    min_radius: float,
    max_radius: float,
    nsample: int,
    points: jnp.ndarray,
    centers: jnp.ndarray,
    points_valid: jnp.ndarray | None = None,
    chunk: int = 128,
    block: int = 32768,
    impl: str = "auto",
    selection: str = "first",
    grid_dim: int = 64,
    grid_block: int = 8192,
    structure=None,
) -> jnp.ndarray:
    """points (N, 3), centers (M, 3) -> (M, nsample) int32.

    Knob sweeps on v5e at the production shape (25k centers x 393k-buffer
    pre-reduced cloud, scripts/bench_bq_sweep.py + bench_pipeline_anchored
    .py). The result is knob-invariant (exact op); only the cost moves:
    - fully dense buffer (~393k active): chunk 128 at 34.2 ms vs 256 at
      45.6; grid_dim 64 / grid_block 8192 best — the defaults here.
    - production density (~78k active, the anchored/real-scene regime):
      a finer grid wins — grid_dim 128 / grid_block 2048 at 28.9 ms vs
      35.1 for the dense-tuned defaults. ReconstructionBackbone defaults
      to the production tuning.

    ``selection="any"`` (grid impl only) relaxes the CUDA first-in-input-
    order tie-break to smallest-sorted-position, enabling exact early
    termination of the band scans — see _ball_query_grid. Measured slower
    at BOTH densities (37.9 vs 34.2 dense, 34.1 vs 28.9 anchored): the
    extra early-exit reduction per block outweighs the skipped blocks.

    ``structure`` (grid impl only): a precomputed ``ops.cell_sort
    .CellSort`` over (points, points_valid) — skips the internal point
    sort/boundary build so one structure can be shared with the FPS
    kernel (see cell_sort.py; its grid_dim overrides ``grid_dim`` here,
    and its ``min_cell`` must be >= max_radius)."""
    if structure is not None:
        # a provided structure is only consumed by the grid impl; letting
        # the size heuristic route to 'scan' would silently discard it
        # (wasted caller work), so force the grid path
        if impl == "scan":
            raise ValueError("structure= requires the grid impl")
        impl = "grid"
        mc = getattr(structure, "min_cell", None)
        if isinstance(mc, (int, float)) and mc > 0 and mc < max_radius:
            raise ValueError(
                f"CellSort built with min_cell={mc} < max_radius="
                f"{max_radius}: the +-1-cell band scan would miss "
                "in-radius points (cell_sort.py correctness bound)"
            )
    if impl == "auto":
        impl = "grid" if points.shape[0] >= 65536 else "scan"
    if impl == "grid":
        return _ball_query_grid(
            min_radius, max_radius, nsample, points, centers, points_valid,
            chunk=chunk, block=grid_block, grid_dim=grid_dim,
            selection=selection, structure=structure,
        )
    return _ball_query_scan(
        min_radius, max_radius, nsample, points, centers, points_valid,
        chunk=chunk, block=block,
    )


@functools.partial(
    jax.jit,
    static_argnames=("nsample", "min_radius", "max_radius", "chunk", "block"),
)
def _ball_query_scan(
    min_radius: float,
    max_radius: float,
    nsample: int,
    points: jnp.ndarray,
    centers: jnp.ndarray,
    points_valid: jnp.ndarray | None = None,
    chunk: int = 256,
    block: int = 32768,
) -> jnp.ndarray:
    """Full streaming scan (exact, O(M x N))."""
    N = points.shape[0]
    M = centers.shape[0]
    big = jnp.int32(N)

    n_pad = (-N) % block
    pts = jnp.pad(points.astype(jnp.float32), ((0, n_pad), (0, 0)))
    idx_all = jnp.arange(N + n_pad, dtype=jnp.int32)
    valid = jnp.ones((N + n_pad,), bool).at[N:].set(False)
    if points_valid is not None:
        valid = valid.at[:N].set(points_valid.astype(bool))
    pts_b = pts.reshape(-1, block, 3)
    idx_b = idx_all.reshape(-1, block)
    val_b = valid.reshape(-1, block)

    m_pad = (-M) % chunk
    centers_c = jnp.pad(centers.astype(jnp.float32), ((0, m_pad), (0, 0)))
    centers_c = centers_c.reshape(-1, chunk, 3)

    min_sq = float(min_radius) ** 2
    max_sq = float(max_radius) ** 2

    def one_chunk(c):  # c: (chunk, 3)
        def body(carry, blk):
            p, i, v = blk
            d2 = jnp.sum((c[:, None, :] - p[None, :, :]) ** 2, axis=-1)
            in_ball = (d2 <= max_sq) & v[None, :]
            if min_sq > 0:
                in_ball &= d2 >= min_sq
            score = jnp.where(in_ball, i[None, :], big)
            merged = jnp.concatenate([carry, score], axis=1)
            neg, _ = jax.lax.top_k(-merged, nsample)
            return -neg, None

        init = jnp.full((chunk, nsample), big, jnp.int32)
        best, _ = jax.lax.scan(body, init, (pts_b, idx_b, val_b))
        found = best < big
        first = jnp.where(found[:, :1], best[:, :1], 0)
        return jnp.where(found, best, first).astype(jnp.int32)

    out = jax.lax.map(one_chunk, centers_c)
    return out.reshape(-1, nsample)[:M]


@functools.partial(
    jax.jit,
    static_argnames=("nsample", "min_radius", "max_radius", "chunk", "block",
                     "grid_dim", "selection"),
)
def _ball_query_grid(
    min_radius: float,
    max_radius: float,
    nsample: int,
    points: jnp.ndarray,
    centers: jnp.ndarray,
    points_valid: jnp.ndarray | None = None,
    chunk: int = 256,
    block: int = 8192,
    grid_dim: int = 64,
    selection: str = "first",
    structure=None,
) -> jnp.ndarray:
    """Grid-pruned exact ball query.

    ``selection="first"`` (default) keeps the CUDA contract — the nsample
    smallest ORIGINAL indices in radius. ``selection="any"`` keeps the
    nsample smallest SORTED-GRID positions instead (equally deterministic,
    equally in-radius, but a different tie-break), which makes a full
    candidate set final — band scans early-terminate once every center in
    the chunk has nsample hits. Use for throughput paths where the exact
    reference tie-break doesn't matter (the downstream union mask only
    cares WHICH points are dense, not which representative was kept).

    Points are bucket-sorted by (row, col) of a grid_dim^2 BEV grid sized
    from the centers' bounding box (+radius); cell boundaries come from a
    counts cumsum. Centers are also cell-sorted; every chunk of centers
    scans, for each of its 3 row bands, only the sorted-point blocks
    covering the chunk's contiguous [min-start, max-end) range, with a
    dynamic-trip-count while loop. Each physical point is considered at
    most once per band (range masks kill block-rounding slop), so the
    running smallest-nsample merge sees no duplicates."""
    N = points.shape[0]
    M = centers.shape[0]
    # "first" scores are original indices (< N); "any" scores are sorted
    # positions (< N + pad) — the sentinel must exceed both
    big = jnp.int32(N if selection == "first" else 2 ** 30)
    G = grid_dim
    n_cells = G * G
    min_sq = float(min_radius) ** 2
    max_sq = float(max_radius) ** 2
    r = float(max_radius)

    cen = centers.astype(jnp.float32)

    if structure is not None:
        # shared pre-built sort (ops/cell_sort.py). Exactness: the
        # structure's grid covers the points' valid extent with
        # cell >= min_cell >= r, centers are (selected) points and thus
        # in-extent, so an in-radius point is never more than one
        # row/column from its center's cell — the +-1 band below.
        G = structure.grid_dim
        n_cells = G * G
        lo = structure.lo
        cell = structure.cell
        spts, sval = structure.spts, structure.sval
        sorig, cell_start = structure.sorig, structure.cell_start

        def cell_of(xy):
            rc = jnp.floor((xy - lo) / cell).astype(jnp.int32)
            return jnp.clip(rc, 0, G - 1)
    else:
        pts = points.astype(jnp.float32)
        valid = (
            points_valid.astype(bool) if points_valid is not None
            else jnp.ones((N,), bool)
        )

        # grid extent from the centers (+r margin). The +-1-cell neighbor
        # guarantee needs cell >= r, so clamp upward; the grid then covers
        # at least [lo, lo + G*cell] ⊇ all centers, and points outside are
        # CLIPPED into the boundary cells (scanned there, distance-
        # filtered) — a point within r of any center is never clipped
        # across more than one cell boundary relative to that center.
        lo = jnp.min(cen[:, :2], axis=0) - r
        hi = jnp.max(cen[:, :2], axis=0) + r
        cell = jnp.maximum((hi - lo) / G, r)  # (2,)

        def cell_of(xy):
            rc = jnp.floor((xy - lo) / cell).astype(jnp.int32)
            return jnp.clip(rc, 0, G - 1)

        prc = cell_of(pts[:, :2])
        pcell = jnp.where(valid, prc[:, 0] * G + prc[:, 1], n_cells)

        order = jnp.argsort(pcell, stable=True)
        spts = pts[order]
        sval = valid[order]
        sorig = order.astype(jnp.int32)
        scell = pcell[order]

        counts = jnp.zeros((n_cells + 1,), jnp.int32).at[scell].add(1)
        cell_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
        )  # (n_cells + 2,); cell_start[c] = first sorted row of cell c

    # pad sorted arrays to a block multiple
    n_pad = (-N) % block
    spts = jnp.pad(spts, ((0, n_pad), (0, 0)))
    sval = jnp.pad(sval, (0, n_pad))
    sorig = jnp.pad(sorig, (0, n_pad), constant_values=N)

    # cell-sort the centers too, for chunk coherence
    crc = cell_of(cen[:, :2])
    ccell = crc[:, 0] * G + crc[:, 1]
    aorder = jnp.argsort(ccell, stable=True)
    cen_s = cen[aorder]
    crc_s = crc[aorder]

    m_pad = (-M) % chunk
    cen_c = jnp.pad(cen_s, ((0, m_pad), (0, 0))).reshape(-1, chunk, 3)
    # padded centers reuse the last real center's cells (harmless work)
    crc_c = jnp.pad(crc_s, ((0, m_pad), (0, 0)), mode="edge").reshape(
        -1, chunk, 2
    )

    def one_chunk(args):
        c, rc = args  # (chunk, 3), (chunk, 2)

        def band(dr, best):
            row = jnp.clip(rc[:, 0] + dr, 0, G - 1)
            c0 = jnp.clip(rc[:, 1] - 1, 0, G - 1)
            c1 = jnp.clip(rc[:, 1] + 1, 0, G - 1)
            starts = cell_start[row * G + c0]
            ends = cell_start[row * G + c1 + 1]
            # rows outside the grid contribute empty ranges
            oob = (rc[:, 0] + dr < 0) | (rc[:, 0] + dr >= G)
            starts = jnp.where(oob, 0, starts)
            ends = jnp.where(oob, 0, ends)
            lo_i = jnp.min(starts)
            hi_i = jnp.max(ends)
            b0 = lo_i // block
            b1 = (hi_i + block - 1) // block

            def cond(carry):
                b, best = carry
                if selection == "first":
                    # the exact CUDA contract keeps the smallest nsample
                    # ORIGINAL indices, which are decorrelated from the
                    # sorted scan order — a full set can still be improved
                    # by any later block, so no early exit is possible
                    return b < b1
                # selection == "any": scores are ascending sorted POSITIONS,
                # so once every center's candidate set is full no later
                # block can improve it — exact early termination
                return (b < b1) & ~jnp.all(best[:, nsample - 1] < big)

            def body(carry):
                b, best = carry
                base = b * block
                p = jax.lax.dynamic_slice(spts, (base, 0), (block, 3))
                v = jax.lax.dynamic_slice(sval, (base,), (block,))
                pos = base + jnp.arange(block, dtype=jnp.int32)
                if selection == "first":
                    score_id = jax.lax.dynamic_slice(sorig, (base,), (block,))
                else:
                    score_id = pos
                # per-center exact range mask (kills rounding slop and
                # cells between c0/c1 belonging to other rows)
                in_rng = (pos[None, :] >= starts[:, None]) & (
                    pos[None, :] < ends[:, None]
                )
                d2 = jnp.sum((c[:, None, :] - p[None, :, :]) ** 2, axis=-1)
                in_ball = (d2 <= max_sq) & v[None, :] & in_rng
                if min_sq > 0:
                    in_ball &= d2 >= min_sq
                score = jnp.where(in_ball, score_id[None, :], big)
                merged = jnp.concatenate([best, score], axis=1)
                neg, _ = jax.lax.top_k(-merged, nsample)
                return b + 1, -neg

            _, best = jax.lax.while_loop(cond, body, (b0, best))
            return best

        best = jnp.full((chunk, nsample), big, jnp.int32)
        for dr in (-1, 0, 1):
            best = band(dr, best)
        found = best < big
        if selection == "any":
            # map sorted positions back to original indices
            best = sorig[jnp.clip(best, 0, sorig.shape[0] - 1)]
        first = jnp.where(found[:, :1], best[:, :1], 0)
        return jnp.where(found, best, first).astype(jnp.int32)

    out_s = jax.lax.map(one_chunk, (cen_c, crc_c)).reshape(-1, nsample)[:M]
    # restore original center order
    out = jnp.zeros((M, nsample), jnp.int32).at[aorder].set(out_s)
    return out
