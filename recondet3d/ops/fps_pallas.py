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
- each grid step is one fused VPU pass over the resident points;
- **block pruning** (exact): the caller spatially sorts the points and
  passes per-block bounding boxes; a step skips any block whose
  point-to-AABB distance from the newly selected point is >= the block's
  tracked max min-distance — the update ``dist = min(dist, d)`` provably
  cannot change anything there. Blocks are organized in a two-level
  tournament (groups of _GROUP with union AABBs + cached group maxima in
  SMEM), so the per-selection scalar sweep visits ~n_blocks/_GROUP
  groups instead of every block — the flat sweep's scalar iterations
  (~80ns each) dominated at nuScenes sizes;
- ``_SEL_PER_STEP`` selections run per grid step to amortize the Mosaic
  pipeline cost per step.

VMEM budget: N*16 bytes (xyz + min-dist, fp32) — N up to ~5M within the
120MB limit used here (25k from 2.7M measured at ~115ms on v5e).
Selection matches recondet3d.ops.sampling.furthest_point_sample_xla
up to tie-breaking on equal distances (the spatial pre-sort permutes
which of two exactly-equidistant points wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["furthest_point_sample_pallas"]

_LANES = 128


_BLOCK_ROWS = 256


_GROUP = 4  # blocks per tournament group
_SEL_PER_STEP = 8  # selections per grid step (amortizes pipeline cost)


def _fps_kernel(start_ref, aabb_ref, pts_hbm, dist_hbm, idx_ref, pts_ref,
                dist_ref, last_ref, coord_ref, bmax_ref, barg_ref, gmax_ref,
                gargb_ref, sem, *, rows, block_rows, group, sel_per_step):
    """Grid step i selects point i. The per-step pass runs in static row
    blocks so live temporaries stay ~0.25 MB next to the ~14 MB resident
    scratch; each block is guarded by the AABB lower-bound test.

    Blocks are organized in a two-level tournament (groups of group with
    a cached group AABB + group max-min-distance): the per-step scalar
    sweep visits groups and descends only into groups whose AABB lower
    bound can still change something / that hold the global argmax. At
    N=2.7M (83 blocks) the flat sweep's ~83 scalar iterations per step
    were the dominant cost (~8us/step)."""
    i = pl.program_id(0)
    big = jnp.int32(rows * _LANES)
    n_blocks = rows // block_rows
    n_groups = -(-n_blocks // group)

    def block_iota(b):
        r = jax.lax.broadcasted_iota(jnp.int32, (block_rows, _LANES), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (block_rows, _LANES), 1)
        return (b * block_rows + r) * _LANES + c

    def block_slice(b):
        return pl.ds(pl.multiple_of(b * block_rows, block_rows), block_rows)

    def extract_coords(pos):
        """Selected coords from an 8-row aligned window around ``pos`` —
        3 masked reductions over (8, 128) instead of the full
        (block_rows, 128) block (~1us/selection saved at 40k picks)."""
        row = pos // _LANES
        base8 = (row // 8) * 8
        sl = pl.ds(pl.multiple_of(base8, 8), 8)
        ii = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        sel = (((ii + base8) * _LANES + jj) == pos).astype(jnp.float32)
        coord_ref[0] = jnp.sum(pts_ref[0, sl, :] * sel)
        coord_ref[1] = jnp.sum(pts_ref[1, sl, :] * sel)
        coord_ref[2] = jnp.sum(pts_ref[2, sl, :] * sel)

    def write_idx(k, val):
        """Write selection ``k`` into the (KROWS, 128) output via an
        8-row-aligned read-modify-write — a (8, 128) where instead of a
        full-K-wide vector where per selection."""
        base8 = ((k // _LANES) // 8) * 8
        sl = pl.ds(pl.multiple_of(base8, 8), 8)
        ii = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        flat = (ii + base8) * _LANES + jj
        idx_ref[sl, :] = jnp.where(flat == k, val, idx_ref[sl, :])

    def aabb_lb2(base, px, py, pz):
        dx = jnp.maximum(
            jnp.maximum(aabb_ref[base + 0] - px, px - aabb_ref[base + 1]), 0.0
        )
        dy = jnp.maximum(
            jnp.maximum(aabb_ref[base + 2] - py, py - aabb_ref[base + 3]), 0.0
        )
        dz = jnp.maximum(
            jnp.maximum(aabb_ref[base + 4] - pz, pz - aabb_ref[base + 5]), 0.0
        )
        return dx * dx + dy * dy + dz * dz

    def group_refresh(g):
        """Recompute a group's max min-distance AND the first member block
        achieving it. Tracking the argmax block here (refreshes run only
        for updated groups, ~1-2 per selection) removes the 8-iteration
        member scan the global argmax otherwise pays EVERY selection —
        measured ~0.9us of the ~1.7us per-selection cost (the scalar
        tournament loops dominate; scripts/bench_fps_probe.py)."""
        base = g * group

        def m_body(j, acc):
            m, ab = acc
            v = bmax_ref[base + j]
            take = v > m  # strict: first block on ties, as the flat scan
            return jnp.where(take, v, m), jnp.where(take, base + j, ab)

        gmax, gab = jax.lax.fori_loop(
            0, group, m_body, (-jnp.inf, jnp.int32(0))
        )
        gmax_ref[g] = gmax
        gargb_ref[g] = gab

    def select_next(i_sel):
        """One FPS selection: prune-update the min-distances from the last
        selected point, then tournament-argmax the next point."""
        px = coord_ref[0]
        py = coord_ref[1]
        pz = coord_ref[2]

        def update_block(b):
            lb2 = aabb_lb2(b * 8, px, py, pz)

            @pl.when(lb2 < bmax_ref[b])
            def _():
                sl = block_slice(b)
                ddx = pts_ref[0, sl, :] - px
                ddy = pts_ref[1, sl, :] - py
                ddz = pts_ref[2, sl, :] - pz
                nd = jnp.minimum(
                    dist_ref[sl, :], ddx * ddx + ddy * ddy + ddz * ddz
                )
                dist_ref[sl, :] = nd
                m = jnp.max(nd)
                bmax_ref[b] = m
                barg_ref[b] = jnp.min(jnp.where(nd == m, block_iota(b), big))

        def sweep_group(g, _):
            glb2 = aabb_lb2((n_blocks + g) * 8, px, py, pz)

            @pl.when(glb2 < gmax_ref[g])
            def _():
                def member(j, _):
                    b = g * group + j

                    @pl.when(b < n_blocks)
                    def _():
                        update_block(b)

                    return 0

                jax.lax.fori_loop(0, group, member, 0)
                group_refresh(g)

            return 0

        jax.lax.fori_loop(0, n_groups, sweep_group, 0)

        # tournament argmax: first group with a strictly greater max =
        # the group holding the first block achieving the global max —
        # identical tie-breaking to the flat ascending-block scan. The
        # winning block comes straight from the per-group argmax cache.
        def gbest_body(g, acc):
            best, bwin = acc
            m = gmax_ref[g]
            take = m > best
            return jnp.where(take, m, best), jnp.where(take, gargb_ref[g], bwin)

        _, bwin = jax.lax.fori_loop(
            0, n_groups, gbest_body, (-jnp.inf, jnp.int32(0))
        )
        nxt = barg_ref[bwin]
        write_idx(i_sel, nxt)
        last_ref[0] = nxt
        extract_coords(nxt)

    # sel_per_step selections per grid step amortize the ~1.5-2.5us
    # Mosaic pipeline cost per grid step (measured ~60% of per-selection
    # time at 40k selections)
    @pl.when(i == 0)
    def _():
        cp1 = pltpu.make_async_copy(pts_hbm, pts_ref, sem.at[0])
        cp2 = pltpu.make_async_copy(dist_hbm, dist_ref, sem.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        def init_body(b, _):
            sl = block_slice(b)
            d = dist_ref[sl, :]
            m = jnp.max(d)
            bmax_ref[b] = m
            barg_ref[b] = jnp.min(jnp.where(d == m, block_iota(b), big))
            return 0

        jax.lax.fori_loop(0, n_blocks, init_body, 0)

        def pad_body(b, _):
            bmax_ref[b] = -jnp.inf
            barg_ref[b] = big
            return 0

        jax.lax.fori_loop(n_blocks, n_groups * group, pad_body, 0)

        def ginit_body(g, _):
            group_refresh(g)
            return 0

        jax.lax.fori_loop(0, n_groups, ginit_body, 0)

        first = start_ref[0]
        idx_ref[:] = jnp.zeros_like(idx_ref)
        write_idx(0, first)
        last_ref[0] = first
        extract_coords(first)
        for t in range(1, sel_per_step):
            select_next(t)

    @pl.when(i > 0)
    def _():
        for t in range(sel_per_step):
            select_next(i * sel_per_step + t)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_samples", "interpret", "block_rows", "group", "sel_per_step"
    ),
)
def furthest_point_sample_pallas(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
    interpret: bool = False,
    block_rows: int | None = None,
    group: int = _GROUP,
    sel_per_step: int = _SEL_PER_STEP,
    presorted=None,
) -> jnp.ndarray:
    """(N, 3) [+ (N,) mask] -> (num_samples,) int32 indices.

    Points are spatially bucket-sorted (16x16 BEV cells) before the
    kernel so the per-block AABBs are tight and pruning bites; results
    map back to original indices. The first selected point is the first
    valid point in ORIGINAL order (matching the XLA reference).

    ``block_rows``/``group``/``sel_per_step`` tune the kernel's pruning
    granularity / tournament fan-in / per-grid-step batching. Swept on
    v5e at the production pipeline shapes (N=393k/K=25k, N=425k/K=40k —
    scripts/bench_fps_tuning.py): (256, 4, 8) won at 44.0/65.7 ms;
    group=8 costs ~10% more (48.3/70.7 — fewer groups pass the group
    AABB test with narrower fan-in, so fewer member tests run per
    selection), 128-row blocks lose ~18% and 64-row blocks ~35% — finer
    pruning does not pay back the extra scalar sweep. At much larger
    block counts (no-pre-reduce clouds, ~83 blocks) wider groups
    amortize the group scan better; callers there may prefer group=8.
    The selected SET is identical across block layouts at these shapes
    (checked in the sweep); only exact-tie ordering could differ.

    ``presorted``: an ``ops.cell_sort.CellSort`` over (points,
    valid_mask) — skips the internal bucket sort so the structure can be
    shared with the grid ball query (any spatially-coherent order works
    for the AABB pruning; a fine-grid row-major order is at least as
    coherent as the 16x16 default). A bare ``(spts, sval, sorig)`` tuple
    is also accepted, with the same contract as the CellSort fields:
    ``spts`` a permutation of ``points[:, :3]`` as f32 (same row count),
    ``sval`` the validity mask in the same permuted order with every
    invalid row AFTER the valid ones, and ``sorig`` int32 mapping sorted
    position -> original index covering every index exactly once. An
    inconsistent tuple yields silently wrong indices (the seed lookup
    ``argmax(order == first_orig)`` falls back to 0 when ``first_orig``
    is absent from ``sorig``); shape consistency is asserted."""
    N = points.shape[0]
    if block_rows is None:
        block_rows = _BLOCK_ROWS
    per_block = block_rows * _LANES
    pad = (-N) % per_block
    rows = (N + pad) // _LANES
    n_blocks = rows // block_rows

    valid = (
        valid_mask.astype(bool) if valid_mask is not None
        else jnp.ones((N,), bool)
    )

    if presorted is not None:
        # CellSort (ops/cell_sort.py) or a bare (spts, sval, sorig) tuple
        if hasattr(presorted, "spts"):
            spts, svalid, order = (
                presorted.spts, presorted.sval, presorted.sorig
            )
        else:
            spts, svalid, order = presorted
        if spts.shape[0] != N:
            raise ValueError(
                f"presorted rows {spts.shape[0]} != points rows {N}"
            )
        spts = spts[:, :3].astype(jnp.float32)
        svalid = svalid.astype(bool)
    else:
        # spatial bucket sort (invalid points to the back)
        pts_f = points.astype(jnp.float32)
        G = 16
        lo = jnp.min(jnp.where(valid[:, None], pts_f[:, :2], jnp.inf), axis=0)
        hi = jnp.max(jnp.where(valid[:, None], pts_f[:, :2], -jnp.inf), axis=0)
        cell = jnp.maximum((hi - lo) / G, 1e-6)
        rc = jnp.clip(
            jnp.floor((pts_f[:, :2] - lo) / cell).astype(jnp.int32), 0, G - 1
        )
        pcell = jnp.where(valid, rc[:, 0] * G + rc[:, 1], G * G)
        order = jnp.argsort(pcell, stable=True).astype(jnp.int32)
        spts = pts_f[order]
        svalid = valid[order]

    # first valid point in ORIGINAL order -> its sorted position
    first_orig = jnp.argmax(valid).astype(jnp.int32)
    start = jnp.argmax(order == first_orig).astype(jnp.int32)[None]

    pts = jnp.pad(spts, ((0, pad), (0, 0)))
    planes = pts.T.reshape(3, rows, _LANES)

    dist0 = jnp.full((N + pad,), 1e10, jnp.float32)
    dist0 = dist0.at[:N].set(jnp.where(svalid, 1e10, -jnp.inf))
    dist0 = dist0.at[N:].set(-jnp.inf)
    dist0 = dist0.reshape(rows, _LANES)

    # per-block AABBs over VALID points (empty blocks -> inverted boxes
    # whose lower bound is huge -> always skipped), plus per-GROUP union
    # AABBs appended for the kernel's two-level tournament
    pv = jnp.pad(svalid, (0, pad)).reshape(n_blocks, per_block, 1)
    pb = pts.reshape(n_blocks, per_block, 3)
    blo = jnp.min(jnp.where(pv, pb, jnp.inf), axis=1)  # (n_blocks, 3)
    bhi = jnp.max(jnp.where(pv, pb, -jnp.inf), axis=1)
    n_groups = -(-n_blocks // group)
    gpad = n_groups * group - n_blocks
    glo = jnp.min(
        jnp.pad(blo, ((0, gpad), (0, 0)), constant_values=jnp.inf).reshape(
            n_groups, group, 3
        ),
        axis=1,
    )
    ghi = jnp.max(
        jnp.pad(bhi, ((0, gpad), (0, 0)), constant_values=-jnp.inf).reshape(
            n_groups, group, 3
        ),
        axis=1,
    )
    lo6 = jnp.concatenate([blo, glo])
    hi6 = jnp.concatenate([bhi, ghi])
    aabb = jnp.stack(
        [lo6[:, 0], hi6[:, 0], lo6[:, 1], hi6[:, 1], lo6[:, 2], hi6[:, 2]],
        axis=1,
    )
    aabb = jnp.concatenate(
        [aabb, jnp.zeros((n_blocks + n_groups, 2), jnp.float32)], axis=1
    ).reshape(-1)  # ((n_blocks + n_groups) * 8,)

    # output rows padded to a multiple of 8 so the kernel's 8-row-aligned
    # RMW windows are always in-bounds
    kpad = (-num_samples) % (_LANES * 8)
    krows = (num_samples + kpad) // _LANES
    vmem_bytes = (4 * rows * _LANES * 4) + (num_samples + kpad) * 4 + (4 << 20)

    idx_sorted = pl.pallas_call(
        functools.partial(
            _fps_kernel, rows=rows, block_rows=block_rows, group=group,
            sel_per_step=sel_per_step,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(-(-num_samples // sel_per_step),),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (krows, _LANES), lambda i, *_: (0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((3, rows, _LANES), jnp.float32),
                pltpu.VMEM((rows, _LANES), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((3,), jnp.float32),
                pltpu.SMEM((n_groups * group,), jnp.float32),
                pltpu.SMEM((n_groups * group,), jnp.int32),
                pltpu.SMEM((n_groups,), jnp.float32),
                pltpu.SMEM((n_groups,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((krows, _LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem_bytes, 120 * 1024 * 1024)),
        ),
        interpret=interpret,
    )(start, aabb, planes, dist0)
    idx_sorted = idx_sorted.reshape(-1)[:num_samples]
    # map sorted positions back to original indices (pad rows can never be
    # selected while any valid point remains)
    order_pad = jnp.pad(order, (0, pad), constant_values=0)
    return order_pad[idx_sorted]
