"""Golden tests for FPS / ball query / knn / grouping / dynamic scatter
against independent numpy references implementing the CUDA contracts."""

import numpy as np

from recondet3d.ops import (
    ball_query,
    dynamic_scatter,
    dynamic_voxelize,
    furthest_point_sample,
    gather_points,
    group_points,
    knn,
    three_interpolate,
    three_nn,
)


def numpy_fps(points, k):
    n = len(points)
    dist = np.full(n, 1e10)
    idxs = [0]
    for _ in range(k - 1):
        d = np.sum((points - points[idxs[-1]]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        idxs.append(int(np.argmax(dist)))
    return np.array(idxs)


def test_fps_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    got = np.asarray(furthest_point_sample(pts, 32))
    exp = numpy_fps(pts, 32)
    np.testing.assert_array_equal(got, exp)


def test_fps_respects_valid_mask():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pts[50:] = 100.0  # far away padding — would dominate FPS if not masked
    mask = np.arange(100) < 50
    got = np.asarray(furthest_point_sample(pts, 20, mask))
    assert np.all(got < 50)
    exp = numpy_fps(pts[:50], 20)
    np.testing.assert_array_equal(got, exp)


def test_ball_query_contract():
    pts = np.array(
        [[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [5, 5, 5], [0.05, 0, 0]], np.float32
    )
    centers = np.array([[0, 0, 0], [5, 5, 5], [9, 9, 9]], np.float32)
    idx = np.asarray(ball_query(0.0, 0.3, 3, pts, centers))
    # center 0: first 3 in-order neighbors among {0,1,2,4} -> 0,1,2
    np.testing.assert_array_equal(idx[0], [0, 1, 2])
    # center 1: only point 3; remaining slots filled with first found
    np.testing.assert_array_equal(idx[1], [3, 3, 3])
    # center 2: nothing in radius -> zeros
    np.testing.assert_array_equal(idx[2], [0, 0, 0])


def test_knn_matches_numpy():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(40, 3)).astype(np.float32)
    got = np.asarray(knn(4, pts, q))
    d2 = np.sum((q[:, None] - pts[None]) ** 2, axis=-1)
    exp = np.argsort(d2, axis=1, kind="stable")[:, :4]
    # compare by distances (tie order may differ)
    np.testing.assert_allclose(
        np.take_along_axis(d2, got, 1), np.take_along_axis(d2, exp, 1), rtol=1e-5
    )


def test_grouping_and_interpolate():
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(16, 50)).astype(np.float32)  # (C, N)
    idx = rng.integers(0, 50, size=(10,))
    np.testing.assert_allclose(np.asarray(gather_points(feats, idx)), feats[:, idx])

    gidx = rng.integers(0, 50, size=(10, 4))
    np.testing.assert_allclose(np.asarray(group_points(feats, gidx)), feats[:, gidx])

    pts = rng.normal(size=(50, 3)).astype(np.float32)
    q = rng.normal(size=(10, 3)).astype(np.float32)
    dist, nn_idx = three_nn(q, pts)
    d2 = np.sum((q[:, None] - pts[None]) ** 2, axis=-1)
    np.testing.assert_allclose(
        np.sort(np.asarray(dist), axis=1) ** 2,
        np.sort(d2, axis=1)[:, :3],
        rtol=1e-4, atol=1e-5,
    )
    w = 1.0 / (np.asarray(dist) + 1e-8)
    w = (w / w.sum(1, keepdims=True)).astype(np.float32)
    out = np.asarray(three_interpolate(feats, nn_idx, w))
    exp = np.einsum("cmk,mk->cm", feats[:, np.asarray(nn_idx)], w)
    np.testing.assert_allclose(out, exp, rtol=1e-5)


def test_dynamic_scatter_mean_max():
    pcr = (0.0, 0.0, 0.0, 10.0, 10.0, 10.0)
    vs = (1.0, 1.0, 1.0)
    pts = np.array(
        [[0.5, 0.5, 0.5], [0.6, 0.5, 0.5], [3.5, 0.5, 0.5], [20, 0, 0]], np.float32
    )
    coors = dynamic_voxelize(pts, point_cloud_range=pcr, voxel_size=vs)
    feats = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]], np.float32)
    vf, vc, p2v, nv = dynamic_scatter(
        feats, coors, grid=(10, 10, 10), max_voxels=8, reduce="mean"
    )
    assert int(nv) == 2
    np.testing.assert_allclose(np.asarray(vf)[0], [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(vf)[1], [5.0, 6.0])
    np.testing.assert_array_equal(np.asarray(vc)[0], [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(p2v)[:3], [0, 0, 1])
    assert int(np.asarray(p2v)[3]) == 8  # dropped

    vf2, _, _, _ = dynamic_scatter(
        feats, coors, grid=(10, 10, 10), max_voxels=8, reduce="max"
    )
    np.testing.assert_allclose(np.asarray(vf2)[0], [3.0, 4.0])


def test_ball_query_grid_matches_scan():
    """The grid-pruned implementation is exact: identical output to the
    full scan, including dense scenes, clipped-out points, min_radius and
    the no-neighbor fill rules."""
    import numpy as np

    import jax.numpy as jnp

    from recondet3d.ops.ball_query import _ball_query_grid, _ball_query_scan

    rng = np.random.default_rng(0)
    for N, M, scale in [(5000, 300, 20.0), (8000, 500, 3.0), (3000, 200, 0.8)]:
        pts = rng.uniform(-scale, scale, (N, 3)).astype(np.float32)
        cen = pts[rng.choice(N, M, replace=False)] + rng.normal(
            0, 0.05, (M, 3)
        ).astype(np.float32)
        valid = rng.random(N) < 0.9
        a = np.asarray(_ball_query_scan(
            0.0, 0.5, 16, jnp.asarray(pts), jnp.asarray(cen),
            jnp.asarray(valid), chunk=128, block=1024,
        ))
        b = np.asarray(_ball_query_grid(
            0.0, 0.5, 16, jnp.asarray(pts), jnp.asarray(cen),
            jnp.asarray(valid), chunk=128, block=512,
        ))
        np.testing.assert_array_equal(a, b)

    # annulus (min_radius > 0)
    pts = rng.uniform(-5, 5, (4000, 3)).astype(np.float32)
    cen = pts[:200]
    a = np.asarray(_ball_query_scan(0.2, 0.8, 8, jnp.asarray(pts),
                                    jnp.asarray(cen), None, chunk=64, block=512))
    b = np.asarray(_ball_query_grid(0.2, 0.8, 8, jnp.asarray(pts),
                                    jnp.asarray(cen), None, chunk=64, block=256))
    np.testing.assert_array_equal(a, b)


def test_ball_query_any_selection():
    """selection="any" (early-terminating band scans) returns a valid
    in-radius neighbor set: same found/not-found centers as the exact
    CUDA-contract mode, every returned index within radius, and the full
    nsample quota wherever "first" filled its quota."""
    import jax.numpy as jnp

    from recondet3d.ops.ball_query import _ball_query_grid

    rng = np.random.default_rng(11)
    pts = rng.uniform(-10, 10, (6000, 3)).astype(np.float32)
    pts[:3000] = rng.normal(0, 1.2, (3000, 3))  # dense core
    centers = rng.uniform(-9, 9, (300, 3)).astype(np.float32)
    valid = rng.random(6000) < 0.95

    kw = dict(chunk=64, block=512, grid_dim=16)
    a = np.asarray(_ball_query_grid(
        0.0, 0.8, 8, jnp.asarray(pts), jnp.asarray(centers),
        jnp.asarray(valid), selection="first", **kw))
    b = np.asarray(_ball_query_grid(
        0.0, 0.8, 8, jnp.asarray(pts), jnp.asarray(centers),
        jnp.asarray(valid), selection="any", **kw))

    d2a = np.sum((pts[a] - centers[:, None]) ** 2, -1)
    d2b = np.sum((pts[b] - centers[:, None]) ** 2, -1)
    found_a = (d2a[:, 0] <= 0.8 ** 2) & valid[a[:, 0]]
    found_b = (d2b[:, 0] <= 0.8 ** 2) & valid[b[:, 0]]
    np.testing.assert_array_equal(found_a, found_b)
    # all "any" slots of found centers are real in-radius valid points
    assert np.all((d2b[found_b] <= 0.8 ** 2 + 1e-5))
    assert valid[b[found_b]].all()
    # quota parity: a center with k distinct "first" neighbors has >= k
    # distinct "any" neighbors (both cap at the same in-radius population)
    ka = np.array([len(set(r)) for r in a[found_a]])
    kb = np.array([len(set(r)) for r in b[found_b]])
    np.testing.assert_array_equal(ka, kb)


def test_ball_query_shared_structure_identical():
    """ball_query(structure=cell_sort(...)) must be bit-identical to the
    internal-sort path: 'first' selection scores by ORIGINAL index, which
    is independent of the scan order, and the structure's points-extent
    grid preserves the +-1-band exactness (cell >= radius, centers are
    points). See ops/cell_sort.py."""
    import jax.numpy as jnp

    from recondet3d.ops.ball_query import ball_query
    from recondet3d.ops.cell_sort import cell_sort

    rng = np.random.default_rng(3)
    pts = rng.uniform(-40, 40, (70000, 3)).astype(np.float32)
    pts[:30000] = rng.normal(0, 6.0, (30000, 3)).astype(np.float32)
    valid = rng.random(70000) < 0.7
    centers = pts[valid][:800]

    p, v, c = jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(centers)
    base = np.asarray(ball_query(0.0, 0.5, 16, p, c, points_valid=v,
                                 impl="grid"))
    cs = cell_sort(p, v, grid_dim=128, min_cell=0.5)
    shared = np.asarray(ball_query(0.0, 0.5, 16, p, c, points_valid=v,
                                   impl="grid", structure=cs))
    np.testing.assert_array_equal(base, shared)


def test_ball_query_downsample_share_sort_same_set():
    """share_sort=True (one cell-sort reused by FPS anchors, the query,
    and the spatial-order compaction) must select the SAME point set as
    the independent-sorts path — only row order may differ."""
    import jax.numpy as jnp

    from recondet3d.data.pipelines.point_pipeline import (
        ball_query_downsample,
        fps_downsample,
    )

    rng = np.random.default_rng(4)
    pts = rng.uniform(-30, 30, (40000, 3)).astype(np.float32)
    valid = rng.random(40000) < 0.8
    p, v = jnp.asarray(pts), jnp.asarray(valid)

    p0, m0 = ball_query_downsample(p, v, anchor_points=1500, compact=True)
    p1, m1 = ball_query_downsample(p, v, anchor_points=1500, compact=True,
                                   grid_dim=128, share_sort=True)
    s0 = {tuple(r) for r in np.asarray(p0)[np.asarray(m0)].tolist()}
    s1 = {tuple(r) for r in np.asarray(p1)[np.asarray(m1)].tolist()}
    assert s0 == s1 and len(s0) > 0

    # the spatially-sorted output drives FPS with its sort skipped: the
    # XLA impl (CPU) is order-exact, so results must match the unsorted
    # call's SET at equal K
    q0, n0 = fps_downsample(p0, m0, num_points=1024)
    q1, n1 = fps_downsample(p1, m1, num_points=1024,
                            input_spatially_sorted=True)
    f0 = {tuple(r) for r in np.asarray(q0)[np.asarray(n0)].tolist()}
    f1 = {tuple(r) for r in np.asarray(q1)[np.asarray(n1)].tolist()}
    assert f0 == f1


def test_fps_pallas_presorted_same_set():
    """The Pallas kernel with a caller-provided presorted view must select
    the same SET as its internal-sort path (tie-break order may differ)."""
    import jax.numpy as jnp

    from recondet3d.ops.fps_pallas import furthest_point_sample_pallas

    rng = np.random.default_rng(5)
    pts = rng.uniform(-20, 20, (4096, 3)).astype(np.float32)
    valid = rng.random(4096) < 0.9
    p, v = jnp.asarray(pts), jnp.asarray(valid)

    i0 = furthest_point_sample_pallas(p, 128, v, interpret=True)
    pres = (p.astype(jnp.float32), v,
            jnp.arange(4096, dtype=jnp.int32))
    i1 = furthest_point_sample_pallas(p, 128, v, interpret=True,
                                      presorted=pres)
    s0 = {tuple(r) for r in pts[np.asarray(i0)].tolist()}
    s1 = {tuple(r) for r in pts[np.asarray(i1)].tolist()}
    assert s0 == s1
