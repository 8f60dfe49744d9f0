"""Sparse conv golden tests: compare against dense 3D convolution on the
densified grid (the defining property of SECOND-style spconv —
submanifold conv equals dense conv masked to the input active set;
strided sparse conv equals dense conv at the derived active outputs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recondet3d.ops.sparse_conv import (
    SparseTensor,
    build_neighbor_map,
    sparse_conv_downsample,
    sparse_tensor_from_voxels,
    subm_conv_apply,
    to_dense_bev,
)


def _random_sparse(rng, B, grid, n_active, C, cap):
    Z, Y, X = grid
    coords = set()
    while len(coords) < n_active:
        coords.add(
            (rng.integers(B), rng.integers(Z), rng.integers(Y), rng.integers(X))
        )
    coords = np.array(sorted(coords), np.int32)
    rng.shuffle(coords)
    feats = rng.normal(size=(len(coords), C)).astype(np.float32)
    # pad to capacity
    pad = cap - len(coords)
    coords_p = np.concatenate([coords, np.full((pad, 4), -1, np.int32)])
    feats_p = np.concatenate([feats, np.zeros((pad, C), np.float32)])
    return SparseTensor(jnp.asarray(feats_p), jnp.asarray(coords_p), grid, B), coords, feats


def _dense(st_coords, st_feats, B, grid, C):
    Z, Y, X = grid
    d = np.zeros((B, Z, Y, X, C), np.float32)
    for (b, z, y, x), f in zip(st_coords, st_feats):
        d[b, z, y, x] = f
    return d


def _dense_conv3d(dense, weight, stride, padding):
    """numpy correlation: out(o) = sum_k in(o*s + k - pad) W[k]."""
    B, Z, Y, X, Cin = dense.shape
    K3, _, Cout = weight.shape
    k = round(K3 ** (1 / 3))
    ks = (k, k, k) if k ** 3 == K3 else None
    assert ks is not None
    sz, sy, sx = stride
    pz, py, px = padding
    oZ = (Z + 2 * pz - ks[0]) // sz + 1
    oY = (Y + 2 * py - ks[1]) // sy + 1
    oX = (X + 2 * px - ks[2]) // sx + 1
    padded = np.pad(dense, ((0, 0), (pz, pz), (py, py), (px, px), (0, 0)))
    out = np.zeros((B, oZ, oY, oX, Cout), np.float32)
    w = weight.reshape(ks[0], ks[1], ks[2], Cin, Cout)
    for dz in range(ks[0]):
        for dy in range(ks[1]):
            for dx in range(ks[2]):
                sub = padded[:, dz : dz + oZ * sz : sz, dy : dy + oY * sy : sy,
                             dx : dx + oX * sx : sx]
                out += sub @ w[dz, dy, dx]
    return out


def test_subm_conv_matches_dense():
    rng = np.random.default_rng(0)
    grid = (6, 10, 10)
    st, coords, feats = _random_sparse(rng, 2, grid, 80, 8, 128)
    W = rng.normal(size=(27, 8, 16)).astype(np.float32) * 0.1
    b = rng.normal(size=(16,)).astype(np.float32)

    nbr = build_neighbor_map(st, 3)
    out = np.asarray(subm_conv_apply(st.features, nbr, jnp.asarray(W), jnp.asarray(b)))

    dense = _dense(coords, feats, 2, grid, 8)
    dense_out = _dense_conv3d(dense, W, (1, 1, 1), (1, 1, 1)) + b
    for i, (bb, z, y, x) in enumerate(coords):
        np.testing.assert_allclose(out[i], dense_out[bb, z, y, x], rtol=2e-4, atol=2e-5)


def test_strided_conv_matches_dense():
    rng = np.random.default_rng(1)
    grid = (7, 12, 12)
    st, coords, feats = _random_sparse(rng, 2, grid, 60, 4, 96)
    W = rng.normal(size=(27, 4, 8)).astype(np.float32) * 0.1

    out_st = sparse_conv_downsample(
        st, jnp.asarray(W), None, kernel=3, stride=2, padding=1, max_out=256
    )
    dense = _dense(coords, feats, 2, grid, 4)
    dense_out = _dense_conv3d(dense, W, (2, 2, 2), (1, 1, 1))

    oc = np.asarray(out_st.coords)
    of = np.asarray(out_st.features)
    valid = oc[:, 0] >= 0
    assert valid.sum() > 0
    # every derived active output matches the dense conv there
    for i in np.where(valid)[0]:
        b, z, y, x = oc[i]
        np.testing.assert_allclose(of[i], dense_out[b, z, y, x], rtol=2e-4, atol=2e-5)
    # and every nonzero dense output whose window touched an input is present
    active_set = {tuple(c) for c in oc[valid]}
    nz = np.argwhere(np.abs(dense_out).sum(-1) > 1e-3)
    for b, z, y, x in nz:
        assert (b, z, y, x) in active_set


def test_asymmetric_kernel_stride():
    # the SparseEncoder conv_out: kernel (3,1,1), stride (2,1,1), padding 0
    rng = np.random.default_rng(2)
    grid = (6, 8, 8)
    st, coords, feats = _random_sparse(rng, 1, grid, 40, 4, 64)
    W = rng.normal(size=(3, 4, 8)).astype(np.float32) * 0.1
    out_st = sparse_conv_downsample(
        st, jnp.asarray(W), None, kernel=(3, 1, 1), stride=(2, 1, 1),
        padding=(0, 0, 0), max_out=128,
    )
    assert out_st.grid == (2, 8, 8)

    dense = _dense(coords, feats, 1, grid, 4)
    # numpy ref with asymmetric kernel
    padded = dense
    out = np.zeros((1, 2, 8, 8, 8), np.float32)
    for dz in range(3):
        sub = padded[:, dz : dz + 2 * 2 : 2]
        out += sub @ W[dz]
    oc = np.asarray(out_st.coords)
    of = np.asarray(out_st.features)
    for i in np.where(oc[:, 0] >= 0)[0]:
        b, z, y, x = oc[i]
        np.testing.assert_allclose(of[i], out[b, z, y, x], rtol=2e-4, atol=2e-5)


def test_to_dense_bev_layout():
    coords = np.array([[0, 1, 2, 3], [1, 0, 1, 1], [-1, -1, -1, -1]], np.int32)
    feats = np.array([[1.0, 2.0], [3.0, 4.0], [9.0, 9.0]], np.float32)
    st = sparse_tensor_from_voxels(jnp.asarray(feats), jnp.asarray(coords), (2, 4, 4), 2)
    bev = np.asarray(to_dense_bev(st))
    assert bev.shape == (2, 4, 4, 4)  # (B, Y, X, C*Z) with C=2, Z=2
    # channel index = c*Z + z (torch view(N, C*D, H, W) ordering)
    assert bev[0, 2, 3, 0 * 2 + 1] == 1.0
    assert bev[0, 2, 3, 1 * 2 + 1] == 2.0
    assert bev[1, 1, 1, 0] == 3.0
    assert bev[1, 1, 1, 2] == 4.0
    assert np.abs(bev).sum() == 10.0  # padding row dropped


def test_custom_vjp_matches_autodiff():
    """The gather-form custom backward of subm/downsample convs must equal
    plain autodiff through the gather-GEMM (which XLA transposes into a
    scatter-add)."""
    import numpy as np

    from recondet3d.ops.sparse_conv import (
        _downsample_gather_map,
        _gather_gemm,
        sparse_conv_downsample,
        subm_conv_apply,
    )

    rng = np.random.default_rng(0)
    grid = (8, 20, 20)
    cap = 512
    zyx = np.unique(
        np.stack([rng.integers(0, g, 400) for g in grid], 1), axis=0
    )
    n = zyx.shape[0]
    coords = np.full((cap, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1:] = zyx
    coords = jnp.asarray(coords)
    feats = jnp.asarray(rng.normal(size=(cap, 8)).astype(np.float32))
    feats = jnp.where((coords[:, 0] >= 0)[:, None], feats, 0)
    st = SparseTensor(feats, coords, grid, 1)
    nbr = build_neighbor_map(st, 3)
    w = jnp.asarray(rng.normal(size=(27, 8, 12)).astype(np.float32))

    def loss_custom(f, w):
        out = subm_conv_apply(f, nbr, w)
        return jnp.sum(jnp.sin(jnp.where((coords[:, 0] >= 0)[:, None], out, 0)))

    def loss_ref(f, w):
        out = _gather_gemm(f, nbr, w)
        return jnp.sum(jnp.sin(jnp.where((coords[:, 0] >= 0)[:, None], out, 0)))

    gc = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(gc[0], gr[0], atol=1e-4)
    np.testing.assert_allclose(gc[1], gr[1], atol=1e-4)

    w2 = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))

    def loss_down(f, w2):
        out = sparse_conv_downsample(
            SparseTensor(f, coords, grid, 1), w2, None, kernel=3, stride=2,
            padding=1, max_out=256,
        )
        return jnp.sum(jnp.cos(out.features))

    def loss_down_ref(f, w2):
        oc, rows, _, _ = _downsample_gather_map(
            coords, grid=grid, batch_size=1, kernel=(3, 3, 3),
            stride=(2, 2, 2), padding=(1, 1, 1), max_out=256,
        )
        out = _gather_gemm(f, rows, w2)
        return jnp.sum(jnp.cos(jnp.where((oc[:, 0] >= 0)[:, None], out, 0)))

    gc = jax.grad(loss_down, argnums=(0, 1))(feats, w2)
    gr = jax.grad(loss_down_ref, argnums=(0, 1))(feats, w2)
    np.testing.assert_allclose(gc[0], gr[0], atol=1e-4)
    np.testing.assert_allclose(gc[1], gr[1], atol=1e-4)


def test_pair_form_equals_full_form():
    """The half-gather + mirror-scatter formulation is the SAME conv as the
    full 27-gather (exactness of the symmetry argument), forward and grad."""
    import numpy as np

    rng = np.random.default_rng(3)
    grid = (6, 16, 16)
    cap = 384
    zyx = np.unique(
        np.stack([rng.integers(0, g, 300) for g in grid], 1), axis=0
    )
    n = zyx.shape[0]
    coords = np.full((cap, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1:] = zyx
    coords = jnp.asarray(coords)
    feats = jnp.asarray(rng.normal(size=(cap, 8)).astype(np.float32))
    feats = jnp.where((coords[:, 0] >= 0)[:, None], feats, 0)
    st = SparseTensor(feats, coords, grid, 1)
    nbr = build_neighbor_map(st, 3)
    w = jnp.asarray(rng.normal(size=(27, 8, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))

    o_pair = subm_conv_apply(feats, nbr, w, b, form="pair")
    o_full = subm_conv_apply(feats, nbr, w, b, form="full")
    np.testing.assert_allclose(np.asarray(o_pair), np.asarray(o_full),
                               atol=2e-5, rtol=1e-5)

    def loss(form):
        def f(fe, we):
            out = subm_conv_apply(fe, nbr, we, form=form)
            return jnp.sum(jnp.cos(jnp.where((coords[:, 0] >= 0)[:, None], out, 0)))
        return f

    gp = jax.grad(loss("pair"), argnums=(0, 1))(feats, w)
    gf = jax.grad(loss("full"), argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gf[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gf[1]), atol=2e-5)


def test_column_lookup_matches_dense():
    """order="col" neighbor maps (bit-packed per-column occupancy +
    popcount ranking) must equal the dense-table maps after sorting the
    active set by (b, y, x, z); exercised across the two-word mask split
    (Z > 32), batch > 1, and invalid padding rows."""
    from recondet3d.ops.sparse_conv import sort_by_column

    rng = np.random.default_rng(7)
    for grid, B, n_act, cap in [
        ((41, 24, 24), 2, 300, 384),  # Z > 32: lo+hi words
        ((6, 16, 16), 1, 120, 160),
        ((33, 8, 8), 3, 200, 256),  # z == 32 boundary reachable
    ]:
        st, _, _ = _random_sparse(rng, B, grid, n_act, 4, cap)
        st = sort_by_column(st)
        ref = build_neighbor_map(st, 3, order="any")
        col = build_neighbor_map(st, 3, order="col")
        np.testing.assert_array_equal(np.asarray(col), np.asarray(ref))


def test_downsample_output_column_sorted():
    """The ranked downsample output must be sorted by (b, y, x, z) with
    invalid rows last — the precondition the next stage's order="col"
    map build relies on."""
    rng = np.random.default_rng(8)
    grid = (9, 14, 14)
    st, _, _ = _random_sparse(rng, 2, grid, 150, 4, 192)
    W = jnp.asarray(rng.normal(size=(27, 4, 8)).astype(np.float32) * 0.1)
    out = sparse_conv_downsample(
        st, W, None, kernel=3, stride=2, padding=1, max_out=256
    )
    oc = np.asarray(out.coords)
    valid = oc[:, 0] >= 0
    assert valid.sum() > 0
    # invalid rows strictly after valid rows
    assert not valid[np.argmin(valid):].any() or valid.all()
    oz, oy, ox = grid[0] // 2 + 1, grid[1] // 2 + 1, grid[2] // 2 + 1
    keys = ((oc[valid, 0] * oy + oc[valid, 2]) * ox + oc[valid, 3]) * oz + oc[
        valid, 1
    ]
    assert (np.diff(keys) > 0).all()


def test_downsample_col_ranking_matches_generic():
    """order="col" downsample maps (column-parallel bit-mask ranking:
    pair-compressed masks, residue-plane OR scatter, popcount ranks)
    must produce byte-identical outputs to the generic occupancy-cumsum
    ranking on (b, y, x, z)-sorted inputs — across z-word splits
    (Z > 32), batch > 1, both paddings, the (3,1,1)/(2,1,1) conv_out
    geometry, and cap overflow."""
    from recondet3d.ops.sparse_conv import sort_by_column

    rng = np.random.default_rng(11)
    cases = [
        # grid, B, n_act, cap, kernel, stride, padding, max_out
        ((41, 24, 24), 2, 400, 512, (3, 3, 3), (2, 2, 2), (1, 1, 1), 512),
        ((9, 14, 14), 1, 150, 192, (3, 3, 3), (2, 2, 2), (1, 1, 1), 256),
        ((11, 12, 12), 2, 200, 256, (3, 3, 3), (2, 2, 2), (0, 1, 1), 256),
        ((5, 10, 10), 1, 100, 128, (3, 1, 1), (2, 1, 1), (0, 0, 0), 128),
        ((33, 8, 8), 3, 220, 256, (3, 3, 3), (2, 2, 2), (1, 1, 1), 64),  # overflow
    ]
    for grid, B, n_act, cap, k, s, p, mo in cases:
        st, _, _ = _random_sparse(rng, B, grid, n_act, 4, cap)
        st = sort_by_column(st)
        W = jnp.asarray(
            rng.normal(size=(int(np.prod(k)), 4, 8)).astype(np.float32) * 0.1
        )
        ref = sparse_conv_downsample(
            st, W, None, kernel=k, stride=s, padding=p, max_out=mo,
            order="any",
        )
        col = sparse_conv_downsample(
            st, W, None, kernel=k, stride=s, padding=p, max_out=mo,
            order="col",
        )
        np.testing.assert_array_equal(np.asarray(col.coords),
                                      np.asarray(ref.coords))
        np.testing.assert_allclose(np.asarray(col.features),
                                   np.asarray(ref.features), atol=1e-5)


def test_downsample_col_grad_matches_generic():
    """The col ranking feeds the same gather/bwd maps, so gradients must
    match the generic path exactly."""
    from recondet3d.ops.sparse_conv import sort_by_column

    rng = np.random.default_rng(12)
    grid = (9, 14, 14)
    st, _, _ = _random_sparse(rng, 2, grid, 150, 4, 192)
    st = sort_by_column(st)
    W = jnp.asarray(rng.normal(size=(27, 4, 8)).astype(np.float32) * 0.1)

    def loss(order):
        def f(feats, w):
            out = sparse_conv_downsample(
                SparseTensor(feats, st.coords, st.grid, st.batch_size),
                w, None, kernel=3, stride=2, padding=1, max_out=256,
                order=order,
            )
            return jnp.sum(out.features ** 2)
        return f

    gc = jax.grad(loss("col"), argnums=(0, 1))(st.features, W)
    ga = jax.grad(loss("any"), argnums=(0, 1))(st.features, W)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(ga[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(ga[1]), atol=2e-5)
