"""End-to-end ResDet3D test: synthetic 2-camera rig -> DA3-small depth ->
unprojection -> pipeline -> refinement loss; plus point pipeline units
and loss units."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recondet3d.data.pipelines.point_pipeline import (
    ball_query_downsample,
    filter_point_by_range,
    fps_downsample,
    voxel_downsample,
    voxel_pre_reduce,
)
from recondet3d.models.da3 import build_da3
from recondet3d.models.detect import ReconstructionBackbone, ResDet3D
from recondet3d.models.losses import ColorLoss, EMDLoss, SimpleL2Loss, SmoothnessLoss
from recondet3d.models.refine import SparseRefinement


def test_filter_point_by_range():
    pts = np.array([[0, 0, 0], [100, 0, 0], [1, 1, 1]], np.float32)
    valid = np.array([True, True, False])
    _, m = filter_point_by_range(jnp.asarray(pts), jnp.asarray(valid), (-5, -5, -5, 5, 5, 5))
    np.testing.assert_array_equal(np.asarray(m), [True, False, False])


def test_fps_downsample_passthrough_and_cap():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    valid = np.ones(100, bool)
    out, m = fps_downsample(jnp.asarray(pts), jnp.asarray(valid), num_points=32)
    assert out.shape == (32, 3) and bool(m.all())

    valid2 = np.arange(100) < 20  # fewer than cap -> passthrough compacted
    out2, m2 = fps_downsample(jnp.asarray(pts), jnp.asarray(valid2), num_points=32)
    assert int(np.asarray(m2).sum()) == 20
    np.testing.assert_allclose(np.asarray(out2)[:20], pts[:20])


def test_ball_query_downsample_density():
    rng = np.random.default_rng(1)
    # dense cluster + sparse far points
    cluster = rng.normal(scale=0.1, size=(200, 3)).astype(np.float32)
    sparse = rng.normal(scale=20.0, size=(50, 3)).astype(np.float32)
    pts = np.concatenate([cluster, sparse])
    valid = np.ones(250, bool)
    _, m = ball_query_downsample(
        jnp.asarray(pts), jnp.asarray(valid), anchor_points=32,
        max_radius=0.5, sample_num=8,
    )
    kept = int(np.asarray(m).sum())
    assert 32 <= kept < 250  # anchors kept, plus in-radius neighbors


def test_voxel_downsample_centroids():
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.1, 0.1], [5.1, 5.1, 0.1]], np.float32)
    valid = np.ones(3, bool)
    out, m = voxel_downsample(
        jnp.asarray(pts), jnp.asarray(valid), voxel_size=(1.0, 1.0, 1.0),
        point_cloud_range=(0, 0, 0, 10, 10, 10), max_voxels=8,
    )
    assert int(np.asarray(m).sum()) == 2
    np.testing.assert_allclose(np.asarray(out)[0], [0.2, 0.1, 0.1], atol=1e-6)


def test_voxel_pre_reduce_oracle():
    """Sort-based pre-reduction == numpy first-valid-point-per-voxel."""
    rng = np.random.default_rng(7)
    N = 5000
    pts = rng.uniform(-9, 9, (N, 4)).astype(np.float32)  # extra channel rides
    valid = rng.random(N) < 0.9
    pcr = (-8.0, -8.0, -8.0, 8.0, 8.0, 8.0)
    vs = 0.5
    cap = 4096

    out, m = voxel_pre_reduce(
        jnp.asarray(pts), jnp.asarray(valid),
        voxel_size=vs, point_cloud_range=pcr, max_out=cap,
    )
    out, m = np.asarray(out), np.asarray(m)
    assert out.shape == (cap, 4) and m.shape == (cap,)

    # numpy oracle: first valid point (input order) per occupied voxel,
    # ordered by flat voxel id
    grid = np.floor((np.array(pcr[3:]) - np.array(pcr[:3])) / vs + 1e-4).astype(int)
    c = np.floor((pts[:, :3] - np.array(pcr[:3], np.float32)) / vs).astype(int)
    ok = valid & np.all((c >= 0) & (c < grid), axis=1)
    ids = (c[:, 2] * grid[1] + c[:, 1]) * grid[0] + c[:, 0]
    first = {}
    for i in np.flatnonzero(ok):
        first.setdefault(ids[i], i)
    want = pts[[first[k] for k in sorted(first)]]

    n = len(want)
    assert int(m.sum()) == n
    assert bool(m[:n].all()) and not m[n:].any()
    np.testing.assert_array_equal(out[:n], want)

    # out-of-range rows were dropped (range filter is subsumed)
    assert np.all(np.abs(out[:n, :3]) <= 8.0)

    # cap smaller than the leader count: first cap leaders in id order
    small = 8
    out2, m2 = voxel_pre_reduce(
        jnp.asarray(pts), jnp.asarray(valid),
        voxel_size=vs, point_cloud_range=pcr, max_out=small,
    )
    np.testing.assert_array_equal(np.asarray(out2), want[:small])
    assert bool(np.asarray(m2).all())


def test_point_losses():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 80, 3)).astype(np.float32))
    assert float(EMDLoss(chunk_size=32)(a, b)) > 0
    assert float(SmoothnessLoss()(a, a)) == 0
    assert float(SimpleL2Loss()(a, a)) == 0
    assert float(ColorLoss(chunk_size=32)(a, b)) > 0
    # identical clouds -> tiny EMD
    assert float(EMDLoss(chunk_size=32)(a, a)) < 0.05


@pytest.mark.slow
def test_resdet3d_with_detection_head():
    """Full pipeline with a CenterHead: occupancy + detection losses."""
    from recondet3d.models.detect.centerhead import CenterHead

    da3 = build_da3("da3-small", dtype=jnp.float32, attn_impl="xla")
    refinement = SparseRefinement(
        point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
        voxel_size=(0.1, 0.1, 0.1), max_voxels=1024,
        occ_feature_shape=(20, 20, 8), occ_max_voxels=512,
        sparse_shape=(40, 160, 160), unet_channels=(32, 48, 64, 96),
        stage_caps=(1024, 512, 384, 256), encoder_out_channels=16,
    )
    backbone = ReconstructionBackbone(
        da3=da3, refinement=refinement, process_res=56,
        filter_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
        bq_anchor_points=128, num_points=256, max_depth=20.0,
    )
    head = CenterHead(
        in_channels=32,
        point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
        voxel_size=(0.1, 0.1, 0.1), out_size_factor=8,
        tasks=(("car",), ("pedestrian",)), max_objs=8,
    )
    model = ResDet3D(reconstruction_backbone=backbone, pts_bbox_head=head,
                     class_names=("car", "pedestrian"))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, 2, 56, 84, 3)).astype(np.float32)
    c2l = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 2, 4, 4)).copy()
    gt = rng.uniform(-7, 7, (1, 300, 3)).astype(np.float32)
    gt[..., 2] = rng.uniform(-1.8, 1.8, (1, 300))
    boxes = np.zeros((1, 8, 9), np.float32)
    boxes[0, 0] = [2, -1, -0.5, 2, 4, 1.5, 0.3, 1, 0]
    labels = np.full((1, 8), -1, np.int64)
    labels[0, 0] = 0

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(c2l),
        gt_points=jnp.asarray(gt), gt_bboxes_3d=jnp.asarray(boxes),
        gt_labels_3d=jnp.asarray(labels), return_loss=True,
    )
    losses, _ = model.apply(
        variables, jnp.asarray(img), jnp.asarray(c2l),
        gt_points=jnp.asarray(gt), gt_bboxes_3d=jnp.asarray(boxes),
        gt_labels_3d=jnp.asarray(labels), return_loss=True,
    )
    assert "reconstruction_loss_occupancy" in losses
    assert "task0_loss_heatmap" in losses and "task0_loss_bbox" in losses
    assert all(np.isfinite(float(v)) for v in losses.values())

    out = model.apply(variables, jnp.asarray(img), jnp.asarray(c2l))
    dets = head.decode(out["det_preds"], max_per_task=8, score_threshold=0.0)
    assert len(dets) == 1 and "boxes_3d" in dets[0]


@pytest.mark.slow
def test_resdet3d_end_to_end():
    """Tiny full pipeline: 2 cams at 56x84 -> ~96 pts/cam grid."""
    da3 = build_da3("da3-small", dtype=jnp.float32, attn_impl="xla")
    refinement = SparseRefinement(
        point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
        voxel_size=(0.1, 0.1, 0.1),
        max_voxels=2048,
        occ_feature_shape=(20, 20, 8),
        occ_max_voxels=512,
        sparse_shape=(40, 160, 160),
        unet_channels=(32, 48, 64, 96),
        stage_caps=(2048, 1024, 512, 256),
        encoder_out_channels=16,
    )
    backbone = ReconstructionBackbone(
        da3=da3,
        refinement=refinement,
        process_res=56,
        filter_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
        bq_anchor_points=256,
        num_points=512,
        max_depth=20.0,
    )
    model = ResDet3D(reconstruction_backbone=backbone)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, 2, 56, 84, 3)).astype(np.float32)
    c2l = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 2, 4, 4)).copy()
    gt = rng.uniform(-7, 7, (1, 300, 3)).astype(np.float32)
    gt[..., 2] = rng.uniform(-1.8, 1.8, (1, 300))

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(c2l),
        gt_points=jnp.asarray(gt), return_loss=True,
    )
    losses, outs = model.apply(
        variables, jnp.asarray(img), jnp.asarray(c2l),
        gt_points=jnp.asarray(gt), return_loss=True,
    )
    assert "reconstruction_loss_occupancy" in losses
    assert np.isfinite(float(losses["reconstruction_loss_occupancy"]))
    assert outs["pseudo_points"].shape == (1, 512, 3)

    # test path returns pseudo points
    test_out = model.apply(variables, jnp.asarray(img), jnp.asarray(c2l))
    assert test_out["pseudo_points"].shape == (1, 512, 3)


def test_resdet3d_use_color():
    """use_color path: pseudo points carry rgb, GT points get colorized via
    lidar2img (reference: reconstruction_backbone.py:229-283, 644-655)."""
    da3 = build_da3("da3-small", dtype=jnp.float32, attn_impl="xla")
    refinement = SparseRefinement(
        point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
        voxel_size=(0.1, 0.1, 0.1),
        max_voxels=2048,
        occ_feature_shape=(20, 20, 8),
        occ_max_voxels=512,
        sparse_shape=(40, 160, 160),
        unet_channels=(32, 48, 64, 96),
        stage_caps=(2048, 1024, 512, 256),
        encoder_out_channels=16,
        use_color=True,
    )
    backbone = ReconstructionBackbone(
        da3=da3,
        refinement=refinement,
        process_res=56,
        filter_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
        bq_anchor_points=256,
        num_points=512,
        max_depth=20.0,
    )
    model = ResDet3D(reconstruction_backbone=backbone)

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (1, 2, 56, 84, 3)).astype(np.float32)
    c2l = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 2, 4, 4)).copy()
    gt = rng.uniform(-7, 7, (1, 300, 3)).astype(np.float32)
    gt[..., 2] = rng.uniform(-1.8, 1.8, (1, 300))
    # simple pinhole lidar2img: z forward
    K = np.array([[40.0, 0, 42, 0], [0, 40.0, 28, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                 np.float32)
    l2i = np.broadcast_to(K, (1, 2, 4, 4)).copy()

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(c2l),
        gt_points=jnp.asarray(gt), lidar2img=jnp.asarray(l2i), return_loss=True,
    )
    losses, outs = model.apply(
        variables, jnp.asarray(img), jnp.asarray(c2l),
        gt_points=jnp.asarray(gt), lidar2img=jnp.asarray(l2i), return_loss=True,
    )
    assert np.isfinite(float(losses["reconstruction_loss_occupancy"]))
    # pseudo points are xyzrgb with colors in [0, 1]
    pts = np.asarray(outs["pseudo_points"])
    assert pts.shape == (1, 512, 6)
    msk = np.asarray(outs["pseudo_valid"])[0]
    assert pts[0][msk][:, 3:].min() >= 0.0 and pts[0][msk][:, 3:].max() <= 1.0


def test_colorize_gt_points_projection():
    """Points in front of the camera get the pixel color; behind get zeros."""
    backbone = ReconstructionBackbone(
        da3=build_da3("da3-small", dtype=jnp.float32, attn_impl="xla"),
        refinement=SparseRefinement(use_color=True),
    )
    H, W = 8, 12
    img = np.zeros((1, 1, H, W, 3), np.float32)
    img[0, 0, 4, 6] = [255.0, 128.0, 0.0]
    # identity projection with principal point at (6, 4), unit focal * z=1
    l2i = np.eye(4, dtype=np.float32)[None, None]
    l2i[0, 0, 0, 2] = 6.0
    l2i[0, 0, 1, 2] = 4.0
    gt = np.array([[[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]]], np.float32)
    out = backbone.colorize_gt_points(
        jnp.asarray(gt), jnp.asarray(np.ones((1, 2), bool)),
        jnp.asarray(img), jnp.asarray(l2i),
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out[0, 0, 3:], [1.0, 128 / 255.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1, 3:], [0.0, 0.0, 0.0])


def test_depth_override_anchors_point_pipeline():
    """The bench anchoring hook: depth_override replaces DA3's depth in
    the point pipeline (points land where the override says) while the
    DA3 forward stays live (intrinsics still predicted)."""
    da3 = build_da3("da3-small", dtype=jnp.float32, attn_impl="xla")
    backbone = ReconstructionBackbone(
        da3=da3, refinement=None, process_res=56,
        filter_range=(-30.0, -30.0, -5.0, 30.0, 30.0, 5.0),
        bq_anchor_points=64, num_points=128, max_depth=100.0,
    )
    model = ResDet3D(reconstruction_backbone=backbone)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (1, 2, 56, 84, 3)).astype(np.float32)
    c2l = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 2, 4, 4)).copy()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(c2l))

    base = model.apply(variables, jnp.asarray(img), jnp.asarray(c2l))
    from recondet3d.data.input_processor import compute_process_shape

    _, _, ph, pw = compute_process_shape(56, 84, 56)
    override = jnp.full((1, 2, ph, pw), 3.0, jnp.float32)
    out = model.apply(
        variables, jnp.asarray(img), jnp.asarray(c2l), depth_override=override
    )
    pts = np.asarray(out["pseudo_points"])
    valid = np.asarray(out["pseudo_valid"])[0]
    assert valid.any()
    # camera at origin looking +z (identity c2l, cam->lidar axis swap is in
    # the rig only in bench; here identity means z stays the depth axis)
    assert np.isfinite(pts[0][valid]).all()
    # the override moved the cloud: every valid point sits on the 3 m depth
    # plane (z in cam frame == z col under identity c2l)
    z = pts[0][valid][:, 2]
    np.testing.assert_allclose(z, 3.0, atol=1e-3)
    base_z = np.asarray(base["pseudo_points"])[0][np.asarray(base["pseudo_valid"])[0]][:, 2]
    assert not np.allclose(base_z, 3.0, atol=1e-3)  # random depth differs


def test_pipelined_step_matches_simple_test():
    """pipelined_test_step primed with scene t's own depth must reproduce
    simple_test exactly (same params, same consumed depth), and must
    return that depth as the next carry."""
    da3 = build_da3("da3-small", dtype=jnp.float32, attn_impl="xla")
    backbone = ReconstructionBackbone(
        da3=da3,
        refinement=SparseRefinement(
            max_voxels=512, occ_max_voxels=1024, stage_caps=(512, 384, 256, 192),
        ),
        process_res=56,
        filter_range=(-30.0, -30.0, -5.0, 30.0, 30.0, 5.0),
        bq_anchor_points=64, num_points=128,
    )
    model = ResDet3D(reconstruction_backbone=backbone)
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (1, 2, 56, 84, 3)).astype(np.float32)
    c2l = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 2, 4, 4)).copy()
    img_j, c2l_j = jnp.asarray(img), jnp.asarray(c2l)
    variables = model.init(jax.random.PRNGKey(0), img_j, c2l_j)

    base = model.apply(variables, img_j, c2l_j)
    depth, intr, _ = model.apply(
        variables, img_j,
        method=lambda m, i: m.reconstruction_backbone.predict_depth(i),
    )
    (depth2, intr2), out = model.apply(
        variables, depth, intr, img_j, img_j, c2l_j,
        method="pipelined_test_step"
    )
    np.testing.assert_array_equal(np.asarray(depth2), np.asarray(depth))
    np.testing.assert_array_equal(np.asarray(intr2), np.asarray(intr))
    np.testing.assert_array_equal(
        np.asarray(out["pseudo_points"]), np.asarray(base["pseudo_points"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["pseudo_valid"]), np.asarray(base["pseudo_valid"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["aux"]["occupancy_logits"]),
        np.asarray(base["aux"]["occupancy_logits"]),
    )
