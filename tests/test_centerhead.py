"""CenterHead: target drawing, loss, decode round-trip, and a tiny
overfit showing detection training works end to end on BEV features."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from recondet3d.models.detect.centerhead import CenterHead, draw_heatmap, gaussian_radius

SMALL = dict(
    in_channels=16,
    point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
    voxel_size=(0.1, 0.1, 0.1),
    out_size_factor=8,  # grid 160/8 = 20
    tasks=(("car",), ("pedestrian",)),
    max_objs=8,
)
CLASSES = ("car", "pedestrian")


def _boxes():
    # one car at (2, -1), one pedestrian at (-3, 4)
    gt = np.zeros((1, 8, 9), np.float32)
    gt[0, 0] = [2.0, -1.0, -0.5, 2.0, 4.0, 1.5, 0.3, 1.0, 0.0]
    gt[0, 1] = [-3.0, 4.0, -0.5, 0.6, 0.6, 1.7, 0.0, 0.0, 0.0]
    labels = np.full((1, 8), -1, np.int64)
    labels[0, 0] = 0
    labels[0, 1] = 1
    valid = labels >= 0
    return jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(valid)


def test_draw_heatmap_peak():
    c = jnp.asarray([[5.0, 7.0]])
    hm = draw_heatmap(c, jnp.asarray([2.0]), jnp.asarray([True]), (20, 20))
    assert float(hm[7, 5]) == pytest.approx(1.0, abs=1e-5)
    assert float(hm[0, 0]) < 0.01
    assert float(gaussian_radius(jnp.asarray([[10.0, 10.0]]))[0]) > 0


def test_targets_and_loss_shapes():
    head = CenterHead(**SMALL)
    gt, labels, valid = _boxes()
    targets = head.get_targets(gt, labels, valid, CLASSES)
    assert len(targets) == 2
    assert targets[0]["heatmap"].shape == (1, 20, 20, 1)
    # car heatmap peaks at its feature cell
    hm = np.asarray(targets[0]["heatmap"])[0, :, :, 0]
    iy, ix = np.unravel_index(hm.argmax(), hm.shape)
    assert (ix, iy) == (12, 8)  # (2-(-8))/0.8 = 12.5 -> 12 ; (-1+8)/0.8 = 8.75 -> 8

    x = jnp.zeros((1, 20, 20, 16))
    params = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(params, x)
    losses = head.loss(preds, targets)
    assert all(np.isfinite(float(v)) for v in losses.values())


@pytest.mark.slow
def test_overfit_and_decode():
    head = CenterHead(**SMALL)
    gt, labels, valid = _boxes()
    targets = head.get_targets(gt, labels, valid, CLASSES)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 20, 20, 16)).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x, train=True)
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            preds, mut = head.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            losses = head.loss(preds, targets)
            return sum(losses.values()), mut["batch_stats"]

        (l, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, new_opt = opt.update(g, opt_state)
        return optax.apply_updates(params, up), new_stats, new_opt, l

    l0 = None
    for i in range(150):
        params, stats, opt_state, l = step(params, stats, opt_state)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0 * 0.5

    preds = head.apply({"params": params, "batch_stats": stats}, x)
    res = head.decode(preds, max_per_task=16, score_threshold=0.3)[0]
    assert len(res["boxes_3d"]) >= 2
    names = head.task_class_names()
    # best car-labeled box lands near the GT car
    car = res["boxes_3d"][res["labels_3d"] == names.index("car")]
    assert len(car) >= 1
    d = np.linalg.norm(car[:, :2] - np.array([2.0, -1.0]), axis=1).min()
    assert d < 1.0


def test_decode_label_remap_subset_tasks():
    """A head whose tasks cover a SUBSET of the dataset classes must remap
    decode labels into the dataset's index space (class_names arg) —
    without it, pedestrian (flat-task label 1) scores as the dataset's
    class 1 ("truck") and its AP is structurally zero. Regression for the
    full-loop fixture's ped/cone classes."""
    nusc_classes = (
        "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
        "motorcycle", "bicycle", "pedestrian", "traffic_cone",
    )
    head = CenterHead(
        in_channels=16,
        point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
        voxel_size=(0.1, 0.1, 0.1),
        out_size_factor=8,
        tasks=(("car",), ("pedestrian", "traffic_cone")),
        max_objs=8,
    )

    def fabricate(n_cls, peaks):
        # logits: one +6 peak per (iy, ix, ci), everything else -6
        hm = np.full((1, 20, 20, n_cls), -6.0, np.float32)
        for iy, ix, ci in peaks:
            hm[0, iy, ix, ci] = 6.0
        z = lambda c: jnp.zeros((1, 20, 20, c), jnp.float32)
        return dict(heatmap=jnp.asarray(hm), reg=z(2), height=z(1),
                    dim=z(3), rot=z(2), vel=z(2))

    preds = [fabricate(1, [(8, 12, 0)]),            # car
             fabricate(2, [(4, 4, 0), (15, 3, 1)])]  # pedestrian, cone

    res = head.decode(preds, max_per_task=8, score_threshold=0.5,
                      class_names=nusc_classes)[0]
    got = sorted(int(l) for l in res["labels_3d"])
    assert got == [0, 8, 9], got  # car, pedestrian, traffic_cone

    # without class_names: the reference's flat-task convention
    res_flat = head.decode(preds, max_per_task=8, score_threshold=0.5)[0]
    assert sorted(int(l) for l in res_flat["labels_3d"]) == [0, 1, 2]
