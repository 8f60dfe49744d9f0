"""Config + registry + mesh tests."""

import os

import jax
import numpy as np
import pytest

from recondet3d.core import ConfigDict, Registry, load_config, merge_dicts
from recondet3d.parallel import data_sharding, make_mesh, shard_batch


def test_config_inherit(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nb:\n  c: 2\n  d: 3\n")
    (tmp_path / "child.yaml").write_text(
        "__inherit__: base.yaml\nb:\n  d: 9\ne: ${eval:2*3}\n"
    )
    cfg = load_config(str(tmp_path / "child.yaml"))
    assert cfg.a == 1
    assert cfg.b.c == 2
    assert cfg.b.d == 9
    assert cfg.e == 6


def test_registry_build():
    R = Registry("test")

    @R.register()
    class Foo:
        def __init__(self, x):
            self.x = x

    obj = R.build(dict(type="Foo", x=5))
    assert obj.x == 5
    with pytest.raises(KeyError):
        R.build(dict(type="Bar"))


def test_merge_dicts():
    out = merge_dicts({"a": {"b": 1, "c": 2}}, {"a": {"b": 5}})
    assert out == {"a": {"b": 5, "c": 2}}


def test_yaml_model_registry():
    import jax.numpy as jnp

    from recondet3d.api.registry import build_from_yaml, get_all_models

    assert "da3-small" in get_all_models()
    model = build_from_yaml("da3-small")
    out = model.init_with_output(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 28, 28, 3))
    )[0]
    assert "depth" in out


def test_mesh_sharding():
    n = len(jax.devices())
    mesh = make_mesh()
    assert mesh.shape["data"] == n
    batch = {"x": np.ones((8, 4), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].shape == (8, 4)
    # check the array is actually distributed over the data axis
    assert len(sharded["x"].addressable_shards) == n
