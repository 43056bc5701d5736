import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2vlm_tpu.core import config as cfg
from x2vlm_tpu.core import mesh as meshlib


def test_parse_overrides_types():
    ov = cfg.parse_overrides("lr:1e-4;flag:true;name:bert;images.batch_size:64")
    assert ov["lr"] == pytest.approx(1e-4)
    assert ov["flag"] is True
    assert ov["name"] == "bert"
    assert ov["images.batch_size"] == 64


def test_apply_overrides_nested():
    base = {"images": {"batch_size": 128, "num_workers": 4}, "lr": 1e-4}
    out = cfg.apply_overrides(base, {"images.batch_size": 32, "new.deep.key": 7})
    assert out.images.batch_size == 32
    assert out.images.num_workers == 4
    assert out.new.deep.key == 7
    assert base["images"]["batch_size"] == 128  # original untouched


def test_config_attr_access():
    c = cfg.Config({"a": {"b": 1}})
    assert c.a.b == 1
    assert c.get("missing", 3) == 3


def test_mesh_shapes():
    m = meshlib.create_mesh()
    assert m.devices.size == 8
    assert m.axis_names == ("data", "fsdp")
    m2 = meshlib.create_mesh(fsdp=2)
    assert m2.devices.shape == (4, 2)


def test_shard_batch_over_full_mesh():
    m = meshlib.create_mesh(fsdp=2)
    with meshlib.global_mesh(m):
        batch = {"x": np.ones((16, 5), np.float32), "y": np.zeros((16,), np.int32)}
        sharded = meshlib.shard_batch(batch)
        # each of the 8 devices holds 2 rows
        shard_shapes = {s.data.shape for s in sharded["x"].addressable_shards}
        assert shard_shapes == {(2, 5)}


def test_psum_over_data_axis():
    m = meshlib.create_mesh()
    with meshlib.global_mesh(m):
        x = meshlib.shard_batch(np.arange(8, dtype=np.float32))

        @jax.jit
        def total(v):
            return jnp.sum(v)

        assert float(total(x)) == 28.0
