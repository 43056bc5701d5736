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


def test_gelu_exact_matches_erf_gelu():
    """gelu_exact is a tanh-form minimax fit of the erf GELU (fast on TPU's
    hardware tanh); it must stay numerically the erf GELU: ≤2e-6 absolute in
    f32 and bit-identical after bf16 rounding for ≥99.5% of all bf16 inputs."""
    from x2vlm_tpu.ops.layers import gelu_exact

    x = jnp.asarray(np.linspace(-12.0, 12.0, 200001), jnp.float32)
    ref = jax.nn.gelu(x, approximate=False)
    assert float(jnp.max(jnp.abs(gelu_exact(x) - ref))) < 2e-6

    bits = np.arange(0, 1 << 16, dtype=np.uint16)
    xb = bits.view(jnp.bfloat16.dtype)
    xb = xb[np.isfinite(xb.astype(np.float32))]
    a16 = gelu_exact(jnp.asarray(xb)).astype(jnp.bfloat16)
    e16 = jax.nn.gelu(jnp.asarray(xb, jnp.float32),
                      approximate=False).astype(jnp.bfloat16)
    same = np.asarray(a16).view(np.uint16) == np.asarray(e16).view(np.uint16)
    assert same.mean() > 0.995
    # the non-identical inputs are all tail values with tiny outputs
    diff = np.abs(np.asarray(e16, np.float32)[~same])
    if diff.size:
        assert diff.max() <= 3e-4
