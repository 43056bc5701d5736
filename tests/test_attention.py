import os
import subprocess
import sys

# point kernel-test subprocesses at the suite's persistent compile cache
# (conftest.py) — a fresh process otherwise recompiles everything cold
_CACHE_ENV = dict(
    os.environ,
    JAX_COMPILATION_CACHE_DIR=os.environ.get("X2VLM_JAX_CACHE",
                                             "/tmp/x2vlm_jax_cache"),
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2vlm_tpu.ops.attention import dot_product_attention, make_attention_mask


def _reference_attention(q, k, v, bias=None, key_mask=None, causal=False, scale=None):
    """Straightforward numpy reference (bhsd layout)."""
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    scale = scale or D ** -0.5
    logits = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64) * scale
    if bias is not None:
        logits = logits + bias
    if key_mask is not None:
        logits = np.where(key_mask[:, None, None, :].astype(bool), logits, -1e30)
    if causal:
        tri = np.tril(np.ones((Sq, Skv), bool), k=Skv - Sq)
        logits = np.where(tri[None, None], logits, -1e30)
    logits -= logits.max(axis=-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_xla_attention_matches_reference(rng, causal, with_bias, with_mask):
    B, Sq, Skv, H, D = 2, 12, 12, 3, 8
    q = rng.standard_normal((B, H, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Skv, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Skv, D)).astype(np.float32)
    bias = rng.standard_normal((1, H, Sq, Skv)).astype(np.float32) if with_bias else None
    key_mask = (rng.random((B, Skv)) > 0.3) if with_mask else None
    if key_mask is not None:
        key_mask[:, 0] = True  # keep at least one valid key

    out = dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        bias=None if bias is None else jnp.asarray(bias),
        key_mask=None if key_mask is None else jnp.asarray(key_mask),
        causal=causal, impl="xla",
    )
    ref = _reference_attention(q, k, v, bias=bias, key_mask=key_mask, causal=causal)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_cross_attention_different_lengths(rng):
    q = jnp.asarray(rng.standard_normal((2, 4, 5, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 4, 37, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 4, 37, 16)).astype(np.float32))
    out = dot_product_attention(q, k, v, impl="xla")
    assert out.shape == (2, 4, 5, 16)


def test_make_attention_mask_causal_cache_offset():
    # Decoding with a KV cache: q_len=2, kv_len=5; last query sees everything.
    m = make_attention_mask(None, 2, causal=True)
    assert m.shape == (1, 1, 2, 2)
    key_mask = jnp.ones((1, 5), bool)
    m = make_attention_mask(key_mask, 2, causal=True)
    np.testing.assert_array_equal(
        np.asarray(m[0, 0]),
        np.array([[1, 1, 1, 1, 0], [1, 1, 1, 1, 1]], bool),
    )


_FLASH_TEST = r"""
import os
os.environ["X2VLM_FLASH_INTERPRET"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from x2vlm_tpu.ops.flash_attention import flash_attention, _xla_attention

rng = np.random.default_rng(1)
B, H, D = 2, 2, 16
for (Sq, Skv, causal, with_bias, with_mask) in [
    (256, 256, False, False, False),
    (256, 256, False, True, True),
    (100, 300, False, False, True),   # unaligned + cross lengths
    (256, 256, True, False, False),   # causal
    (130, 130, True, True, False),    # causal + bias, unaligned
    (128, 1200, False, False, True),  # Skv > 1024 -> 512-tiles: multi-KV-block
                                      # key-mask path (_add_krow, dynamic kv_start)
    (256, 256, False, "batch", True), # batch-varying (B,H,Sq,Skv) bias
]:
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)).astype(np.float32))
    Bb = B if with_bias == "batch" else 1
    bias = jnp.asarray(rng.standard_normal((Bb, H, Sq, Skv)).astype(np.float32)) if with_bias else None
    km = jnp.asarray(rng.random((B, Skv)) > 0.2) if with_mask else None
    if km is not None:
        km = km.at[:, 0].set(True)
    out = flash_attention(q, k, v, bias=bias, key_mask=km, causal=causal)
    ref = _xla_attention(q, k, v, bias, km, causal, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    # gradient parity: pallas backward kernels vs XLA autodiff
    import jax
    def loss_flash(q_, k_, v_, b_):
        o = flash_attention(q_, k_, v_, bias=b_, key_mask=km, causal=causal)
        return jnp.sum(o * o)
    def loss_xla(q_, k_, v_, b_):
        o = _xla_attention(q_, k_, v_, b_, km, causal, D ** -0.5)
        return jnp.sum(o * o)
    if bias is not None:
        gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    else:
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v, None)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v, None)
    for name, a, b in zip("qkvb", gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"grad {name} Sq={Sq} Skv={Skv} causal={causal} bias={with_bias}")
print("FLASH_OK")
"""


def test_flash_kernel_interpret_mode():
    """Run the Pallas kernel in interpreter mode in a subprocess (the env flag
    must be set before module import)."""
    res = subprocess.run(
        [sys.executable, "-c", _FLASH_TEST],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
        env=_CACHE_ENV,
    )
    assert res.returncode == 0, res.stderr
    assert "FLASH_OK" in res.stdout
