"""Block-diagonal tiny-attention kernel: interpret-mode parity vs the XLA
reference (fwd + bwd, masked/unmasked, with attention-prob dropout)."""

import os
import subprocess
import sys

# the subprocess re-imports jax from scratch: point it at the suite's
# persistent compile cache (conftest.py) or every run recompiles cold
_CACHE_ENV = dict(
    os.environ,
    JAX_COMPILATION_CACHE_DIR=os.environ.get("X2VLM_JAX_CACHE",
                                             "/tmp/x2vlm_jax_cache"),
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
)

_TINY_TEST = r"""
import os
os.environ["X2VLM_FLASH_INTERPRET"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from x2vlm_tpu.ops.tiny_attention import (
    tiny_block_attention, _xla_reference, _krow, _hw_random_bits,
)

rng = np.random.default_rng(3)
for (B, S, Skv, H, D, with_mask) in [
    (4, 40, 40, 12, 64, False),    # pretrain text-tower shape
    (8, 40, 40, 12, 64, True),
    (2, 16, 16, 2, 8, True),       # tiny
    (6, 48, 48, 4, 32, True),      # other aligned sizes
    (4, 40, 197, 4, 32, True),     # fusion cross-attn (padded Skv 197->200)
    (2, 40, 197, 4, 32, False),    # cross, no caller mask (pad-only mask)
    (2, 10, 30, 2, 8, True),       # non-%8 Sq AND Skv (both padded)
    (2, 40, 197, 16, 64, True),    # large-model fusion cross: H=16 overflows
                                   # one block-diag scratch -> head-chunked
]:
    HD = H * D
    q = jnp.asarray(rng.standard_normal((B, S, HD)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Skv, HD)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Skv, HD)).astype(np.float32))
    km = None
    if with_mask:
        km_np = rng.random((B, Skv)) > 0.25
        km_np[:, 0] = True
        km = jnp.asarray(km_np)
    scale = D ** -0.5

    out = tiny_block_attention(q, k, v, num_heads=H, key_mask=km)
    ref = _xla_reference(q * scale, k, v,
                         None if km is None else _krow(km), None, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def loss_tiny(q_, k_, v_):
        o = tiny_block_attention(q_, k_, v_, num_heads=H, key_mask=km)
        return jnp.sum(o * o)

    def loss_ref(q_, k_, v_):
        o = _xla_reference(q_ * scale, k_, v_,
                           None if km is None else _krow(km), None, H)
        return jnp.sum(o * o)

    gt = jax.grad(loss_tiny, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gt, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"grad {name} B={B} S={S} H={H}")

# dropout path: same rng on kernel and reference must agree exactly
B, S, H, D = 4, 40, 4, 32
HD = H * D
q = jnp.asarray(rng.standard_normal((B, S, HD)).astype(np.float32))
k = jnp.asarray(rng.standard_normal((B, S, HD)).astype(np.float32))
v = jnp.asarray(rng.standard_normal((B, S, HD)).astype(np.float32))
key = jax.random.PRNGKey(0)
scale = D ** -0.5
# replicate the production mask (hardware-RNG bits, see tiny_block_attention)
bits = _hw_random_bits(key, (B, S, H * S))
threshold = jnp.uint32(round(0.1 * 4294967296.0))
dmask = jnp.where(bits >= threshold, jnp.bfloat16(1.0 / 0.9), jnp.bfloat16(0.0))
drop_frac = 1.0 - float(jnp.mean((bits >= threshold).astype(jnp.float32)))
assert abs(drop_frac - 0.1) < 0.02, f"drop fraction {drop_frac} far from rate"

out = tiny_block_attention(q, k, v, num_heads=H, dropout_rate=0.1,
                           dropout_rng=key, deterministic=False)
ref = _xla_reference(q * scale, k, v, None, dmask, H)
np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                           rtol=2e-3, atol=2e-3)

def loss_tiny_d(q_, k_, v_):
    o = tiny_block_attention(q_, k_, v_, num_heads=H, dropout_rate=0.1,
                             dropout_rng=key, deterministic=False)
    return jnp.sum(o * o)

def loss_ref_d(q_, k_, v_):
    o = _xla_reference(q_ * scale, k_, v_, None, dmask, H)
    return jnp.sum(o * o)

gt = jax.grad(loss_tiny_d, argnums=(0, 1, 2))(q, k, v)
gr = jax.grad(loss_ref_d, argnums=(0, 1, 2))(q, k, v)
for name, a, b in zip("qkv", gt, gr):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-2, atol=1e-2,
                               err_msg=f"dropout grad {name}")
print("TINY_OK")
"""


def test_head_chunking():
    """Wide-head towers split into the largest head groups whose scratch
    fits VMEM; narrow towers stay single-call."""
    from x2vlm_tpu.ops.tiny_attention import _pick_head_chunk, tiny_supported

    # base fusion cross (H=12, D=64, Skv=200): one block fits
    assert _pick_head_chunk(128, 40, 200, 12, 64, True, False) == 12
    # large fusion cross (H=16, D=64, Skv=200): 16-head scratch = 13.1 MB
    # > budget -> two 8-head calls
    assert _pick_head_chunk(64, 40, 200, 16, 64, True, False) == 8
    assert tiny_supported(64, 40, 197, 16, 64, has_mask=True)
    # lane-width floor: H*D < 256 is never supported (Mosaic miscompile)
    assert _pick_head_chunk(8, 40, 40, 2, 64, False, False) == 0


def test_tiny_attention_interpret_mode():
    res = subprocess.run(
        [sys.executable, "-c", _TINY_TEST],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
        env=_CACHE_ENV,
    )
    assert res.returncode == 0, res.stderr
    assert "TINY_OK" in res.stdout
