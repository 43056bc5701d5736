"""Fused int8 matmul kernel: interpret-mode parity vs the XLA pipeline, and
QDense-through-kernel encoder parity."""

import os
import subprocess
import sys

# share the suite's persistent compile cache with the subprocess (conftest.py)
_CACHE_ENV = dict(
    os.environ,
    JAX_COMPILATION_CACHE_DIR=os.environ.get("X2VLM_JAX_CACHE",
                                             "/tmp/x2vlm_jax_cache"),
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
)

_INT8_TEST = r"""
import os
os.environ["X2VLM_FLASH_INTERPRET"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from x2vlm_tpu.ops.int8_matmul import int8_matmul, int8_matmul_xla, quantize_weight

rng = np.random.default_rng(0)
for (M, K, N, act, with_bias) in [
    (200, 768, 768, None, True),      # projection shape (unaligned M)
    (256, 768, 3072, "gelu_fast", True),   # fc1 + fused tanh GELU
    (64, 3072, 768, None, False),     # fc2
    (128, 768, 768, "gelu", True),    # erf epilogue
]:
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.02)
    b = jnp.asarray(rng.standard_normal((N,)).astype(np.float32) * 0.1) \
        if with_bias else None
    wq, sw = quantize_weight(w)
    out = int8_matmul(x, wq, sw, b, act=act)
    ref = int8_matmul_xla(x, wq, sw, b, act=act)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2, err_msg=f"M={M} K={K} N={N} act={act}")

# 3-D input (B, S, C) path
x3 = jnp.asarray(rng.standard_normal((4, 50, 768)).astype(np.float32),
                 jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((768, 768)).astype(np.float32) * 0.02)
wq, sw = quantize_weight(w)
out = int8_matmul(x3, wq, sw)
ref = int8_matmul_xla(x3, wq, sw)
assert out.shape == (4, 50, 768)
np.testing.assert_allclose(np.asarray(out, np.float32),
                           np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)
print("INT8_OK")
"""


def test_int8_matmul_interpret_mode():
    res = subprocess.run(
        [sys.executable, "-c", _INT8_TEST],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
        env=_CACHE_ENV,
    )
    assert res.returncode == 0, res.stderr
    assert "INT8_OK" in res.stdout
