"""Profile the retrieval encode path (bench.py headline) on the real TPU and
print a device-time breakdown aggregated by source line / op category.

Usage: python tools/profile_encode.py [--iters 10]

Same method as profile_pretrain.py: warm-compile the on-device fori_loop used
by bench.py, re-run it under ``jax.profiler.trace``, aggregate XLA device
events from the dumped trace by ``source``/``tf_op`` metadata.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_pretrain import aggregate_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--log_dir", default=None)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/x2vlm_jax_cache_tpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from x2vlm_tpu.models import XVLMConfig, XVLMForRetrieval

    print("backend:", jax.default_backend(), jax.devices())
    cfg = XVLMConfig.base(image_res=224)
    model = XVLMForRetrieval(cfg, dtype=jnp.bfloat16)
    B, seq = args.batch, 40
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.bfloat16)
    text_ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (B, seq)),
                           jnp.int32)
    text_atts = jnp.ones((B, seq), jnp.int32)
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)},
        image, text_ids, text_atts, jnp.arange(B, dtype=jnp.int32),
        rng=jax.random.PRNGKey(2), deterministic=True))(jax.random.PRNGKey(0))

    iters = args.iters

    @jax.jit
    def encode_loop(params, image, text_ids, text_atts, seed):
        def body(i, carry):
            img = image + (seed + i.astype(jnp.float32) * 1e-6
                           ).astype(jnp.bfloat16)
            ids = jnp.roll(text_ids, i, axis=0)
            _, img_feat = model.apply(params, img, method=model.encode_images)
            _, txt_feat = model.apply(params, ids, text_atts,
                                      method=model.encode_texts)
            return carry + jnp.sum(img_feat).astype(jnp.float32) + \
                jnp.sum(txt_feat).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, seed)

    val = float(encode_loop(params, image, text_ids, text_atts,
                            jnp.float32(0.0)))
    print("warm:", val)
    log_dir = args.log_dir or tempfile.mkdtemp(prefix="encode_trace_")
    with jax.profiler.trace(log_dir):
        val = float(encode_loop(params, image, text_ids, text_atts,
                                jnp.float32(val * 1e-9)))
    print("traced:", val, "->", log_dir)
    aggregate_trace(log_dir, iters)


if __name__ == "__main__":
    main()
