"""Benchmark: image-text pair encoding throughput (retrieval ITC encode path)
on X2VLM-base — BEiT-2-base @224 vision tower + 12-layer BERT text tower +
contrastive projections, bf16, jitted.

Measures *device* throughput: the encode loop runs on-device via
``lax.fori_loop`` with per-iteration input perturbation (the axon tunnel
backend dedupes identical dispatches and ships host buffers per call, so
host-side loops measure the network, not the chip).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline (BASELINE.md north star): 2,000 pairs/sec/chip on TPU v5e.

Secondary tracked metrics (BASELINE.md): set X2VLM_BENCH=pretrain for the
pretrain train-step time (base @224, batch 32/chip, itc+itm+mlm fwd+bwd+update).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_vqa():
    """VQA answer-ranking inference throughput (BASELINE.md tracked metric:
    'VQA samples/sec'): encode question+image, rank the official-protocol
    answer list (~3.1k candidates) with k_test=128 rerank — the reference's
    VQA.py:126-157 protocol shape."""
    from x2vlm_tpu.models import XVLMConfig
    from x2vlm_tpu.models.generation import XVLMForVQA

    cfg = XVLMConfig.base(image_res=480)
    model = XVLMForVQA(cfg, dtype=jnp.bfloat16)
    Q, Lq, A, La, K = 16, 24, 3128, 8, 128
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((Q, 480, 480, 3)), jnp.bfloat16)
    q_ids = jnp.asarray(rng.integers(1, cfg.text.vocab_size, (Q, Lq)), jnp.int32)
    q_atts = jnp.ones((Q, Lq), jnp.int32)
    a_ids = jnp.asarray(rng.integers(1, cfg.text.vocab_size, (A, La)), jnp.int32)
    a_atts = jnp.ones((A, La), jnp.int32)
    variables = jax.jit(lambda k: model.init(
        k, {"image": image, "question_ids": q_ids, "question_atts": q_atts,
            "answer_ids": a_ids[:Q], "answer_atts": a_atts[:Q],
            "answer_index": jnp.arange(Q, dtype=jnp.int32),
            "answer_weights": jnp.ones((Q,), jnp.float32)},
        deterministic=True))(jax.random.PRNGKey(0))

    iters = 4

    @jax.jit
    def loop(params, image, seed):
        def body(i, carry):
            img = image + (seed + i.astype(jnp.float32) * 1e-6
                           ).astype(jnp.bfloat16)
            ids, probs = model.apply(
                params, {"image": img, "question_ids": q_ids,
                         "question_atts": q_atts, "answer_ids": a_ids,
                         "answer_atts": a_atts},
                k=K, method=model.predict)
            return carry + jnp.sum(probs).astype(jnp.float32) + \
                jnp.sum(ids).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, seed)

    val = float(loop(variables, image, jnp.float32(0.0)))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        val = float(loop(variables, image, jnp.float32(val * 1e-12)))
        times.append(time.perf_counter() - t0)
    value = Q * iters / min(times) / max(jax.device_count(), 1)
    print(json.dumps({
        "metric": "vqa_rank_samples_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "samples/s/chip",
        "vs_baseline": 0.0,  # reference publishes no VQA throughput numbers
    }))


def bench_pretrain_step(size: str = "base"):
    import dataclasses

    from x2vlm_tpu.models import XVLMConfig, XVLMForPretrain
    from x2vlm_tpu.models.heads import pretrain_init_inputs
    from x2vlm_tpu.train import (
        create_optimizer, create_train_state, lr_schedule, make_train_step,
    )

    if size == "large":
        # No remat: the 593M model's activations at b16/224px fit inside
        # 16 GB HBM with the fp32 Adam state resident, and the backward's
        # forward-recompute is pure overhead. Measured same-day A/B on v5e
        # (5-step donated scan): full remat 164.8 ms, remat_policy="dots"
        # 148.6 ms, no remat 136.5 ms. Memory-constrained configs (768px)
        # should set `remat: true, remat_policy: dots` in YAML instead.
        cfg = XVLMConfig.large(image_res=224)
        B = 16
    else:
        cfg = XVLMConfig.base(image_res=224)
        B = 32
    model = XVLMForPretrain(cfg, dtype=jnp.bfloat16)
    seq, n_mask = 40, 12
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.bfloat16),
        "text_ids": jnp.asarray(rng.integers(0, cfg.text.vocab_size, (B, seq)), jnp.int32),
        "text_atts": jnp.ones((B, seq), jnp.int32),
        "text_ids_masked": jnp.asarray(rng.integers(0, cfg.text.vocab_size, (B, seq)), jnp.int32),
        "masked_pos": jnp.asarray(rng.integers(0, seq, (B, n_mask)), jnp.int32),
        "masked_ids": jnp.asarray(rng.integers(0, cfg.text.vocab_size, (B, n_mask)), jnp.int32),
    }
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)},
        pretrain_init_inputs(cfg), rng=jax.random.PRNGKey(2),
        ret_bbox_loss=True))(jax.random.PRNGKey(0))
    tx = create_optimizer(variables["params"], lr_schedule(1e-4, 1000, 100))
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, donate=False)

    # Chain N full steps inside ONE jitted scan: per-step time is then pure
    # device time — host-timed single steps include the tunnel's per-call
    # overhead (~tens of ms), which once inflated this metric (CLAUDE.md).
    # Donating the carried TrainState matches the production loop (donated
    # step buffers) and removes ~5 ms/step of scan-carry copies (measured).
    STEPS = 5

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, batch, key):
        def body(st, i):
            b = dict(batch,
                     image=batch["image"] + (i.astype(jnp.float32) * 1e-6
                                             ).astype(jnp.bfloat16))
            st, metrics = step(st, b, jax.random.fold_in(key, i))
            return st, metrics["loss_total"]
        st, losses = jax.lax.scan(body, state, jnp.arange(STEPS))
        return st, losses[-1]

    state, last = multi(state, batch, jax.random.PRNGKey(3))
    _ = float(last)  # sync (compile + warm)
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        state, last = multi(state, batch, jax.random.PRNGKey(4 + r))
        _ = float(last)
        times.append(time.perf_counter() - t0)
    step_s = min(times) / STEPS
    print(json.dumps({
        "metric": f"pretrain_step_time_{size}_b{B}",
        "value": round(step_s * 1000, 1),
        "unit": "ms/step",
        "vs_baseline": 0.0,  # reference publishes no step-time numbers
    }))


def supervised_main():
    """The shared TPU tunnel intermittently hangs for minutes at a time (other
    tenants); a hung measurement would leave the driver with no number at all.
    Run the actual benchmark in a child process with a timeout and retry until
    a window opens; forward its one JSON line."""
    import subprocess

    deadline = time.time() + float(os.environ.get("X2VLM_BENCH_BUDGET_S", 3000))
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        budget = min(600, max(60, int(deadline - time.time())))
        env = dict(os.environ, X2VLM_BENCH_CHILD="1")
        # persistent compile cache: a first attempt that times out mid-compile
        # still seeds the cache, so retries resume instead of recompiling
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/x2vlm_jax_cache_tpu")
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, timeout=budget, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            print(f"# attempt {attempt}: timed out (tunnel busy); retrying",
                  file=sys.stderr)
            continue
        for line in res.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return 0
        print(f"# attempt {attempt}: exit {res.returncode}; retrying",
              file=sys.stderr)
        time.sleep(30)
    print(json.dumps({
        "metric": "retrieval_encode_pairs_per_sec_per_chip",
        "value": 0.0, "unit": "pairs/s/chip", "vs_baseline": 0.0,
        "error": "TPU tunnel unavailable for the whole bench budget",
    }))
    return 1


def main():
    if os.environ.get("X2VLM_BENCH_CHILD") != "1":
        return supervised_main()
    if os.environ.get("X2VLM_BENCH") == "pretrain":
        return bench_pretrain_step()
    if os.environ.get("X2VLM_BENCH") == "pretrain_large":
        return bench_pretrain_step("large")
    if os.environ.get("X2VLM_BENCH") == "vqa":
        return bench_vqa()
    from x2vlm_tpu.models import XVLMConfig, XVLMForRetrieval

    import dataclasses

    base_cfg = XVLMConfig.base(image_res=224)
    quant = os.environ.get("X2VLM_BENCH") == "int8"

    def variant(act, q):
        return dataclasses.replace(
            base_cfg,
            vision=dataclasses.replace(base_cfg.vision, act=act, quant_int8=q),
            text=dataclasses.replace(base_cfg.text, act=act, quant_int8=q))

    batch = 128
    seq = 40
    iters = 10
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16)
    text_ids = jnp.asarray(rng.integers(0, base_cfg.text.vocab_size,
                                        (batch, seq)), jnp.int32)
    text_atts = jnp.ones((batch, seq), jnp.int32)
    params_box = {}

    def measure(cfg):
        """pairs/s for one config. All variants share the identical param
        tree (act/quant are graph-only), so init runs once."""
        model = XVLMForRetrieval(cfg, dtype=jnp.bfloat16)
        if "params" not in params_box:
            params_box["params"] = jax.jit(
                lambda k: model.init(
                    {"params": k, "dropout": jax.random.PRNGKey(1)},
                    image, text_ids, text_atts,
                    jnp.arange(batch, dtype=jnp.int32),
                    rng=jax.random.PRNGKey(2), deterministic=True)
            )(jax.random.PRNGKey(0))
        params = params_box["params"]

        @jax.jit
        def encode_loop(params, image, text_ids, text_atts, seed):
            def body(i, carry):
                img = image + (seed + i.astype(jnp.float32) * 1e-6
                               ).astype(jnp.bfloat16)
                ids = jnp.roll(text_ids, i, axis=0)
                _, img_feat = model.apply(params, img,
                                          method=model.encode_images)
                _, txt_feat = model.apply(params, ids, text_atts,
                                          method=model.encode_texts)
                # consume every row so XLA cannot dead-code-eliminate rows
                return carry + jnp.sum(img_feat).astype(jnp.float32) + \
                    jnp.sum(txt_feat).astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, seed)

        # NOTE: on the axon tunnel block_until_ready can return early and
        # identical dispatches may be cache-served — sync by *fetching a
        # value* and chain reps through the result.
        val = float(encode_loop(params, image, text_ids, text_atts,
                                jnp.float32(0.0)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            val = float(encode_loop(params, image, text_ids, text_atts,
                                    jnp.float32(val * 1e-9)))
            times.append(time.perf_counter() - t0)
        return batch * iters / min(times)

    n_chips = max(jax.device_count(), 1)
    if quant:
        value = measure(variant("gelu_fast", True)) / n_chips
        print(json.dumps({
            "metric": "retrieval_encode_int8_pairs_per_sec_per_chip",
            "value": round(value, 2),
            "unit": "pairs/s/chip",
            "vs_baseline": round(value / 2000.0, 4),
        }))
        return
    # headline = checkpoint-import-parity config (exact erf GELU); the
    # serving variant (tanh GELU, ~1e-3 feature diff) is reported alongside
    parity = measure(variant("gelu", False)) / n_chips
    serving = measure(variant("gelu_fast", False)) / n_chips
    print(json.dumps({
        "metric": "retrieval_encode_pairs_per_sec_per_chip",
        "value": round(parity, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(parity / 2000.0, 4),
        "serving_gelu_fast_value": round(serving, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
