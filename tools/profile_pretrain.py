"""Profile the pretrain train step on the real TPU and print a step-time
breakdown aggregated by source line / op category.

Usage (on the axon tunnel; probe it first — see CLAUDE.md):
    python tools/profile_pretrain.py [--size base] [--steps 5]

Method: warm-compile the 5-step scan used by bench.py, run once more under
``jax.profiler.trace``, then aggregate XLA device events from the dumped
``*.trace.json.gz`` by their ``source`` / ``tf_op`` metadata. Per CLAUDE.md,
the profiler trace is the ground truth on this device (host timings include
tunnel overhead; identical dispatches can be cache-served).
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(size: str, remat: str = "none"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from x2vlm_tpu.models import XVLMConfig, XVLMForPretrain
    from x2vlm_tpu.models.heads import pretrain_init_inputs
    from x2vlm_tpu.train import (
        create_optimizer, create_train_state, lr_schedule, make_train_step,
    )

    if size == "large":
        # matches bench.py's pretrain_large config (no remat — see the A/B
        # note there); pass --remat full|dots to profile a remat variant
        cfg = XVLMConfig.large(image_res=224)
        B = 16
    else:
        cfg = XVLMConfig.base(image_res=224)
        B = 32
    if remat != "none":
        policy = None if remat == "full" else remat
        cfg = dataclasses.replace(
            cfg,
            vision=dataclasses.replace(cfg.vision, remat=True,
                                       remat_policy=policy),
            text=dataclasses.replace(cfg.text, remat=True,
                                     remat_policy=policy))
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
    return model, state, step, batch


def aggregate_trace(log_dir: str, n_steps: int):
    """Aggregate device events from the trace-viewer JSON by source line."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace file found under", log_dir)
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-lane complete events carry args with tf_op/source metadata
    by_src = collections.Counter()
    by_name = collections.Counter()
    flops_src = collections.Counter()
    mm = {}  # matmul-ish events: (name, shape) -> [dur_us, flops]
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        # keep only TPU op events (they carry hlo/source metadata)
        if not any(k in args for k in ("source", "tf_op", "hlo_op")):
            continue
        name = ev.get("name", "?")
        # the scan's outer `while` event contains every inner op event —
        # counting it would double the total and mask the real breakdown
        if name.split(".")[0] == "while":
            continue
        dur = float(ev.get("dur", 0.0))  # µs
        total += dur
        src = args.get("source") or args.get("tf_op") or ev.get("name", "?")
        by_src[src] += dur
        # collapse fusion instance suffixes: fusion.123 → fusion
        base = name.split(".")[0]
        by_name[base] += dur
        try:
            fl = float(args.get("model_flops", 0) or 0)
        except (TypeError, ValueError):
            fl = 0.0
        if fl:
            flops_src[src] += fl
            shape = args.get("shape_with_layout", "")
            key = (name.split(".")[0], shape, src)
            ent = mm.setdefault(key, [0.0, 0.0])
            ent[0] += dur
            ent[1] += fl
    per_step = total / max(n_steps, 1)
    print(f"\ntotal attributed device time: {total/1000:.2f} ms "
          f"({per_step/1000:.2f} ms/step over {n_steps} steps)")
    print("\n-- by source line (top 30, ms/step | TF/s where FLOPs known) --")
    for src, dur in by_src.most_common(30):
        tfs = flops_src.get(src, 0.0) / dur / 1e6 if dur else 0.0
        eff = f"{tfs:7.1f}" if tfs else "      -"
        print(f"{dur/1000/n_steps:8.3f}  {eff}  {src}")
    print("\n-- by op category (ms/step) --")
    for name, dur in by_name.most_common(20):
        print(f"{dur/1000/n_steps:8.3f}  {name}")
    print("\n-- top matmul/conv events by time (ms/step | TF/s | shape | src) --")
    ranked = sorted(mm.items(), key=lambda kv: -kv[1][0])[:25]
    for (name, shape, src), (dur, fl) in ranked:
        tfs = fl / dur / 1e6 if dur else 0.0
        print(f"{dur/1000/n_steps:8.3f}  {tfs:7.1f}  {shape[:70]:70s} {src}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="base")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--log_dir", default=None)
    ap.add_argument("--remat", default="none",
                    choices=["none", "full", "dots", "dots_saveable"])
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/x2vlm_jax_cache_tpu")

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices())
    model, state, step, batch = build_step(args.size, args.remat)

    STEPS = args.steps
    import functools

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
    print("warm:", float(last))

    log_dir = args.log_dir or tempfile.mkdtemp(prefix="pretrain_trace_")
    with jax.profiler.trace(log_dir):
        state, last = multi(state, batch, jax.random.PRNGKey(4))
        _ = float(last)
    print("trace written to", log_dir)
    aggregate_trace(log_dir, STEPS)


if __name__ == "__main__":
    main()
