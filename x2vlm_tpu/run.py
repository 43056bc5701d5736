"""Unified launcher (replaces reference run.py:1-509 + the 15 per-task
scripts' main() glue).

Usage:
    python -m x2vlm_tpu.run --task retrieval --config configs/finetune/retrieval_flickr_base.yaml \
        --output_dir out/ [--checkpoint x2vlm_base_4m.th] [--evaluate] \
        [--override_cfg "batch_size:64;optimizer.lr:2e-5"]

Tasks cover the reference's 15 entry points: Pretrain (incl. CCLM/aux
streams), Retrieval, XRetrieval, WIT, xFlickrCO, VQA, XGQA, NLVR, MARVL,
Grounding_bbox, Captioning_MLM, XVNLI, VQA_msrvtt/msvd (video_qa),
video retrieval eval, and the generic classification runner.

TPU-native launch model: ONE process per host (pjit spans all local chips
automatically; multi-host via `jax.distributed.initialize` when
JAX_COORDINATOR_ADDRESS is set) — no torch.distributed.launch command
assembly, no per-GPU process zoo.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from x2vlm_tpu.core import config as config_lib
from x2vlm_tpu.core import config_schema
from x2vlm_tpu.core import io as io_lib
from x2vlm_tpu.core import mesh as mesh_lib
from x2vlm_tpu.data.factory import create_dataset
from x2vlm_tpu.factory import build_model
from x2vlm_tpu.parallel import state_shardings
from x2vlm_tpu.tasks.finetune import append_log, train_epochs
from x2vlm_tpu.train import (
    checkpoint as ckpt_lib,
    create_optimizer, create_train_state, lr_schedule, make_train_step,
    param_labels,
)

TASKS = ("pretrain", "retrieval", "xretrieval", "wit", "xflickrco",
         "video_retrieval", "vqa", "xgqa", "nlvr", "marvl",
         "grounding", "captioning", "classification", "xvnli", "video_qa",
         "next_qa_mc")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True, choices=TASKS)
    p.add_argument("--config", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", default="",
                   help=".th (torch, imported) or orbax checkpoint dir")
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume full train state (+ pretrain data cursor) "
                        "from output_dir/ckpt")
    p.add_argument("--override_cfg", default="")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--bs", default=-1, type=int, help="override batch_size")
    p.add_argument("--epoch", default=-1, type=int, help="override epochs")
    p.add_argument("--fsdp", default=1, type=int,
                   help="size of the parameter-sharding mesh axis (ZeRO)")
    p.add_argument("--wait", default=0, type=int,
                   help="minutes to sleep before starting (reference run.py:476)")
    p.add_argument("--fewshot", default="",
                   help="IGLUE fewshot. <lang>,<shot_num>, eg: ar,25 — "
                        "fills '{}' templates in the config's data paths "
                        "(reference run.py:462, XGQA.py:312-314, "
                        "XVNLI.py:264-268, MARVL.py:246-247)")
    p.add_argument("--lr", default=0.0, type=float,
                   help="override learning rate (reference run.py:463)")
    p.add_argument("--k_test", default=-1, type=int,
                   help="override retrieval rerank depth (reference run.py:452)")
    p.add_argument("--num_workers", default=-1, type=int,
                   help="override every stream block's num_workers "
                        "(reference run.py:453)")
    p.add_argument("--pick_best_r1", action="store_true",
                   help="retrieval: track best ckpt by mean(txt_r1, img_r1) "
                        "(reference Retrieval.py:365-366)")
    p.add_argument("--gmt", action="store_true",
                   help="use the google-machine-translated test set "
                        "(test_file := gmt_test_file; reference "
                        "XVNLI.py:274, WIT.py:404, xFlickrCO.py:420)")
    p.add_argument("--output_hdfs", default="",
                   help="remote (hdfs:// or gs://) dir mirroring the run's "
                        "artifacts — log, config, results, checkpoints "
                        "(reference run.py:495-506, Pretrain.py:368-375)")
    return p.parse_args(argv)


def setup(args):
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    os.makedirs(args.output_dir, exist_ok=True)
    if args.config.startswith(("hdfs://", "gs://")):
        # stage remote config locally (reference run.py:495-506 get_from_hdfs;
        # remote .th checkpoints stream directly through hopen in ckpt_lib)
        args.config = io_lib.fetch_local(args.config, args.output_dir)
    if args.output_hdfs:
        io_lib.hmkdir(args.output_hdfs)
    cfg = config_lib.load_config(args.config, overrides=args.override_cfg)
    # refuse configs carrying keys nothing reads (the silent-knob class):
    # every accepted key is registered with its consumer in core/config_schema
    config_schema.validate_config(cfg, source=args.config)
    if args.fewshot:
        # IGLUE few-shot: fill '{}' path templates. Reference variants:
        # MARVL/XGQA format the joined "<lang>,<shots>" string into one slot
        # (MARVL.py:247, XGQA.py:313-314); XVNLI formats train with both
        # parts and val with the language alone (XVNLI.py:264-268).
        parts = args.fewshot.split(",")

        def fill(path, lang_only):
            if not (isinstance(path, str) and "{}" in path):
                return path
            n = path.count("{}")
            if n >= 2:
                return path.format(*parts[:n])
            return path.format(parts[0] if lang_only else args.fewshot)

        for key in ("train_file", "valid_file", "val_file", "test_file"):
            if key in cfg:
                v, lang_only = cfg[key], key in ("val_file", "test_file")
                cfg[key] = [fill(p, lang_only) for p in v] \
                    if isinstance(v, list) else fill(v, lang_only)
    if args.bs > 0:
        cfg["batch_size"] = args.bs
    if args.epoch > 0:
        cfg["schedular"] = dict(cfg.get("schedular", {}))
        cfg["schedular"]["epochs"] = args.epoch
    if args.lr > 0:
        # reference scripts set schedular.lr (e.g. WIT.py:272); make_optimizer
        # reads optimizer.lr first — override both
        cfg["optimizer"] = dict(cfg.get("optimizer", {}), lr=args.lr)
        cfg["schedular"] = dict(cfg.get("schedular", {}), lr=args.lr)
    if args.k_test > 0:
        cfg["k_test"] = args.k_test
    if args.num_workers > 0:
        for block in ("images", "regions", "videos", "texts", "mtexts"):
            if isinstance(cfg.get(block), dict):
                cfg[block] = dict(cfg[block], num_workers=args.num_workers)
    if args.pick_best_r1:
        cfg["pick_best_r1"] = True
    if args.gmt:
        if "gmt_test_file" not in cfg:
            raise ValueError("--gmt requires `gmt_test_file` in the config "
                             "(reference XRetrieval.py --gmt path)")
        cfg["test_file"] = cfg["gmt_test_file"]
    random.seed(args.seed)
    np.random.seed(args.seed)
    with open(os.path.join(args.output_dir, "config.yaml"), "w") as f:
        import yaml

        yaml.safe_dump(cfg.to_dict(), f)
    mesh = mesh_lib.create_mesh(fsdp=args.fsdp)
    return cfg, mesh


def make_optimizer(cfg, params, total_steps, fusion_layer, fresh_paths=(),
                   fsdp: int = 1, fresh_prefixes=()):
    """Reference optim.py:26-104 param groups: base lr, per-tower vision/text/
    cross lr overrides, and lr_mult for freshly-initialized params.

    The tree (per-leaf optax chain) update is the default: a same-run
    interleaved A/B on v5e measured the flat-vector variant at 138-141 ms
    vs tree 107-108 ms for the base pretrain step (and 211 vs 137.8 ms at
    large) — _flat_adamw's whole-tree flatten/unflatten copies (~4 full
    param-size passes/step) swamp its fused-kernel saving at model level.
    ``flat_optimizer: true`` keeps the flat path available (bit-exact, see
    test_train.py) for configs with thousands of tiny leaves."""
    opt = cfg.get("optimizer", {})
    sched_cfg = cfg.get("schedular", {})
    # validate the algorithm selectors instead of silently ignoring them
    # (reference optim.py builds AdamW, scheduler.py linear warmup-decay)
    if str(opt.get("opt", "adamW")).lower() != "adamw":
        raise ValueError(f"unsupported optimizer.opt: {opt.get('opt')!r} "
                         "(only adamW, as the reference optim.py)")
    if sched_cfg.get("sched", "linear") != "linear":
        raise ValueError(f"unsupported schedular.sched: "
                         f"{sched_cfg.get('sched')!r} (only linear)")
    base_lr = float(opt.get("lr", sched_cfg.get("lr", 1e-4)))
    sched = lr_schedule(
        base_lr,
        total_steps,
        warmup_steps=sched_cfg.get("num_warmup_steps", 0.1),
        min_rate=sched_cfg.get("min_rate", 0.0),
    )
    labels = param_labels(params, fusion_layer=fusion_layer,
                          fresh_paths=fresh_paths,
                          fresh_prefixes=fresh_prefixes)
    return create_optimizer(
        params, sched,
        weight_decay=float(opt.get("weight_decay", 0.01)),
        clip_grad_norm=cfg.get("accelerator", {}).get("CLIP_GRAD_NORM", 1.0),
        lr_mult=float(opt.get("lr_mult", 1.0)),
        vision_lr_scale=float(opt.get("vision_lr", base_lr)) / base_lr,
        text_lr_scale=float(opt.get("text_lr", base_lr)) / base_lr,
        cross_lr_scale=float(opt.get("cross_lr", base_lr)) / base_lr,
        labels=labels,
        flatten=cfg.get("flat_optimizer", False),
    )


def apply_fsdp(state, mesh):
    """Install the train state's mesh shardings: ZeRO-sharded over the fsdp
    axis when fsdp>1, fully replicated otherwise (the reference's DDP
    posture). Always device_put — restored checkpoints arrive committed to a
    single device and must be re-laid-out onto the mesh."""
    shardings = state_shardings(
        state, mesh,
        min_size=2 ** 16 if mesh.shape[mesh_lib.FSDP_AXIS] > 1 else 2 ** 62)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def maybe_resume(args, state):
    """--resume: orbax-restore the full TrainState (params+opt+step) from
    output_dir/ckpt. Returns (state, resumed_step)."""
    if not args.resume:
        return state, 0
    ckpt_dir = os.path.join(args.output_dir, "ckpt")
    restored, step = ckpt_lib.restore_train_state(ckpt_dir, state)
    if restored is None:
        print(f"### --resume: no checkpoint in {ckpt_dir}, starting fresh")
        return state, 0
    print(f"### resumed train state at step {step}")
    return restored, int(step)


def _leaf_count(tree) -> int:
    return len(jax.tree_util.tree_leaves(tree))


def _import_report(params, missing, checkpoint, unused, expect_loaded=()):
    """Per-subtree import diagnostics: which top-level subtrees stayed fully
    fresh (instead of a bare count, which hides e.g. an entire cross tower
    silently missing). ``expect_loaded`` subtrees raise when 100% missing."""
    from collections import Counter

    base = params["params"].get("base", params["params"])
    per_tree = Counter(p.split("/")[0] for p in missing)
    fresh = sorted(
        k for k, n in per_tree.items()
        if isinstance(base.get(k), dict) and n >= _leaf_count(base[k]))
    print(f"### imported {checkpoint}: {len(unused)} unused keys, "
          f"{len(missing)} missing (fresh) params"
          + (f"; fully-fresh subtrees: {fresh}" if fresh else ""))
    for k in sorted(per_tree):
        if k not in fresh and per_tree[k]:
            print(f"###   {k}: {per_tree[k]} fresh leaves")
    bad = [k for k in expect_loaded if k in fresh]
    if bad:
        raise ValueError(
            f"checkpoint import left {bad} entirely fresh, but the config "
            f"promises they load from {checkpoint} (is_xvlm_ckpt / "
            f"xvlm_ckpt_text_num_hidden_layers)")


def load_initial_params(args, cfg, model, init_variables):
    """Checkpoint import with surgery (full XVLM ``.th``, raw CLIP/Swin/BEiT-2
    vision towers, raw HF BERT — auto-sniffed), or orbax restore. Returns
    (variables, missing) where `missing` are the freshly-initialized param
    paths that get the optimizer's lr_mult group (reference init_params,
    xvlm.py:566-577)."""
    from x2vlm_tpu.models.xvlm_plus import XVLMPlusConfig

    mcfg = model.config
    is_plus = isinstance(mcfg, XVLMPlusConfig)
    if cfg.get("is_xvlm_ckpt") and not is_plus:
        raise ValueError("is_xvlm_ckpt is a Plus/CCLM import knob (Base→Plus "
                         "text-stack split); this model is not XVLMPlus")
    if not args.checkpoint:
        # pretrain-from-raw: vision tower from the vision JSON's `ckpt`
        # (reference xvlm.py:197,244,269 load_params=True) and the text stack
        # from the HF text_encoder dir (build_text_encoder load_text_params,
        # xvlm.py:312-360) — both auto-sniffed, merged in one pass. Skipped
        # silently when the files aren't present (e.g. smoke tests).
        tree = {}
        vc_path = cfg.get("vision_config")
        if vc_path and os.path.exists(vc_path):
            vp = config_lib.read_json(vc_path).get("ckpt")
            if vp and os.path.exists(vp):
                sd = ckpt_lib.load_torch_checkpoint(vp)
                t, unused, _ = ckpt_lib.convert_checkpoint_auto(
                    sd, vision_cfg=mcfg.vision,
                    text_layers=mcfg.text.num_layers,
                    text_fusion_layer=mcfg.text.fusion_layer)
                print(f"### vision init from {vp} ({len(unused)} unused)")
                tree.update(t)
        tdir = str(cfg.get("text_encoder", ""))
        tbin = os.path.join(tdir, "pytorch_model.bin")
        if os.path.isdir(tdir) and os.path.exists(tbin):
            sd = ckpt_lib.load_torch_checkpoint(tbin)
            t, unused, _ = ckpt_lib.convert_checkpoint_auto(
                sd, vision_cfg=mcfg.vision,
                text_layers=mcfg.text.num_layers,
                text_fusion_layer=mcfg.text.fusion_layer)
            print(f"### text init from {tbin} ({len(unused)} unused)")
            tree.update(t)
        if not tree:
            return init_variables, []
        params, missing = ckpt_lib.merge_imported(init_variables, tree)
        _import_report(params, missing, "raw vision/text init", [])
        return params, missing
    if args.checkpoint.endswith((".th", ".pth", ".pt", ".bin")):
        sd = ckpt_lib.load_torch_checkpoint(args.checkpoint)
        tree, unused, kind = ckpt_lib.convert_checkpoint_auto(
            sd, vision_cfg=mcfg.vision, text_layers=mcfg.text.num_layers,
            text_fusion_layer=mcfg.text.fusion_layer)
        expect_loaded = []
        if is_plus and cfg.get("is_xvlm_ckpt") and kind == "xvlm" and \
                "cross_encoder" not in tree:
            # Base→Plus split: the fused text stack's upper layers become the
            # standalone cross encoder (reference load_pretrained_xvlm)
            tree = ckpt_lib.split_imported_to_plus(
                tree,
                xvlm_text_layers=cfg.get("xvlm_ckpt_text_num_hidden_layers"),
                replace_text_encoder=cfg.get("replace_text_encoder", False))
            expect_loaded.append("cross_encoder")
        params, missing = ckpt_lib.merge_imported(init_variables, tree)
        _import_report(params, missing, args.checkpoint, unused,
                       expect_loaded=expect_loaded)
        return params, missing
    # orbax checkpoint dir: saved objects are TrainStates — restore without a
    # template and extract the param tree
    restored, step = ckpt_lib.restore_train_state(args.checkpoint, None)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint found at {args.checkpoint}")
    params = restored["params"] if isinstance(restored, dict) and \
        "params" in restored else getattr(restored, "params", restored)
    print(f"### restored step {step} from {args.checkpoint}")
    return {"params": params}, []


def eval_multi(eval_one, eval_sets, mean_key=None):
    """Per-language eval over a {lang: dataset} dict (reference
    XRetrieval.py/MARVL.py/XGQA.py loops over test_dataset_dict); scalar
    datasets pass through. `mean_key` additionally averages that metric
    across languages for best-model tracking."""
    if not isinstance(eval_sets, dict):
        return eval_one(eval_sets)
    out = {}
    vals = []
    for lang, ds in eval_sets.items():
        m = eval_one(ds, lang=lang) if _wants_lang(eval_one) else eval_one(ds)
        out.update({f"{lang}_{k}": v for k, v in m.items()})
        if mean_key and mean_key in m:
            vals.append(m[mean_key])
    if mean_key and vals:
        out[mean_key] = sum(vals) / len(vals)
    return out


def _wants_lang(fn):
    import inspect

    try:
        return "lang" in inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False


def _train_state_and_loop(args, cfg, mesh, model, mcfg, variables, missing,
                          train_loader, eval_fn=None, metric_key=None):
    """Shared optimizer/state/fsdp/resume/epoch-loop tail of every fine-tune
    runner."""
    epochs = cfg.get("schedular", {}).get("epochs", 5)
    accum = int(cfg.get("accumulate_steps", 1))
    # ONE optimizer step per loader batch: make_train_step splits each batch
    # into `accum` sequential microbatches (lax.scan), so batch_size is the
    # EFFECTIVE per-step batch and accumulate_steps only caps device memory.
    # steps_per_epoch therefore must NOT divide by accum — the LR schedule's
    # total_steps, --resume's start_epoch, and the actual optimizer step
    # count all agree on len(train_loader). (The reference instead steps
    # every N loader batches, Retrieval.py:40,49-59 — there batch_size is
    # the microbatch; this framework keeps static shapes per jitted step.)
    steps_per_epoch = max(1, len(train_loader))
    # large_lr_for_dec: the whole generation decoder trains at lr_mult
    # (reference model_generation.py:445-447 init_params; vqa2_large.yaml:29)
    fresh_prefixes = (("text_decoder", "dec_head")
                      if cfg.get("large_lr_for_dec", False) else ())
    tx = make_optimizer(cfg, variables["params"],
                        total_steps=steps_per_epoch * epochs,
                        fusion_layer=mcfg.text.fusion_layer,
                        fresh_paths=missing, fsdp=args.fsdp,
                        fresh_prefixes=fresh_prefixes)
    state = create_train_state(variables, tx)
    state, resumed_step = maybe_resume(args, state)
    state = apply_fsdp(state, mesh)
    start_epoch = min(resumed_step // max(1, steps_per_epoch), epochs)
    step_fn = make_train_step(model, tx, accum_steps=accum)

    def save_fn(state, epoch, best=False):
        # per-epoch save (reference Retrieval.py:363-396 writes
        # checkpoint_{epoch}); best epochs additionally land in ckpt_best
        # (reference checkpoint_best.pth)
        ckpt_lib.save_train_state(
            os.path.join(args.output_dir, "ckpt"), state, int(state.step))
        if best:
            ckpt_lib.save_train_state(
                os.path.join(args.output_dir, "ckpt_best"), state,
                int(state.step))

    return train_epochs(
        model, state, step_fn, train_loader, num_epochs=epochs,
        start_epoch=start_epoch,
        rng_key=jax.random.PRNGKey(args.seed), use_mesh=True,
        eval_fn=(lambda st: eval_fn({"params": st.params}))
        if eval_fn else None,
        eval_start_epoch=int(cfg.get("start_eval", 0)),
        metric_key=metric_key, output_dir=args.output_dir, save_fn=save_fn)


def _finetune_common(args, cfg, mesh, model, mcfg, train_loader, example_batch,
                     eval_fn=None, metric_key=None, extra_init_kwargs=None):
    with mesh_lib.global_mesh(mesh):
        variables = model.init(
            {"params": jax.random.PRNGKey(args.seed),
             "dropout": jax.random.PRNGKey(args.seed + 1)},
            example_batch, **(extra_init_kwargs or {}))
        variables, missing = load_initial_params(args, cfg, model, variables)

        if args.evaluate:
            metrics = eval_fn(variables) if eval_fn else {}
            print(metrics)
            append_log(args.output_dir, {"eval": metrics})
            return None

        return _train_state_and_loop(args, cfg, mesh, model, mcfg, variables,
                                     missing, train_loader, eval_fn=eval_fn,
                                     metric_key=metric_key)


def _stack_example(sample):
    return {k: jnp.asarray(np.stack([v, v])) for k, v in sample.items()}


def run_retrieval(args, cfg, mesh, task="retrieval"):
    """retrieval | xretrieval | wit | xflickrco | video_retrieval — all share
    the two-stage ITC→ITM protocol (reference Retrieval.py:71-215,
    XRetrieval.py:262, WIT.py:251, xFlickrCO.py:251)."""
    from x2vlm_tpu.data import MapLoader
    from x2vlm_tpu.tasks.retrieval import evaluate_retrieval

    model, mcfg = build_model(cfg, "retrieval")
    evaluate_only = args.evaluate
    train_ds, test_ds = create_dataset(task, cfg, evaluate=evaluate_only,
                                       rng=random.Random(args.seed))

    with mesh_lib.global_mesh(mesh):
        res = cfg["image_res"]
        frame = (cfg.get("frame_len", 1), ) if task == "video_retrieval" else ()
        max_tokens = cfg.get("max_tokens", 40)
        example = {
            "image": jnp.zeros((2, *frame, res, res, 3)),
            "text_ids": jnp.zeros((2, max_tokens), jnp.int32),
            "text_atts": jnp.ones((2, max_tokens), jnp.int32),
            "idx": jnp.zeros((2,), jnp.int32),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(args.seed),
             "dropout": jax.random.PRNGKey(args.seed + 1)},
            example, rng=jax.random.PRNGKey(0))
        variables, missing = load_initial_params(args, cfg, model, variables)

        # MSRVTT-style video retrieval tracks the best checkpoint by
        # text→video recall (img_r_mean) instead of the overall mean
        # (reference --pick_best_t2v, run.py:162, Retrieval.py:367,435;
        # --pick_best_r1 tracks mean R@1, Retrieval.py:365-366)
        metric_key = ("img_r_mean" if cfg.get("pick_best_t2v")
                      else "r1_mean" if cfg.get("pick_best_r1")
                      else "r_mean")

        def eval_fn(v):
            return eval_multi(
                lambda ds: evaluate_retrieval(
                    model, v, ds, k_test=cfg.get("k_test", 128),
                    host_id=jax.process_index(),
                    num_hosts=jax.process_count()),
                test_ds, mean_key=metric_key)

        if evaluate_only:
            metrics = eval_fn(variables)
            print(metrics)
            append_log(args.output_dir, {"eval": metrics})
            return

        loader = MapLoader(train_ds, cfg.get("batch_size", 32),
                           host_id=jax.process_index(),
                           num_hosts=jax.process_count())
        _train_state_and_loop(
            args, cfg, mesh, model, mcfg, variables, missing, loader,
            eval_fn=lambda v: eval_fn(v), metric_key=metric_key)


def run_nlvr(args, cfg, mesh, task="nlvr"):
    """nlvr | marvl (reference NLVR.py, MARVL.py:134 — MARVL trains on
    English NLVR2, zero-shots the multilingual test sets)."""
    from x2vlm_tpu.data import MapLoader
    from x2vlm_tpu.tasks.classification import evaluate_classification

    model, mcfg = build_model(cfg, "nlvr")
    train_ds, test_ds = create_dataset(task, cfg, evaluate=args.evaluate,
                                       rng=random.Random(args.seed))

    def eval_fn(v):
        return eval_multi(
            lambda ds: evaluate_classification(
                model, v, ds, batch_size=cfg.get("batch_size_test", 32),
                host_id=jax.process_index(), num_hosts=jax.process_count()),
            test_ds, mean_key="accuracy")

    if args.evaluate:
        loader = None
        first = next(iter(test_ds.values())) if isinstance(test_ds, dict) else test_ds
        example = _stack_example(first[0])
    else:
        loader = MapLoader(train_ds, cfg.get("batch_size", 32),
                           host_id=jax.process_index(),
                           num_hosts=jax.process_count())
        example = _stack_example(train_ds[0])
    _finetune_common(args, cfg, mesh, model, mcfg, loader, example,
                     eval_fn=eval_fn, metric_key="accuracy")


def run_grounding(args, cfg, mesh, task="grounding"):
    from x2vlm_tpu.data import MapLoader
    from x2vlm_tpu.evalkit import grounding_eval_bbox, grounding_eval_bbox_vlue
    from x2vlm_tpu.tasks.grounding import predict_grounding

    model, mcfg = build_model(cfg, "grounding")
    train_ds, test_ds = create_dataset(task, cfg, evaluate=args.evaluate,
                                       rng=random.Random(args.seed))
    loader = example = None
    if not args.evaluate:
        loader = MapLoader(train_ds, cfg.get("batch_size", 32),
                           host_id=jax.process_index(),
                           num_hosts=jax.process_count())
        example = _stack_example(train_ds[0])
    else:
        example = _stack_example({k: v for k, v in test_ds[0].items()
                                  if k != "ref_id"})
        example["target_bbox"] = jnp.full((2, 4), 0.4)

    refs = None
    if cfg.get("refs_file"):
        with open(cfg["refs_file"]) as f:
            refs = {int(k): v for k, v in json.load(f).items()}

    def eval_fn(v):
        results = predict_grounding(model, v, test_ds,
                                    batch_size=cfg.get("batch_size_test", 32),
                                    host_id=jax.process_index(),
                                    num_hosts=jax.process_count())
        if cfg.get("vlue_test"):
            # VLUE test json carries its own bbox/width/height annotations
            # (reference Grounding_bbox.py:154-155)
            tf = cfg["test_file"]
            return grounding_eval_bbox_vlue(
                results, tf[0] if isinstance(tf, (list, tuple)) else tf)
        return grounding_eval_bbox(results, refs) if refs else {"n": len(results)}

    metric_key = ("score" if cfg.get("vlue_test")
                  else "val_acc" if refs else None)
    _finetune_common(args, cfg, mesh, model, mcfg, loader, example,
                     eval_fn=eval_fn, metric_key=metric_key)


def run_vqa(args, cfg, mesh, task="vqa"):
    """vqa | xgqa (reference VQA.py, XGQA.py:181 — same ranking protocol,
    XGQA adds per-language test sets)."""
    from x2vlm_tpu.data import MapLoader, vqa_collate
    from x2vlm_tpu.tasks.vqa import evaluate_vqa

    model, mcfg = build_model(cfg, "vqa")
    train_ds, test_ds = create_dataset(task, cfg, evaluate=args.evaluate,
                                       rng=random.Random(args.seed))

    answers_per_batch = cfg.get("answers_per_batch",
                                cfg.get("batch_size", 32) * 2)

    class _VQALoader(MapLoader):
        def __iter__(self):
            # seeded per-epoch rng → reproducible answer-row truncation
            rng = random.Random(args.seed * 1000003 + self.epoch)
            for batch_samples in self._raw_batches():
                yield vqa_collate(batch_samples, answers_per_batch, rng=rng)

        def _raw_batches(self):
            from x2vlm_tpu.data.loader import batch_indices

            batches = batch_indices(
                len(self.dataset), self.batch_size, shuffle=self.shuffle,
                seed=self.seed, epoch=self.epoch, host_id=self.host_id,
                num_hosts=self.num_hosts, drop_last=self.drop_last)
            for b in batches:
                yield [self.dataset[i] for i in b]

    loader = example = None
    if not args.evaluate:
        loader = _VQALoader(train_ds, cfg.get("batch_size", 32),
                            host_id=jax.process_index(),
                            num_hosts=jax.process_count())
        example = vqa_collate([train_ds[0], train_ds[min(1, len(train_ds) - 1)]],
                              answers_per_batch=4)
        example = jax.tree_util.tree_map(jnp.asarray, example)

    def eval_one(ds, lang=None):
        from x2vlm_tpu.evalkit.vqa import exact_match_accuracy, vqa_eval
        from x2vlm_tpu.tasks.collect import collect_results

        results = evaluate_vqa(
            model, eval_one.variables, ds, ds.answer_list, ds.answer_ids,
            ds.answer_atts, k_test=cfg.get("k_test", 128),
            batch_size=cfg.get("batch_size_test", 32),
            host_id=jax.process_index(), num_hosts=jax.process_count())
        tag = f"_{lang}" if lang else ""
        # per-host shard (reference dataset/utils.py:208-244 rank files) ...
        shard = os.path.join(args.output_dir,
                             f"vqa_result{tag}_host{jax.process_index()}.json")
        with open(shard, "w") as f:
            json.dump(results, f)
        # ... merged across hosts, then scored with the official protocol
        # when the test split carries answers (reference VQA.py:94-116,176)
        merged = collect_results(results, dedup_key="question_id")
        if jax.process_index() == 0:
            with open(os.path.join(args.output_dir,
                                   f"vqa_result{tag}.json"), "w") as f:
                json.dump(merged, f)
        out = {"n": len(merged)}
        gts = ds.gt_answers()
        if gts:
            # official 10-answer protocol (meaningful for VQAv2-style multi-
            # answer gts) + the reference's exact-match acc (VQA.py:94-116)
            out.update(vqa_eval(merged, gts))
            out["acc"] = exact_match_accuracy(merged, gts)
        return out

    _gts0 = (next(iter(test_ds.values())) if isinstance(test_ds, dict)
             else test_ds).gt_answers()
    # best-model metric: the official protocol needs multiple human answers
    # per question to be meaningful; single-answer sets track exact match
    metric_key = None
    if _gts0:
        metric_key = ("overall" if max(len(v) for v in _gts0.values()) >= 4
                      else "acc")

    def eval_fn(v):
        eval_one.variables = v
        return eval_multi(eval_one, test_ds, mean_key=metric_key)

    if args.evaluate:
        first = next(iter(test_ds.values())) if isinstance(test_ds, dict) else test_ds
        s = first[0]
        example = {"image": jnp.asarray(np.stack([s["image"]] * 2)),
                   "question_ids": jnp.asarray(np.stack([s["question_ids"]] * 2)),
                   "question_atts": jnp.asarray(np.stack([s["question_atts"]] * 2)),
                   "answer_ids": jnp.asarray(first.answer_ids[:2]),
                   "answer_atts": jnp.asarray(first.answer_atts[:2]),
                   "answer_weights": jnp.ones((2,), jnp.float32),
                   "answer_index": jnp.zeros((2,), jnp.int32)}

    _finetune_common(args, cfg, mesh, model, mcfg, loader, example,
                     eval_fn=eval_fn, metric_key=metric_key)


def run_captioning(args, cfg, mesh, task="captioning"):
    from x2vlm_tpu.data import MapLoader, build_tokenizer
    from x2vlm_tpu.evalkit import caption_eval
    from x2vlm_tpu.tasks.captioning import generate_captions

    model, mcfg = build_model(cfg, "captioning")
    tokenizer = build_tokenizer(cfg["text_encoder"])
    train_ds, test_ds = create_dataset(task, cfg, evaluate=args.evaluate,
                                       tokenizer=tokenizer,
                                       rng=random.Random(args.seed))
    loader = example = None
    if not args.evaluate:
        loader = MapLoader(train_ds, cfg.get("batch_size", 16),
                           host_id=jax.process_index(),
                           num_hosts=jax.process_count())
        example = _stack_example(train_ds[0])

    anns = None
    if cfg.get("caption_gt_file"):
        with open(cfg["caption_gt_file"]) as f:
            anns = {int(k): v for k, v in json.load(f).items()}

    def eval_fn(v):
        results = generate_captions(
            model, v, test_ds, tokenizer, prompt=cfg.get("prompt", ""),
            num_beams=cfg.get("num_beams", 3),
            min_length=cfg.get("min_length", 5),
            max_length=cfg.get("max_length", 20),
            length_penalty=float(cfg.get("length_penalty", 0.0)),
            batch_size=cfg.get("batch_size_test", 16),
            host_id=jax.process_index(), num_hosts=jax.process_count())
        return caption_eval(results, anns) if anns else {"n": len(results)}

    if cfg.get("scst") and not args.evaluate:
        # self-critical fine-tune (the reference declares --scst but has no
        # loop behind it — Captioning_MLM.py:272); CIDEr-D reward rollouts
        return _run_captioning_scst(args, cfg, mesh, model, mcfg, tokenizer,
                                    example, eval_fn if anns else None)

    _finetune_common(args, cfg, mesh, model, mcfg, loader, example,
                     eval_fn=eval_fn, metric_key="cider" if anns else None)


def _run_captioning_scst(args, cfg, mesh, model, mcfg, tokenizer, example,
                         eval_fn):
    from x2vlm_tpu.data.finetune import CaptioningSCSTDataset
    from x2vlm_tpu.data.transforms import test_transform
    from x2vlm_tpu.tasks.scst import scst_train_step

    # SCST rollouts use the deterministic eval transform (reference
    # coco_karpathy_train_scst samples rewards on un-augmented images)
    ds = CaptioningSCSTDataset(
        cfg["train_file"], test_transform(cfg["image_res"]),
        cfg.get("image_root", cfg.get("image_root_train", "")))
    prompt_ids = tokenizer.convert_tokens_to_ids(
        [tokenizer.cls_token] + (tokenizer.tokenize(cfg["prompt"])
                                 if cfg.get("prompt") else []))
    bsz = cfg.get("batch_size_scst", cfg.get("batch_size", 8))
    epochs = cfg.get("schedular", {}).get("epochs", 3)

    with mesh_lib.global_mesh(mesh):
        variables = model.init(
            {"params": jax.random.PRNGKey(args.seed),
             "dropout": jax.random.PRNGKey(args.seed + 1)}, example)
        variables, missing = load_initial_params(args, cfg, model, variables)
        steps_per_epoch = max(1, len(ds) // bsz)
        tx = make_optimizer(cfg, variables["params"],
                            total_steps=steps_per_epoch * epochs,
                            fusion_layer=mcfg.text.fusion_layer,
                            fresh_paths=missing, fsdp=args.fsdp)
        state = create_train_state(variables, tx)
        state, _ = maybe_resume(args, state)
        state = apply_fsdp(state, mesh)
        step_fn = make_train_step(model, tx, donate=False)
        rng = jax.random.PRNGKey(args.seed + 2)
        idx = list(range(len(ds)))
        metrics = {"loss_scst": float("nan")}
        for epoch in range(epochs):
            random.Random(args.seed + epoch).shuffle(idx)
            for lo in range(0, len(idx) - bsz + 1, bsz):
                rows = [ds[i] for i in idx[lo: lo + bsz]]
                images = jnp.asarray(np.stack([r["image"] for r in rows]))
                refs = [r["captions"] for r in rows]
                rng, sub = jax.random.split(rng)
                state, metrics, _ = scst_train_step(
                    model, state, step_fn, images, refs, tokenizer, sub,
                    prompt_ids=prompt_ids,
                    num_samples=cfg.get("scst_num_samples", 5),
                    max_length=cfg.get("max_length", 20))
            append_log(args.output_dir,
                       {"epoch": epoch,
                        "loss_scst": float(metrics["loss_scst"])})
            ckpt_lib.save_train_state(
                os.path.join(args.output_dir, "ckpt"), state, int(state.step))
            if eval_fn is not None:
                append_log(args.output_dir,
                           {"epoch": epoch,
                            "eval": eval_fn({"params": state.params})})
        return state


def run_classification(args, cfg, mesh, task="classification"):
    """classification (config `dataset_type`) | xvnli | video_qa — accuracy
    over an answer vocabulary (reference XVNLI.py, VQA_msrvtt.py/msvd)."""
    from x2vlm_tpu.data import MapLoader
    from x2vlm_tpu.tasks.classification import evaluate_classification

    if task == "classification":
        task = {"video_qa": "video_qa"}.get(cfg.get("dataset_type"),
                                            cfg.get("dataset_type", "xvnli"))
    if task in ("next_qa_mc", "video_qa_mc"):
        # K-option multiple choice (NExT-QA MC): softmax over option scores,
        # no answer vocabulary
        model_task = "multiple_choice"
    else:
        model_task = "classification"
        if task in ("video_qa", "vqa_msrvtt", "vqa_msvd"):
            with open(cfg["answer_list"]) as f:
                cfg["num_labels"] = len(json.load(f))
        else:
            cfg.setdefault("num_labels", 3)

    train_ds, test_ds = create_dataset(task, cfg, evaluate=args.evaluate,
                                       rng=random.Random(args.seed))
    model, mcfg = build_model(cfg, model_task)

    loader = example = None
    if not args.evaluate:
        loader = MapLoader(train_ds, cfg.get("batch_size", 32),
                           host_id=jax.process_index(),
                           num_hosts=jax.process_count())
        example = _stack_example(train_ds[0])
    else:
        first = next(iter(test_ds.values())) if isinstance(test_ds, dict) else test_ds
        example = _stack_example(first[0])

    def eval_fn(v):
        return eval_multi(
            lambda ds: evaluate_classification(
                model, v, ds, batch_size=cfg.get("batch_size_test", 32),
                host_id=jax.process_index(), num_hosts=jax.process_count()),
            test_ds, mean_key="accuracy")

    _finetune_common(args, cfg, mesh, model, mcfg, loader, example,
                     eval_fn=eval_fn, metric_key="accuracy")


def run_pretrain(args, cfg, mesh):
    """Mixed-stream pretraining: image (noisy + optional aux clean), region,
    video (+ video aux), text-MLM, and CCLM parallel-text streams (reference
    Pretrain.py:255-423, model_pretrain.py:148-196)."""
    from x2vlm_tpu.data import (
        DistLineReader, Prefetcher, TextPreprocessor, build_tokenizer,
        iter_batches,
    )
    from x2vlm_tpu.data import transforms as T
    from x2vlm_tpu.data.multilingual import (
        ImageMultiTextStream, ParaTextStream, RegionMultiTextStream,
    )
    from x2vlm_tpu.data.pretrain import (
        ImageTextStream, RegionTextStream, TextStream, region_collate,
    )
    from x2vlm_tpu.models.heads import pretrain_init_inputs
    from x2vlm_tpu.tasks.pretrain import PretrainStreams, pretrain_loop

    # the mixed-stream step (all streams drawn every iteration) is the only
    # implemented path, in the reference too (Pretrain.py:359 raises
    # "i didn't use this" when mixed_in_batch is false)
    if not cfg.get("mixed_in_batch", True):
        raise ValueError("mixed_in_batch: false is not implemented "
                         "(reference Pretrain.py:359 raises too)")
    for _stream_key in ("images", "regions", "videos", "texts", "mtexts"):
        if (cfg.get(_stream_key) or {}).get("tokenized", False):
            # pre-tokenized inputs: unimplemented in the reference as well
            # (pretrain_dataset.py:146-147 asserts tokenized is False)
            raise ValueError(f"{_stream_key}.tokenized: true is not "
                             "implemented (reference pretrain_dataset.py:147)")

    model, mcfg = build_model(cfg, "pretrain")
    tokenizer = build_tokenizer(cfg["text_encoder"])
    pre = TextPreprocessor(
        tokenizer, max_tokens=cfg.get("max_tokens", 40),
        max_words=cfg.get("max_words", 40), max_masks=cfg.get("max_masks", 12),
        mask_prob=cfg.get("mask_prob", 0.5),
        mask_whole_word=cfg.get("mask_whole_word", True),
        skipgram_prb=cfg.get("skipgram_prb", 0.2),
        skipgram_size=cfg.get("skipgram_size", 3))

    host, nhosts = jax.process_index(), jax.process_count()
    readers = {}  # name -> DistLineReader, for the checkpointable data cursor
    data_state_path = os.path.join(args.output_dir, "data_state.json")
    resume_data_state = {}
    if args.resume and os.path.exists(data_state_path):
        with open(data_state_path) as f:
            resume_data_state = json.load(f)
        print(f"### resumed data cursors: {resume_data_state}")

    def make_reader(name, paths):
        reader = DistLineReader(paths, rank=host, world_size=nhosts,
                                start_state=resume_data_state.get(name))
        readers[name] = reader
        return reader

    def native_or_pil(native_cls_name, pil_fallback, num_threads=1):
        """Native one-pass decode+augment when available (1.5x the one-core
        feed rate, tools/bench_input_pipeline.py; GIL-free C++ pool sized by
        the block's num_workers — the reference's DataLoader-worker analog);
        `native_aug: false` forces the PIL path, true requires the lib.
        Both paths draw augmentation params from the global `random` stream
        seeded by --seed, so runs are reproducible either way."""
        want = cfg.get("native_aug", "auto")
        if want in (True, "auto"):
            try:
                from x2vlm_tpu.data import native as native_lib

                cls = getattr(native_lib, native_cls_name)
                return cls(cfg["image_res"], rng=random,
                           num_threads=max(1, num_threads))
            except RuntimeError:
                if want is True:
                    raise
        return pil_fallback()

    def image_transform(icfg):
        threads = min(int(icfg.get("num_workers", 2)), os.cpu_count() or 1)
        return native_or_pil(
            "NativeTrainTransform",
            lambda: T.pretrain_transform(cfg["image_res"], as_float=False),
            num_threads=threads)

    def image_stream_for(name, paths, icfg):
        """Image-text batches; multilingual captions when `languages` is
        configured (CCLM, reference pretrain_dataset_multilingual.py:174-203)."""
        reader = make_reader(name, paths)
        kw = dict(image_key=icfg.get("image_key", "binary"),
                  caption_key=icfg.get("caption_key", "caption"),
                  is_image_rpath=icfg.get("is_image_rpath", False))
        if icfg.get("languages"):
            stream = ImageMultiTextStream(
                reader, pre, image_transform(icfg),
                languages=icfg["languages"], **kw)
        else:
            stream = ImageTextStream(reader, pre, image_transform(icfg), **kw)

        def batches():
            yield from iter_batches(iter(stream), icfg.get("batch_size", 128))

        return batches()

    icfg = dict(cfg.get("images", {}))
    icfg.setdefault("caption_key", "desc")
    streams = {"image": image_stream_for("image", cfg["train_file"], icfg)}

    if cfg.get("train_file_aux"):
        # clean-data stream drawn with prob aux_iter_perc in place of the
        # noisy image batch (reference Pretrain.py:330-341,
        # x2vlm_base_1b.yaml:18)
        aux_cfg = dict(icfg)
        aux_cfg["caption_key"] = icfg.get("aux_caption_key",
                                          icfg.get("caption_key", "caption"))
        streams["aux"] = image_stream_for("aux", cfg["train_file_aux"], aux_cfg)

    rcfg = cfg.get("regions")
    if rcfg and cfg.get("train_file_regions"):
        # every leading batch dim must divide the device count for sharding;
        # round max_images up (reference uses 50 per GPU — here the host batch
        # spans all local chips)
        n_dev = jax.device_count()
        rcfg = dict(rcfg)
        rcfg["max_images"] = -(-rcfg.get("max_images", 50) // n_dev) * n_dev
        assert rcfg.get("batch_size", 128) % n_dev == 0, \
            "regions.batch_size must divide the device count"

        def box_tf():
            return native_or_pil("NativeBoxTransform", T.box_transform)

        def region_batches():
            reader = make_reader("region", cfg["train_file_regions"])
            kw = dict(image_res=cfg["image_res"],
                      patch_size=cfg.get("patch_size", 16),
                      max_regions=rcfg.get("max_regions", 5),
                      min_perc_in_image=rcfg.get("min_perc_in_image", 0.5),
                      careful_hflip=rcfg.get("careful_hflip", True),
                      image_key=rcfg.get("image_key", "binary"))
            if rcfg.get("languages"):
                stream = RegionMultiTextStream(
                    reader, pre, box_tf(),
                    languages=rcfg["languages"],
                    code_switch=rcfg.get("code_switch", True), **kw)
            else:
                stream = RegionTextStream(reader, pre, box_tf(), **kw)
            it = iter(stream)
            while True:
                samples = [next(it) for _ in range(rcfg.get("max_images", 50))]
                yield region_collate(samples, rcfg.get("batch_size", 128),
                                     rcfg.get("max_images", 50))

        streams["region"] = region_batches()

    vcfg = cfg.get("videos")
    if vcfg and cfg.get("train_file_videos"):
        from x2vlm_tpu.data.pretrain import VideoTextStream

        def video_batches(name, paths):
            reader = make_reader(name, paths)
            stream = VideoTextStream(
                reader, pre, image_transform(vcfg),
                frame_len=vcfg.get("frame_len", cfg.get("frame_len", 3)),
                # the reference names the frame list via the block's
                # image_key (pretrain_dataset.py:298); frames_key wins if set
                frames_key=vcfg.get("frames_key",
                                    vcfg.get("image_key", "frames")),
                caption_key=vcfg.get("caption_key", "caption"),
                is_image_rpath=vcfg.get("is_image_rpath", False),
                combine_continuous_clips=vcfg.get(
                    "combine_continuous_clips", False),
                minimum_frames_before_sampling=vcfg.get(
                    "mininum_frames_before_sampling", -1))
            yield from iter_batches(iter(stream), vcfg.get("batch_size", 40))

        streams["video"] = video_batches("video", cfg["train_file_videos"])
        if cfg.get("train_file_videos_aux"):
            streams["video_aux"] = video_batches(
                "video_aux", cfg["train_file_videos_aux"])

    tcfg = cfg.get("texts")
    if tcfg and cfg.get("train_file_text"):
        def text_batches():
            reader = make_reader("text", cfg["train_file_text"])
            stream = TextStream(reader, pre,
                                caption_key=tcfg.get("caption_key", "text"))
            yield from iter_batches(iter(stream), tcfg.get("batch_size", 128))

        streams["text"] = text_batches()

    mcfg_streams = cfg.get("mtexts")
    if mcfg_streams and cfg.get("train_file_mtext"):
        from x2vlm_tpu.models.xvlm_plus import XVLMPlusForPretrain

        assert isinstance(model, XVLMPlusForPretrain), \
            "parallel-text (mtexts) pretraining needs model_type: cclm/xvlm_plus"
        # CCLM parallel-text TTC/TTM/TLM (reference Pretrain.py:238-247,
        # multilingual_cclm_x2vlm_base.yaml mtexts block)
        mpre = TextPreprocessor(
            tokenizer, max_tokens=mcfg_streams.get("max_tokens",
                                                   cfg.get("max_tokens", 64)),
            max_words=mcfg_streams.get("max_words",
                                       mcfg_streams.get("max_tokens",
                                                        cfg.get("max_words", 64))),
            max_masks=mcfg_streams.get("max_masks", cfg.get("max_masks", 12)),
            mask_prob=mcfg_streams.get("mask_prob", cfg.get("mask_prob", 0.5)),
            mask_whole_word=cfg.get("mask_whole_word", True),
            skipgram_prb=cfg.get("skipgram_prb", 0.2),
            skipgram_size=cfg.get("skipgram_size", 3))

        def mtext_batches():
            reader = make_reader("mtext", cfg["train_file_mtext"])
            stream = ParaTextStream(
                reader, mpre,
                key_a=mcfg_streams.get("source_key", "text1"),
                key_b=mcfg_streams.get("target_key", "text2"))
            yield from iter_batches(iter(stream),
                                    mcfg_streams.get("batch_size", 128))

        streams["mtext"] = mtext_batches()

    with mesh_lib.global_mesh(mesh):
        variables = model.init(
            {"params": jax.random.PRNGKey(args.seed),
             "dropout": jax.random.PRNGKey(args.seed + 1)},
            pretrain_init_inputs(mcfg), rng=jax.random.PRNGKey(0),
            ret_bbox_loss=True)
        variables, missing = load_initial_params(args, cfg, model, variables)

        sched_cfg = cfg.get("schedular", {})
        steps_per_epoch = cfg.get("train_dataset_size", 10 ** 6) // (
            cfg.get("images", {}).get("batch_size", 128) * max(nhosts, 1))
        total_steps = steps_per_epoch * sched_cfg.get("epochs", 3)
        tx = make_optimizer(cfg, variables["params"], total_steps,
                            fusion_layer=mcfg.text.fusion_layer,
                            fresh_paths=missing, fsdp=args.fsdp)
        state = create_train_state(variables, tx)
        state, start_step = maybe_resume(args, state)
        state = apply_fsdp(state, mesh)

        # overlap host decode/augment with device steps: one background
        # prefetch thread per stream, queue depth = the block's num_workers
        # (the reference's DataLoader num_workers). The checkpointed data
        # cursor then runs at most `depth` batches ahead of training — a
        # bounded resume skew (the reference restarts data from zero).
        def _nw(block):
            return max(1, int((block or {}).get("num_workers", 2)))

        _depths = {"image": _nw(cfg.get("images")),
                   "aux": _nw(cfg.get("images")),
                   "region": _nw(cfg.get("regions")),
                   "video": _nw(cfg.get("videos")),
                   "video_aux": _nw(cfg.get("videos")),
                   "text": _nw(cfg.get("texts")),
                   "mtext": _nw(cfg.get("mtexts"))}
        streams = {k: iter(Prefetcher(v, depth=_depths.get(k, 2)))
                   for k, v in streams.items()}

        ps = PretrainStreams(
            image=streams["image"], region=streams.get("region"),
            video=streams.get("video"), text=streams.get("text"),
            mtext=streams.get("mtext"), aux=streams.get("aux"),
            video_aux=streams.get("video_aux"),
            image_weight=(cfg.get("images") or {}).get("iter_perc", 1.0),
            region_weight=(cfg.get("regions") or {}).get("iter_perc", 1.0),
            video_weight=(cfg.get("videos") or {}).get("iter_perc", 1.0),
            text_weight=(cfg.get("texts") or {}).get("iter_perc", 1.0),
            mtext_weight=(cfg.get("mtexts") or {}).get("iter_perc", 1.0),
            aux_perc=cfg.get("aux_iter_perc", 0.0),
            video_aux_perc=cfg.get("video_aux_iter_perc", 0.0),
            regions_use_bbox_only=cfg.get("regions_use_bbox_only", False),
            rng=random.Random(args.seed))

        def checkpoint_fn(state, step):
            ckpt_lib.save_train_state(
                os.path.join(args.output_dir, "ckpt"), state, step)
            # persist the data cursor next to the model state so --resume
            # continues mid-epoch (DistLineReader.state; the reference
            # restarts its data from zero)
            tmp = data_state_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({k: r.state() for k, r in readers.items()}, f)
            os.replace(tmp, data_state_path)

        state = pretrain_loop(
            model, state, tx, ps, num_steps=total_steps,
            start_step=start_step,
            rng_key=jax.random.PRNGKey(args.seed),
            shard_fn=mesh_lib.shard_batch,
            stop_calc_itm_after=cfg.get("stop_calc_itm", None),
            calc_image_bbox_loss=cfg.get("calc_image_bbox_loss", False),
            checkpoint_fn=checkpoint_fn,
            checkpoint_every=cfg.get("ckpt_frequent_step", 50000),
            epoch_steps=steps_per_epoch,
            epoch_save_frequent=int(cfg.get("ckpt_frequent", 1)))


def main(argv=None):
    args = parse_args(argv)
    if args.wait:
        print(f"### waiting {args.wait} minutes", flush=True)
        time.sleep(args.wait * 60)
    cfg, mesh = setup(args)
    t0 = time.time()
    runners = {
        "pretrain": lambda a, c, m: run_pretrain(a, c, m),
        "retrieval": run_retrieval,
        "xretrieval": run_retrieval,
        "wit": run_retrieval,
        "xflickrco": run_retrieval,
        "video_retrieval": run_retrieval,
        "vqa": run_vqa,
        "xgqa": run_vqa,
        "nlvr": run_nlvr,
        "marvl": run_nlvr,
        "grounding": run_grounding,
        "captioning": run_captioning,
        "classification": run_classification,
        "xvnli": run_classification,
        "video_qa": run_classification,
        "next_qa_mc": run_classification,
    }
    runner = runners[args.task]
    if args.task == "pretrain":
        runner(args, cfg, mesh)
    else:
        runner(args, cfg, mesh, task=args.task)
    if args.output_hdfs and jax.process_index() == 0:
        # mirror run artifacts to the remote dir (reference Pretrain.py:368-375
        # copies log + ckpts to --output_hdfs; done once at run end here —
        # orbax writes many small files, per-step mirroring would thrash)
        io_lib.mirror_to_remote(args.output_dir, args.output_hdfs)
        print(f"### mirrored {args.output_dir} -> {args.output_hdfs}")
    print(f"total time: {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
