"""Unified launcher (replaces reference run.py:1-509 + the 15 per-task
scripts' main() glue).

Usage:
    python -m x2vlm_tpu.run --task retrieval --config configs/finetune/retrieval_flickr_base.yaml \
        --output_dir out/ [--checkpoint x2vlm_base_4m.th] [--evaluate] \
        [--override_cfg "batch_size:64;optimizer.lr:2e-5"]

TPU-native launch model: ONE process per host (pjit spans all local chips
automatically; multi-host via `jax.distributed.initialize` when
JAX_COORDINATOR_ADDRESS is set) — no torch.distributed.launch command
assembly, no per-GPU process zoo.
"""

from __future__ import annotations

import argparse
import functools
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from x2vlm_tpu.core import config as config_lib
from x2vlm_tpu.core import mesh as mesh_lib
from x2vlm_tpu.factory import build_model
from x2vlm_tpu.tasks.finetune import append_log, train_epochs
from x2vlm_tpu.train import (
    checkpoint as ckpt_lib,
    create_optimizer, create_train_state, lr_schedule, make_train_step,
    param_labels,
)

TASKS = ("pretrain", "retrieval", "vqa", "nlvr", "grounding", "captioning",
         "classification")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True, choices=TASKS)
    p.add_argument("--config", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", default="",
                   help=".th (torch, imported) or orbax checkpoint dir")
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume full train state from output_dir/ckpt")
    p.add_argument("--override_cfg", default="")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--bs", default=-1, type=int, help="override batch_size")
    p.add_argument("--epoch", default=-1, type=int, help="override epochs")
    p.add_argument("--fsdp", default=1, type=int)
    p.add_argument("--wait", default=0, type=int,
                   help="minutes to sleep before starting (reference run.py:476)")
    return p.parse_args(argv)


def setup(args):
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    cfg = config_lib.load_config(args.config, overrides=args.override_cfg)
    if args.bs > 0:
        cfg["batch_size"] = args.bs
    if args.epoch > 0:
        cfg["schedular"] = dict(cfg.get("schedular", {}))
        cfg["schedular"]["epochs"] = args.epoch
    random.seed(args.seed)
    np.random.seed(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "config.yaml"), "w") as f:
        import yaml

        yaml.safe_dump(cfg.to_dict(), f)
    mesh = mesh_lib.create_mesh(fsdp=args.fsdp)
    return cfg, mesh


def make_optimizer(cfg, params, total_steps, fusion_layer):
    opt = cfg.get("optimizer", {})
    sched_cfg = cfg.get("schedular", {})
    sched = lr_schedule(
        float(opt.get("lr", sched_cfg.get("lr", 1e-4))),
        total_steps,
        warmup_steps=sched_cfg.get("num_warmup_steps", 0.1),
        min_rate=sched_cfg.get("min_rate", 0.0),
    )
    labels = param_labels(params, fusion_layer=fusion_layer)
    return create_optimizer(
        params, sched,
        weight_decay=float(opt.get("weight_decay", 0.01)),
        clip_grad_norm=cfg.get("accelerator", {}).get("CLIP_GRAD_NORM", 1.0),
        lr_mult=float(opt.get("lr_mult", 1.0)),
        vision_lr_scale=float(opt.get("vision_lr", opt.get("lr", 1e-4)))
        / float(opt.get("lr", 1e-4)),
        text_lr_scale=float(opt.get("text_lr", opt.get("lr", 1e-4)))
        / float(opt.get("lr", 1e-4)),
        labels=labels,
    )


def load_initial_params(args, cfg, model, init_variables):
    """`.th` import with surgery, or orbax restore."""
    if not args.checkpoint:
        return init_variables, []
    if args.checkpoint.endswith(".th") or args.checkpoint.endswith(".pth"):
        sd = ckpt_lib.load_torch_checkpoint(args.checkpoint)
        vision_depth = cfg.get("vision_num_hidden_layers", 40)
        window = cfg["image_res"] // cfg.get("patch_size", 16)
        tree, unused = ckpt_lib.convert_xvlm_state_dict(
            sd, vision_depth=vision_depth, dst_window=window)
        params, missing = ckpt_lib.merge_imported(init_variables, tree)
        print(f"### imported {args.checkpoint}: "
              f"{len(unused)} unused keys, {len(missing)} missing (fresh) params")
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


def run_retrieval(args, cfg, mesh):
    from x2vlm_tpu.data import (
        MapLoader, RetrievalEvalDataset, RetrievalTrainDataset, TextPreprocessor,
        build_tokenizer,
    )
    from x2vlm_tpu.data import transforms as T
    from x2vlm_tpu.models.heads import XVLMForRetrieval
    from x2vlm_tpu.tasks.retrieval import evaluate_retrieval

    model, mcfg = build_model(cfg, "retrieval")
    tokenizer = build_tokenizer(cfg["text_encoder"])
    pre = TextPreprocessor(tokenizer, max_tokens=cfg.get("max_tokens", 40))

    test_ds = RetrievalEvalDataset(cfg["test_file"], T.test_transform(cfg["image_res"]),
                                   cfg["image_root"], pre)
    batch_size = cfg.get("batch_size", 32)

    with mesh_lib.global_mesh(mesh):
        example = {
            "image": jnp.zeros((2, cfg["image_res"], cfg["image_res"], 3)),
            "text_ids": jnp.zeros((2, pre.max_tokens), jnp.int32),
            "text_atts": jnp.ones((2, pre.max_tokens), jnp.int32),
            "idx": jnp.zeros((2,), jnp.int32),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(args.seed),
             "dropout": jax.random.PRNGKey(args.seed + 1)},
            example, rng=jax.random.PRNGKey(0))
        variables, _ = load_initial_params(args, cfg, model, variables)

        eval_fn = lambda state: evaluate_retrieval(
            model, {"params": state.params if hasattr(state, "params") else state},
            test_ds, k_test=cfg.get("k_test", 128),
            host_id=jax.process_index(), num_hosts=jax.process_count())

        if args.evaluate:
            metrics = evaluate_retrieval(
                model, variables, test_ds, k_test=cfg.get("k_test", 128),
                host_id=jax.process_index(), num_hosts=jax.process_count())
            print(metrics)
            append_log(args.output_dir, {"eval": metrics})
            return

        train_ds = RetrievalTrainDataset(
            cfg["train_file"], T.train_transform(cfg["image_res"]),
            cfg["image_root"], pre)
        loader = MapLoader(train_ds, batch_size,
                           host_id=jax.process_index(),
                           num_hosts=jax.process_count())
        epochs = cfg.get("schedular", {}).get("epochs", 5)
        tx = make_optimizer(cfg, variables["params"],
                            total_steps=len(loader) * epochs,
                            fusion_layer=mcfg.text.fusion_layer)
        state = create_train_state(variables, tx)
        step_fn = make_train_step(model, tx)

        def save_fn(state, epoch, best=False):
            ckpt_lib.save_train_state(
                os.path.join(args.output_dir, "ckpt"), state, int(state.step))

        train_epochs(model, state, step_fn, loader, num_epochs=epochs,
                     rng_key=jax.random.PRNGKey(args.seed), use_mesh=True,
                     eval_fn=eval_fn, metric_key="r_mean",
                     output_dir=args.output_dir, save_fn=save_fn)


def run_pretrain(args, cfg, mesh):
    from x2vlm_tpu.data import (
        DistLineReader, TextPreprocessor, build_tokenizer, iter_batches,
    )
    from x2vlm_tpu.data import transforms as T
    from x2vlm_tpu.data.pretrain import (
        ImageTextStream, RegionTextStream, TextStream, region_collate,
    )
    from x2vlm_tpu.models.heads import pretrain_init_inputs
    from x2vlm_tpu.tasks.pretrain import PretrainStreams, pretrain_loop

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

    def image_batches():
        icfg = cfg.get("images", {})
        reader = DistLineReader(cfg["train_file"], rank=host, world_size=nhosts)
        stream = ImageTextStream(
            reader, pre, T.pretrain_transform(cfg["image_res"]),
            image_key=icfg.get("image_key", "binary"),
            caption_key=icfg.get("caption_key", "desc"),
            is_image_rpath=icfg.get("is_image_rpath", False))
        yield from iter_batches(iter(stream), icfg.get("batch_size", 128))

    streams = {"image": image_batches()}
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

        def region_batches():
            reader = DistLineReader(cfg["train_file_regions"], rank=host,
                                    world_size=nhosts)
            stream = RegionTextStream(
                reader, pre, T.box_transform(), image_res=cfg["image_res"],
                patch_size=cfg.get("patch_size", 16),
                max_regions=rcfg.get("max_regions", 5),
                min_perc_in_image=rcfg.get("min_perc_in_image", 0.5),
                careful_hflip=rcfg.get("careful_hflip", True),
                image_key=rcfg.get("image_key", "binary"))
            it = iter(stream)
            while True:
                samples = [next(it) for _ in range(rcfg.get("max_images", 50))]
                yield region_collate(samples, rcfg.get("batch_size", 128),
                                     rcfg.get("max_images", 50))

        streams["region"] = region_batches()
    vcfg = cfg.get("videos")
    if vcfg and cfg.get("train_file_videos"):
        from x2vlm_tpu.data.pretrain import VideoTextStream

        def video_batches():
            reader = DistLineReader(cfg["train_file_videos"], rank=host,
                                    world_size=nhosts)
            stream = VideoTextStream(
                reader, pre, T.pretrain_transform(cfg["image_res"]),
                frame_len=cfg.get("frame_len", 3),
                frames_key=vcfg.get("frames_key", "frames"),
                caption_key=vcfg.get("caption_key", "caption"),
                is_image_rpath=vcfg.get("is_image_rpath", False))
            yield from iter_batches(iter(stream), vcfg.get("batch_size", 40))

        streams["video"] = video_batches()
    tcfg = cfg.get("texts")
    if tcfg and cfg.get("train_file_text"):
        def text_batches():
            reader = DistLineReader(cfg["train_file_text"], rank=host,
                                    world_size=nhosts)
            stream = TextStream(reader, pre,
                                caption_key=tcfg.get("caption_key", "text"))
            yield from iter_batches(iter(stream), tcfg.get("batch_size", 128))

        streams["text"] = text_batches()

    with mesh_lib.global_mesh(mesh):
        variables = model.init(
            {"params": jax.random.PRNGKey(args.seed),
             "dropout": jax.random.PRNGKey(args.seed + 1)},
            pretrain_init_inputs(mcfg), rng=jax.random.PRNGKey(0),
            ret_bbox_loss=True)
        variables, _ = load_initial_params(args, cfg, model, variables)

        sched_cfg = cfg.get("schedular", {})
        steps_per_epoch = cfg.get("train_dataset_size", 10 ** 6) // (
            cfg.get("images", {}).get("batch_size", 128) * max(nhosts, 1))
        total_steps = steps_per_epoch * sched_cfg.get("epochs", 3)
        tx = make_optimizer(cfg, variables["params"], total_steps,
                            fusion_layer=mcfg.text.fusion_layer)
        state = create_train_state(variables, tx)

        ps = PretrainStreams(
            image=streams["image"], region=streams.get("region"),
            video=streams.get("video"), text=streams.get("text"),
            region_perc=(cfg.get("regions") or {}).get("iter_perc", 1.0),
            video_perc=(cfg.get("videos") or {}).get("iter_perc", 1.0),
            text_perc=(cfg.get("texts") or {}).get("iter_perc", 1.0))

        def checkpoint_fn(state, step):
            ckpt_lib.save_train_state(
                os.path.join(args.output_dir, "ckpt"), state, step)

        state = pretrain_loop(
            model, state, tx, ps, num_steps=total_steps,
            rng_key=jax.random.PRNGKey(args.seed),
            shard_fn=mesh_lib.shard_batch,
            stop_calc_itm_after=cfg.get("stop_calc_itm", None),
            checkpoint_fn=checkpoint_fn,
            checkpoint_every=cfg.get("ckpt_frequent_step", 50000))


def _finetune_common(args, cfg, mesh, model, mcfg, train_loader, example_batch,
                     eval_fn=None, metric_key=None, extra_init_kwargs=None):
    with mesh_lib.global_mesh(mesh):
        variables = model.init(
            {"params": jax.random.PRNGKey(args.seed),
             "dropout": jax.random.PRNGKey(args.seed + 1)},
            example_batch, **(extra_init_kwargs or {}))
        variables, _ = load_initial_params(args, cfg, model, variables)

        if args.evaluate:
            metrics = eval_fn_wrap(eval_fn, variables)
            print(metrics)
            append_log(args.output_dir, {"eval": metrics})
            return None

        epochs = cfg.get("schedular", {}).get("epochs", 5)
        tx = make_optimizer(cfg, variables["params"],
                            total_steps=len(train_loader) * epochs,
                            fusion_layer=mcfg.text.fusion_layer)
        state = create_train_state(variables, tx)
        step_fn = make_train_step(model, tx)

        def save_fn(state, epoch, best=False):
            ckpt_lib.save_train_state(
                os.path.join(args.output_dir, "ckpt"), state, int(state.step))

        return train_epochs(
            model, state, step_fn, train_loader, num_epochs=epochs,
            rng_key=jax.random.PRNGKey(args.seed), use_mesh=True,
            eval_fn=(lambda st: eval_fn_wrap(eval_fn, {"params": st.params}))
            if eval_fn else None,
            metric_key=metric_key, output_dir=args.output_dir, save_fn=save_fn)


def eval_fn_wrap(eval_fn, variables):
    return eval_fn(variables) if eval_fn else {}


def run_nlvr(args, cfg, mesh):
    from x2vlm_tpu.data import MapLoader, NLVRDataset, TextPreprocessor, build_tokenizer
    from x2vlm_tpu.data import transforms as T
    from x2vlm_tpu.tasks.classification import evaluate_classification

    model, mcfg = build_model(cfg, "nlvr")
    tokenizer = build_tokenizer(cfg["text_encoder"])
    pre = TextPreprocessor(tokenizer, max_tokens=cfg.get("max_tokens", 40))
    res = cfg["image_res"]
    train_ds = NLVRDataset(cfg["train_file"], T.train_transform(res),
                           cfg["image_root"], pre)
    test_ds = NLVRDataset(cfg["test_file"], T.test_transform(res),
                          cfg["image_root"], pre)
    loader = MapLoader(train_ds, cfg.get("batch_size", 32),
                       host_id=jax.process_index(), num_hosts=jax.process_count())
    example = train_ds[0]
    example = {k: jnp.asarray(np.stack([v, v])) for k, v in example.items()}
    eval_fn = lambda v: evaluate_classification(
        model, v, test_ds, batch_size=cfg.get("batch_size_test", 32),
        host_id=jax.process_index(), num_hosts=jax.process_count())
    _finetune_common(args, cfg, mesh, model, mcfg, loader, example,
                     eval_fn=eval_fn, metric_key="accuracy")


def run_grounding(args, cfg, mesh):
    from x2vlm_tpu.data import (
        GroundingEvalDataset, GroundingTrainDataset, MapLoader,
        TextPreprocessor, build_tokenizer,
    )
    from x2vlm_tpu.data import transforms as T
    from x2vlm_tpu.evalkit import grounding_eval_bbox
    from x2vlm_tpu.tasks.grounding import predict_grounding

    model, mcfg = build_model(cfg, "grounding")
    tokenizer = build_tokenizer(cfg["text_encoder"])
    pre = TextPreprocessor(tokenizer, max_tokens=cfg.get("max_tokens", 40))
    res = cfg["image_res"]
    train_ds = GroundingTrainDataset(cfg["train_file"], T.box_transform(),
                                     cfg["image_root"], pre, image_res=res,
                                     careful_hflip=cfg.get("careful_hflip", True))
    test_ds = GroundingEvalDataset(cfg["test_file"], T.test_transform(res),
                                   cfg["image_root"], pre)
    loader = MapLoader(train_ds, cfg.get("batch_size", 32),
                       host_id=jax.process_index(), num_hosts=jax.process_count())
    example = train_ds[0]
    example = {k: jnp.asarray(np.stack([v, v])) for k, v in example.items()}

    refs = None
    if cfg.get("refs_file"):
        import json as _json

        with open(cfg["refs_file"]) as f:
            refs = {int(k): v for k, v in _json.load(f).items()}

    def eval_fn(v):
        results = predict_grounding(model, v, test_ds,
                                    batch_size=cfg.get("batch_size_test", 32),
                                    host_id=jax.process_index(),
                                    num_hosts=jax.process_count())
        return grounding_eval_bbox(results, refs) if refs else {"n": len(results)}

    _finetune_common(args, cfg, mesh, model, mcfg, loader, example,
                     eval_fn=eval_fn, metric_key="val_acc" if refs else None)


def run_vqa(args, cfg, mesh):
    from x2vlm_tpu.data import (
        MapLoader, TextPreprocessor, VQAEvalDataset, VQATrainDataset,
        build_tokenizer, vqa_collate,
    )
    from x2vlm_tpu.data import transforms as T
    from x2vlm_tpu.tasks.vqa import evaluate_vqa

    model, mcfg = build_model(cfg, "vqa")
    tokenizer = build_tokenizer(cfg["text_encoder"])
    pre = TextPreprocessor(tokenizer, max_tokens=cfg.get("max_tokens", 40))
    res = cfg["image_res"]
    a_max = cfg.get("answer_max_tokens", 10)
    train_ds = VQATrainDataset(cfg["train_file"], T.train_transform(res),
                               cfg.get("vqa_root", cfg.get("image_root")),
                               pre, tokenizer, answer_max_tokens=a_max)
    test_ds = VQAEvalDataset(cfg["test_file"], T.test_transform(res),
                             cfg.get("vqa_root", cfg.get("image_root")), pre,
                             tokenizer, answer_list_file=cfg.get("answer_list"),
                             answer_max_tokens=a_max)

    answers_per_batch = cfg.get("answers_per_batch",
                                cfg.get("batch_size", 32) * 2)

    class _VQALoader(MapLoader):
        def __iter__(self):
            for batch_samples in self._raw_batches():
                yield vqa_collate(batch_samples, answers_per_batch)

        def _raw_batches(self):
            from x2vlm_tpu.data.loader import batch_indices

            batches = batch_indices(
                len(self.dataset), self.batch_size, shuffle=self.shuffle,
                seed=self.seed, epoch=self.epoch, host_id=self.host_id,
                num_hosts=self.num_hosts, drop_last=self.drop_last)
            for b in batches:
                yield [self.dataset[i] for i in b]

    loader = _VQALoader(train_ds, cfg.get("batch_size", 32),
                        host_id=jax.process_index(),
                        num_hosts=jax.process_count())
    example = vqa_collate([train_ds[0], train_ds[min(1, len(train_ds) - 1)]],
                          answers_per_batch=4)
    example = jax.tree_util.tree_map(jnp.asarray, example)

    def eval_fn(v):
        results = evaluate_vqa(
            model, v, test_ds, test_ds.answer_list, test_ds.answer_ids,
            test_ds.answer_atts, k_test=cfg.get("k_test", 128),
            batch_size=cfg.get("batch_size_test", 32),
            host_id=jax.process_index(), num_hosts=jax.process_count())
        import json as _json

        out = os.path.join(args.output_dir,
                           f"vqa_result_host{jax.process_index()}.json")
        with open(out, "w") as f:
            _json.dump(results, f)
        return {"n": len(results)}

    _finetune_common(args, cfg, mesh, model, mcfg, loader, example,
                     eval_fn=eval_fn)


def run_captioning(args, cfg, mesh):
    from x2vlm_tpu.data import (
        CaptioningEvalDataset, CaptioningTrainDataset, MapLoader, build_tokenizer,
    )
    from x2vlm_tpu.data import transforms as T
    from x2vlm_tpu.evalkit import caption_eval
    from x2vlm_tpu.tasks.captioning import generate_captions

    model, mcfg = build_model(cfg, "captioning")
    tokenizer = build_tokenizer(cfg["text_encoder"])
    res = cfg["image_res"]
    train_ds = CaptioningTrainDataset(
        cfg["train_file"], T.train_transform(res, with_hflip=False),
        cfg["image_root"], tokenizer, prompt=cfg.get("prompt", ""),
        max_tokens=cfg.get("max_tokens", 25), max_masks=cfg.get("max_masks", 12),
        mask_prob=cfg.get("mask_prob", 0.5), fg_free=cfg.get("fg_free", False))
    test_ds = CaptioningEvalDataset(cfg["test_file"], T.test_transform(res),
                                    cfg["image_root"])
    loader = MapLoader(train_ds, cfg.get("batch_size", 16),
                       host_id=jax.process_index(), num_hosts=jax.process_count())
    example = train_ds[0]
    example = {k: jnp.asarray(np.stack([v, v])) for k, v in example.items()}

    anns = None
    if cfg.get("caption_gt_file"):
        import json as _json

        with open(cfg["caption_gt_file"]) as f:
            anns = {int(k): v for k, v in _json.load(f).items()}

    def eval_fn(v):
        results = generate_captions(
            model, v, test_ds, tokenizer, prompt=cfg.get("prompt", ""),
            num_beams=cfg.get("num_beams", 3),
            min_length=cfg.get("min_length", 5),
            max_length=cfg.get("max_length", 20),
            batch_size=cfg.get("batch_size_test", 16),
            host_id=jax.process_index(), num_hosts=jax.process_count())
        return caption_eval(results, anns) if anns else {"n": len(results)}

    _finetune_common(args, cfg, mesh, model, mcfg, loader, example,
                     eval_fn=eval_fn, metric_key="cider" if anns else None)


def run_classification(args, cfg, mesh):
    """Covers XVNLI (image NLI) and video QA over an answer vocabulary
    (VQA_msrvtt/VQA_msvd); dataset kind from config `dataset_type`."""
    import json as _json

    from x2vlm_tpu.data import MapLoader, TextPreprocessor, build_tokenizer
    from x2vlm_tpu.data import transforms as T
    from x2vlm_tpu.tasks.classification import evaluate_classification

    tokenizer = build_tokenizer(cfg["text_encoder"])
    pre = TextPreprocessor(tokenizer, max_tokens=cfg.get("max_tokens", 40))
    res = cfg["image_res"]
    kind = cfg.get("dataset_type", "xvnli")
    if kind == "video_qa":
        from x2vlm_tpu.data.video import VideoQADataset

        with open(cfg["answer_list"]) as f:
            answers = _json.load(f)
        cfg["num_labels"] = len(answers)
        train_ds = VideoQADataset(cfg["train_file"], T.train_transform(res),
                                  cfg["video_root"], pre, answers,
                                  frame_len=cfg.get("frame_len", 5))
        test_ds = VideoQADataset(cfg["test_file"], T.test_transform(res),
                                 cfg["video_root"], pre, answers,
                                 frame_len=cfg.get("frame_len", 5),
                                 training=False)
    else:
        from x2vlm_tpu.data.iglue import XVNLIDataset

        cfg.setdefault("num_labels", 3)
        train_ds = XVNLIDataset(cfg["train_file"], T.train_transform(res),
                                cfg["image_root"], pre)
        test_ds = XVNLIDataset(cfg["test_file"], T.test_transform(res),
                               cfg["image_root"], pre)

    model, mcfg = build_model(cfg, "classification")
    loader = MapLoader(train_ds, cfg.get("batch_size", 32),
                       host_id=jax.process_index(), num_hosts=jax.process_count())
    example = train_ds[0]
    example = {k: jnp.asarray(np.stack([v, v])) for k, v in example.items()}
    eval_fn = lambda v: evaluate_classification(
        model, v, test_ds, batch_size=cfg.get("batch_size_test", 32),
        host_id=jax.process_index(), num_hosts=jax.process_count())
    _finetune_common(args, cfg, mesh, model, mcfg, loader, example,
                     eval_fn=eval_fn, metric_key="accuracy")


def main(argv=None):
    args = parse_args(argv)
    if args.wait:
        print(f"### waiting {args.wait} minutes", flush=True)
        time.sleep(args.wait * 60)
    cfg, mesh = setup(args)
    t0 = time.time()
    runners = {
        "retrieval": run_retrieval,
        "pretrain": run_pretrain,
        "nlvr": run_nlvr,
        "grounding": run_grounding,
        "vqa": run_vqa,
        "captioning": run_captioning,
        "classification": run_classification,
    }
    if args.task not in runners:
        raise SystemExit(f"task {args.task!r}: no CLI runner yet")
    runners[args.task](args, cfg, mesh)
    print(f"total time: {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
