"""Export a serving bundle (AOT StableHLO + weights) for
retrieval / captioning / vqa / grounding.

    python tools/export_serving.py --config configs/finetune/retrieval_flickr_base.yaml \
        --checkpoint ckpt.th --out bundle/ [--batch_images 64] [--batch_texts 256] \
        [--platform tpu]

Produces bundle/{manifest.json, params.npz, encode_images.jexp,
encode_texts.jexp, itm_score.jexp} — see x2vlm_tpu/serving.py. `--selftest`
exports a tiny CPU bundle into a temp dir, reloads it, and cross-checks the
three programs against direct model.apply outputs.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def selftest() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from x2vlm_tpu.models import BEiT2Config, BertConfig, XVLMConfig
    from x2vlm_tpu.models.heads import XVLMForRetrieval
    from x2vlm_tpu.serving import export_retrieval_bundle, load_bundle

    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32),
        embed_dim=16)
    model = XVLMForRetrieval(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 31, (4, 8)), jnp.int32)
    atts = jnp.ones((4, 8), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {"image": image, "text_ids": ids[:2], "text_atts": atts[:2],
         "idx": jnp.zeros((2,), jnp.int32)}, rng=jax.random.PRNGKey(2))

    with tempfile.TemporaryDirectory() as d:
        export_retrieval_bundle(model, variables, d, batch_images=2,
                                batch_texts=4, max_tokens=8, rerank_pairs=2,
                                platforms=["cpu"])
        b = load_bundle(d)
        ie, feat_i = b.encode_images(image)
        te, feat_t = b.encode_texts(ids, atts)
        ie0, feat_i0 = model.apply(variables, image,
                                   method=model.encode_images)
        np.testing.assert_allclose(np.asarray(ie), np.asarray(ie0),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(feat_i), np.asarray(feat_i0),
                                   atol=1e-6)
        s = b.itm_score(ie, te[:2], atts[:2])
        s0 = model.apply(variables, ie0, te[:2], atts[:2],
                         method=model.itm_score)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s0), atol=1e-6)
    print("serving selftest OK: export -> reload -> outputs match model.apply")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--selftest", action="store_true")
    ap.add_argument("--task", default="retrieval",
                    choices=("retrieval", "captioning", "vqa", "grounding"))
    ap.add_argument("--config")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--out")
    ap.add_argument("--batch_images", type=int, default=64)
    ap.add_argument("--batch_texts", type=int, default=256)
    ap.add_argument("--rerank_pairs", type=int, default=0)
    ap.add_argument("--k_test", type=int, default=128, help="vqa rank depth")
    ap.add_argument("--n_answers", type=int, default=3128,
                    help="vqa answer-vocabulary rows (VQAv2 list = 3128)")
    ap.add_argument("--platform", default="",
                    help="export platform (tpu|cpu|...); default = current")
    ap.add_argument("--mesh", type=int, default=0,
                    help="export for N-device data-parallel serving "
                         "(retrieval only; batch_* become GLOBAL batches)")
    args = ap.parse_args()
    if args.selftest:
        sys.exit(selftest())
    assert args.config and args.out, "--config and --out required"

    import argparse as _ap

    import jax

    if args.platform:
        # also RUN on the export platform: the axon (TPU-tunnel) plugin wins
        # over env vars, and exporting a cpu artifact must not wait on the
        # shared tunnel (see CLAUDE.md)
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from x2vlm_tpu.core.config import load_config
    from x2vlm_tpu.factory import build_model
    from x2vlm_tpu.run import load_initial_params

    cfg = load_config(args.config)
    res = cfg["image_res"]
    mt = cfg.get("max_tokens", 40)
    platforms = [args.platform] if args.platform else None

    if args.task == "captioning":
        from x2vlm_tpu.data import build_tokenizer
        from x2vlm_tpu.serving import export_captioning_bundle

        tok = build_tokenizer(cfg["text_encoder"])
        model, mcfg = build_model(cfg, "captioning")
        prompt_ids = tok.convert_tokens_to_ids(
            [tok.cls_token] + (tok.tokenize(cfg["prompt"])
                               if cfg.get("prompt") else []))
        L = cfg.get("max_length", 20) + len(prompt_ids) + 1
        tril = jnp.tril(jnp.ones((L, L), jnp.int32))
        example = {
            "image": jnp.zeros((2, res, res, 3)),
            "text_ids_masked": jnp.zeros((2, L), jnp.int32),
            "text_atts_matrix": jnp.tile(tril, (2, 1, 1)),
            "position_ids": jnp.tile(jnp.arange(L), (2, 1)),
            "masked_pos": jnp.zeros((2, 3), jnp.int32),
            "masked_ids": jnp.zeros((2, 3), jnp.int32),
            "masked_weight": jnp.ones((2, 3), jnp.float32),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, example)
        variables, _ = load_initial_params(
            _ap.Namespace(checkpoint=args.checkpoint), cfg, model, variables)
        path = export_captioning_bundle(
            model, variables, args.out, batch=args.batch_images,
            prompt_ids=prompt_ids, mask_token_id=tok.mask_token_id,
            eos_token_id=tok.sep_token_id,
            num_beams=cfg.get("num_beams", 3),
            min_length=cfg.get("min_length", 5),
            max_length=cfg.get("max_length", 20),
            platforms=platforms, config_echo=dict(cfg))
        print(f"exported beam_search -> {path}")
        return

    if args.task == "vqa":
        from x2vlm_tpu.serving import export_vqa_bundle

        model, mcfg = build_model(cfg, "vqa")
        a_max = cfg.get("answer_max_tokens", 10)
        example = {
            "image": jnp.zeros((2, res, res, 3)),
            "question_ids": jnp.zeros((2, mt), jnp.int32),
            "question_atts": jnp.ones((2, mt), jnp.int32),
            "answer_ids": jnp.zeros((2, a_max), jnp.int32),
            "answer_atts": jnp.ones((2, a_max), jnp.int32),
            "answer_weights": jnp.ones((2,), jnp.float32),
            "answer_index": jnp.zeros((2,), jnp.int32),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, example)
        variables, _ = load_initial_params(
            _ap.Namespace(checkpoint=args.checkpoint), cfg, model, variables)
        path = export_vqa_bundle(
            model, variables, args.out, batch=args.batch_images,
            question_len=mt, n_answers=args.n_answers, answer_len=a_max,
            k_test=args.k_test, platforms=platforms, config_echo=dict(cfg))
        print(f"exported rank_answers -> {path}")
        return

    if args.task == "grounding":
        from x2vlm_tpu.serving import export_grounding_bundle

        model, mcfg = build_model(cfg, "grounding")
        example = {
            "image": jnp.zeros((2, res, res, 3)),
            "text_ids": jnp.zeros((2, mt), jnp.int32),
            "text_atts": jnp.ones((2, mt), jnp.int32),
            "target_bbox": jnp.full((2, 4), 0.5, jnp.float32),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, example)
        variables, _ = load_initial_params(
            _ap.Namespace(checkpoint=args.checkpoint), cfg, model, variables)
        path = export_grounding_bundle(
            model, variables, args.out, batch=args.batch_images,
            max_tokens=mt, platforms=platforms, config_echo=dict(cfg))
        print(f"exported predict_bbox -> {path}")
        return

    model, mcfg = build_model(cfg, "retrieval")
    example = {
        "image": jnp.zeros((2, res, res, 3)),
        "text_ids": jnp.zeros((2, mt), jnp.int32),
        "text_atts": jnp.ones((2, mt), jnp.int32),
        "idx": jnp.zeros((2,), jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        example, rng=jax.random.PRNGKey(2))
    variables, _ = load_initial_params(
        _ap.Namespace(checkpoint=args.checkpoint), cfg, model, variables)

    from x2vlm_tpu.serving import export_retrieval_bundle

    mesh = None
    if args.mesh > 1:
        import numpy as _np
        from jax.sharding import Mesh

        mesh = Mesh(_np.array(jax.devices()[:args.mesh]).reshape(args.mesh),
                    ("data",))
    arts = export_retrieval_bundle(
        model, variables, args.out,
        batch_images=args.batch_images, batch_texts=args.batch_texts,
        max_tokens=mt, rerank_pairs=args.rerank_pairs or None,
        platforms=platforms, mesh=mesh, config_echo=dict(cfg))
    print(f"exported {sorted(arts)} -> {args.out}")


if __name__ == "__main__":
    main()
