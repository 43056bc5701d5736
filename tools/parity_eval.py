"""One-command released-checkpoint parity harness (VERDICT r3 #6).

The BASELINE accuracy gate — "retrieval R@1 within 0.3 pts of the reference
checkpoints" — cannot be executed in this offline environment (no released
weights, no Flickr30k images). This script makes that gate a one-command
affair the day they are reachable:

    python tools/parity_eval.py \
        --checkpoint x2vlm_base_4m.th \
        --config configs/finetune/retrieval_flickr_base.yaml \
        --annotation flickr30k_test.json --image_root flickr30k-images \
        --paper "txt_r1=<paper>,img_r1=<paper>"

It imports the ``.th`` through the production auto-sniffing converter
(x2vlm_tpu.run.load_initial_params — including BEiT-2 rel-pos interpolation
when image_res differs from the checkpoint), runs the reference's exact
retrieval protocol (ITC shortlist → ITM rerank top k_test,
/root/reference/Retrieval.py:126-215), and prints R@1/5/10 for both
directions next to the paper numbers with the ±0.3 verdict per metric.

Paper numbers are NOT hardcoded: the environment has no network and the
reference repo publishes badges, not numbers (BASELINE.md) — pass them with
``--paper`` from arXiv:2211.12402 when online.

``--selftest`` proves the plumbing end to end with what IS available
offline: it fabricates the tiny golden-torch fixture checkpoint
(tests/golden_torch.GoldenXVLM — reference state-dict naming), a synthetic
image/caption corpus, and a matching tiny config, then runs the identical
import → encode → rerank → R@k path and asserts the report comes out sane.
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GATE_PTS = 0.3   # BASELINE.md accuracy-parity north star

METRICS = ["txt_r1", "txt_r5", "txt_r10", "img_r1", "img_r5", "img_r10",
           "r_mean"]


def parse_paper(spec: str) -> dict:
    out = {}
    for part in filter(None, (spec or "").split(",")):
        k, v = part.split("=")
        out[k.strip()] = float(v)
    return out


def run_eval(args):
    import jax
    import yaml

    from x2vlm_tpu.data.factory import create_dataset
    from x2vlm_tpu.factory import build_model
    from x2vlm_tpu.run import load_initial_params
    from x2vlm_tpu.tasks.retrieval import evaluate_retrieval

    cfg = yaml.safe_load(Path(args.config).read_text())
    if args.annotation:
        cfg["test_file"] = [args.annotation]
    if args.image_root:
        cfg["image_root"] = args.image_root
    if args.image_res:
        cfg["image_res"] = args.image_res
    if args.k_test:
        cfg["k_test"] = args.k_test

    model, _ = build_model(cfg, "retrieval")
    print(f"model built from {args.config} "
          f"(image_res={cfg['image_res']}, k_test={cfg.get('k_test', 128)})",
          flush=True)

    import jax.numpy as jnp
    res = cfg["image_res"]
    ex = {
        "image": jnp.zeros((2, res, res, 3), jnp.float32),
        "text_ids": jnp.zeros((2, cfg.get("max_tokens", 40)), jnp.int32),
        "text_atts": jnp.ones((2, cfg.get("max_tokens", 40)), jnp.int32),
        "idx": jnp.arange(2, dtype=jnp.int32),
    }
    init = jax.jit(lambda r: model.init(
        {"params": r, "dropout": jax.random.PRNGKey(1)}, ex,
        rng=jax.random.PRNGKey(2)))(jax.random.PRNGKey(0))
    variables, _missing = load_initial_params(args, cfg, model, init)

    _, eval_ds = create_dataset("retrieval", cfg, evaluate=True)
    ds = eval_ds[0] if isinstance(eval_ds, (list, tuple)) else eval_ds
    print(f"eval corpus: {ds.n_images()} images / {ds.n_texts()} texts",
          flush=True)

    metrics = evaluate_retrieval(
        model, variables, ds, k_test=cfg.get("k_test", 128),
        batch_images=cfg.get("batch_size_test", 64),
        batch_texts=cfg.get("batch_size_test_text", 256))
    return metrics


def report(metrics: dict, paper: dict) -> bool:
    print(f"\n{'metric':<10} {'ours':>8} {'paper':>8} {'delta':>8}  verdict")
    all_ok, any_paper = True, False
    for key in METRICS:
        if key not in metrics:
            continue
        ours = metrics[key]
        if key in paper:
            any_paper = True
            delta = ours - paper[key]
            ok = bool(abs(delta) <= GATE_PTS or delta > 0)
            all_ok &= ok
            verdict = "OK (within ±0.3 or above)" if ok else "FAIL"
            print(f"{key:<10} {ours:8.2f} {paper[key]:8.2f} {delta:+8.2f}  "
                  f"{verdict}")
        else:
            print(f"{key:<10} {ours:8.2f} {'—':>8} {'—':>8}  (pass --paper "
                  f"{key}=<arXiv:2211.12402> to gate)")
    if not any_paper:
        print("\nno paper numbers supplied — metrics reported ungated")
    return all_ok


# ---------------------------------------------------------------- selftest

def selftest():
    """End-to-end plumbing proof against the golden-torch fixture."""
    import jax

    # tiny fixture model: CPU is faster than a tunnel round-trip and this
    # must be runnable while the shared chip is busy
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import yaml
    from PIL import Image

    sys.path.insert(0, str(REPO / "tests"))
    from golden_torch import GoldenXVLM

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        # tiny reference-named checkpoint
        torch.manual_seed(0)
        golden = GoldenXVLM().eval()
        ckpt = tmp / "golden_x2vlm.th"
        torch.save({"model": golden.state_dict()}, ckpt)

        # corpus: 6 images x 2 captions
        img_dir = tmp / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        ann = []
        words = "dog cat house tree river fox".split()
        for i in range(6):
            Image.fromarray(
                rng.integers(0, 255, (48, 48, 3), np.uint8)).save(
                    img_dir / f"im{i}.png")
            ann.append({"image": f"im{i}.png", "image_id": i,
                        "caption": [f"a {words[i]} one", f"the {words[i]}"]})
        (tmp / "test.json").write_text(json.dumps(ann))

        tok_dir = tmp / "bert-tiny"
        tok_dir.mkdir()
        (tok_dir / "vocab.txt").write_text("\n".join(
            "[PAD] [UNK] [CLS] [SEP] [MASK] a the one dog cat house tree "
            "river fox".split()))
        (tok_dir / "tokenizer_config.json").write_text(json.dumps(
            {"tokenizer_class": "BertTokenizerFast", "do_lower_case": True}))

        # config matching the GoldenXVLM dims (32px/16, 2-layer BEiT-2,
        # 4-layer text stack fused at 2)
        cfg = {
            "test_file": [str(tmp / "test.json")],
            "image_root": str(img_dir),
            "image_res": 32,
            "vision_config_inline": {"vision_width": 32, "patch_size": 16,
                                     "num_hidden_layers": 2,
                                     "num_attention_heads": 2},
            "text_encoder": str(tok_dir),
            "text_num_hidden_layers": 4,
            "text_fusion_start_at": 2,
            "text_config_inline": {"vocab_size": 100, "hidden_size": 32,
                                   "num_heads": 2, "intermediate_size": 64,
                                   "hidden_dropout": 0.0, "attn_dropout": 0.0,
                                   "max_position_embeddings": 64},
            "embed_dim": 16,
            "max_tokens": 10,
            "k_test": 16,   # > corpus: every candidate gets ITM-reranked
            "batch_size_test": 4,
            "batch_size_test_text": 8,
        }
        cfg_path = tmp / "cfg.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))

        args = argparse.Namespace(
            checkpoint=str(ckpt), config=str(cfg_path), annotation=None,
            image_root=None, image_res=None, k_test=None)
        metrics = run_eval(args)
        ok = report(metrics, parse_paper("txt_r1=50,img_r1=50"))

        for key in METRICS:
            assert key in metrics, f"missing metric {key}"
            assert 0.0 <= metrics[key] <= 100.0, (key, metrics[key])
        # 6-image corpus ⇒ every correct image ranks within the top 6 < 10
        assert metrics["img_r10"] == 100.0
        assert isinstance(ok, bool)
        print("\nSELFTEST OK — import → encode → rerank → R@k plumbing green")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", help="released .th (or orbax dir)")
    ap.add_argument("--config",
                    default="configs/finetune/retrieval_flickr_base.yaml")
    ap.add_argument("--annotation", help="override test_file")
    ap.add_argument("--image_root", help="override image_root")
    ap.add_argument("--image_res", type=int)
    ap.add_argument("--k_test", type=int)
    ap.add_argument("--paper", default="",
                    help="comma list, e.g. txt_r1=97.4,img_r1=90.0 "
                         "(from arXiv:2211.12402)")
    ap.add_argument("--selftest", action="store_true",
                    help="offline plumbing proof vs the golden-torch fixture")
    args = ap.parse_args()

    if args.selftest:
        selftest()
        return
    if not args.checkpoint:
        ap.error("--checkpoint is required (or use --selftest)")
    metrics = run_eval(args)
    ok = report(metrics, parse_paper(args.paper))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
