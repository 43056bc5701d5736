"""CLI smoke: config-driven retrieval train + eval through x2vlm_tpu.run.main."""

import json

import jax
import numpy as np
import pytest
import yaml
from PIL import Image

from x2vlm_tpu.factory import build_model, xvlm_config_from_yaml
from x2vlm_tpu.models.xvlm_plus import XVLMPlusConfig

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a b c d e dog cat runs the quick brown fox "
    "jump ##s ##ing over lazy river bank small big red blue green house tree"
).split()


def _write_vocab_dir(d):
    """A local HF-loadable bert tokenizer directory."""
    tok_dir = d / "bert-tiny"
    tok_dir.mkdir(exist_ok=True)
    (tok_dir / "vocab.txt").write_text("\n".join(VOCAB))
    (tok_dir / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "BertTokenizerFast", "do_lower_case": True}))
    return str(tok_dir)


def test_factory_from_yaml(tmp_path):
    cfg = {
        "image_res": 32,
        "vision_config_inline": {"vision_width": 32, "patch_size": 16,
                                 "num_hidden_layers": 2,
                                 "num_attention_heads": 2},
        "text_encoder": "bert-tiny",
        "text_num_hidden_layers": 4,
        "text_fusion_start_at": 2,
        "text_config_inline": {"vocab_size": 31, "hidden_size": 32,
                               "num_heads": 2, "intermediate_size": 64,
                               "hidden_dropout": 0.0, "attn_dropout": 0.0},
        "embed_dim": 16,
    }
    mcfg = xvlm_config_from_yaml(cfg)
    assert mcfg.vision.depth == 2
    assert mcfg.text.num_layers == 4
    assert mcfg.text.encoder_width == 32
    for task in ("pretrain", "retrieval", "vqa", "nlvr", "grounding",
                 "captioning"):
        model, _ = build_model(cfg, task)
        assert model is not None
    plus_cfg = dict(cfg, model_type="cclm", num_cross_layers=2)
    mcfg2 = xvlm_config_from_yaml(plus_cfg)
    assert isinstance(mcfg2, XVLMPlusConfig)


@pytest.mark.slow
def test_cli_retrieval_end_to_end(tmp_path):
    from x2vlm_tpu.run import main

    tok_dir = _write_vocab_dir(tmp_path)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    ann = []
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"im{i}.png")
        ann.append({"image": f"im{i}.png", "image_id": i,
                    "caption": [f"the dog {i}"]})
    (tmp_path / "ann.json").write_text(json.dumps(ann))

    cfg = {
        "train_file": [str(tmp_path / "ann.json")],
        "test_file": [str(tmp_path / "ann.json")],
        "image_root": str(img_dir),
        "image_res": 32,
        "vision_config_inline": {"vision_width": 32, "patch_size": 16,
                                 "num_hidden_layers": 2,
                                 "num_attention_heads": 2},
        "text_encoder": str(tok_dir),  # contains 'bert' → BERT family
        "text_num_hidden_layers": 4,
        "text_fusion_start_at": 2,
        "text_config_inline": {"vocab_size": 31, "hidden_size": 32,
                               "num_heads": 2, "intermediate_size": 64,
                               "hidden_dropout": 0.0, "attn_dropout": 0.0},
        "embed_dim": 16,
        "max_tokens": 10,
        "k_test": 3,
        "batch_size": 8,
        "optimizer": {"lr": 1e-3, "weight_decay": 0.01},
        "schedular": {"epochs": 1, "num_warmup_steps": 0},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "out"

    main(["--task", "retrieval", "--config", str(cfg_path),
          "--output_dir", str(out_dir), "--seed", "0"])

    log = (out_dir / "log.txt").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert "eval_r_mean" in rec
    assert (out_dir / "config.yaml").exists()


def _tiny_model_cfg(tok_dir):
    return {
        "image_res": 32,
        "vision_config_inline": {"vision_width": 32, "patch_size": 16,
                                 "num_hidden_layers": 2,
                                 "num_attention_heads": 2},
        "text_encoder": str(tok_dir),
        "text_num_hidden_layers": 4,
        "text_fusion_start_at": 2,
        "text_config_inline": {"vocab_size": 31, "hidden_size": 32,
                               "num_heads": 2, "intermediate_size": 64,
                               "hidden_dropout": 0.0, "attn_dropout": 0.0},
        "embed_dim": 16,
        "max_tokens": 10,
        "batch_size": 8,
        "optimizer": {"lr": 1e-3, "weight_decay": 0.01},
        "schedular": {"epochs": 1, "num_warmup_steps": 0},
    }


@pytest.mark.slow
def test_cli_nlvr_and_grounding(tmp_path):
    from x2vlm_tpu.run import main

    tok_dir = _write_vocab_dir(tmp_path)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"im{i}.png")

    nlvr_ann = [{"images": [f"im{i}.png", f"im{(i+1) % 8}.png"],
                 "sentence": "the dog runs",
                 "label": "True" if i % 2 else "False"} for i in range(8)]
    (tmp_path / "nlvr.json").write_text(json.dumps(nlvr_ann))
    cfg = _tiny_model_cfg(tok_dir)
    cfg.update({"train_file": [str(tmp_path / "nlvr.json")],
                "test_file": [str(tmp_path / "nlvr.json")],
                "image_root": str(img_dir), "batch_size_test": 4})
    (tmp_path / "nlvr.yaml").write_text(yaml.safe_dump(cfg))
    main(["--task", "nlvr", "--config", str(tmp_path / "nlvr.yaml"),
          "--output_dir", str(tmp_path / "out_nlvr"), "--seed", "0"])
    rec = json.loads((tmp_path / "out_nlvr" / "log.txt").read_text()
                     .strip().splitlines()[-1])
    assert "eval_accuracy" in rec

    ground_ann = [{"image": f"im{i}.png", "text": "small red house",
                   "bbox": [8, 8, 16, 16], "ref_id": i} for i in range(8)]
    (tmp_path / "ground.json").write_text(json.dumps(ground_ann))
    refs = {str(i): {"split": "val", "bbox": [8, 8, 16, 16],
                     "width": 40, "height": 40} for i in range(8)}
    (tmp_path / "refs.json").write_text(json.dumps(refs))
    cfg = _tiny_model_cfg(tok_dir)
    cfg.update({"train_file": [str(tmp_path / "ground.json")],
                "test_file": [str(tmp_path / "ground.json")],
                "refs_file": str(tmp_path / "refs.json"),
                "image_root": str(img_dir), "batch_size_test": 4})
    (tmp_path / "ground.yaml").write_text(yaml.safe_dump(cfg))
    main(["--task", "grounding", "--config", str(tmp_path / "ground.yaml"),
          "--output_dir", str(tmp_path / "out_ground"), "--seed", "0"])
    rec = json.loads((tmp_path / "out_ground" / "log.txt").read_text()
                     .strip().splitlines()[-1])
    assert "eval_val_acc" in rec


@pytest.mark.slow
def test_cli_vqa_and_captioning(tmp_path):
    from x2vlm_tpu.run import main

    tok_dir = _write_vocab_dir(tmp_path)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"im{i}.png")

    vqa_ann = [{"image": f"im{i}.png", "question": "the dog or cat",
                "answer": ["dog"], "question_id": i} for i in range(8)]
    (tmp_path / "vqa.json").write_text(json.dumps(vqa_ann))
    (tmp_path / "answers.json").write_text(json.dumps(["dog", "cat", "fox"]))
    cfg = _tiny_model_cfg(tok_dir)
    cfg.update({"train_file": [str(tmp_path / "vqa.json")],
                "test_file": [str(tmp_path / "vqa.json")],
                "answer_list": str(tmp_path / "answers.json"),
                "image_root": str(img_dir), "vqa_root": str(img_dir),
                "num_dec_layers": 2, "k_test": 2, "batch_size_test": 4,
                "answer_max_tokens": 5})
    (tmp_path / "vqa.yaml").write_text(yaml.safe_dump(cfg))
    main(["--task", "vqa", "--config", str(tmp_path / "vqa.yaml"),
          "--output_dir", str(tmp_path / "out_vqa"), "--seed", "0"])
    rec = json.loads((tmp_path / "out_vqa" / "log.txt").read_text()
                     .strip().splitlines()[-1])
    results = json.loads((tmp_path / "out_vqa" / "vqa_result.json").read_text())
    assert len(results) == 8
    assert all(r["answer"] in ("dog", "cat", "fox") for r in results)
    # the test split carries answers → official-protocol accuracy and the
    # exact-match acc are computed and wired into the log (VQA.py:94-116)
    assert "eval_overall" in rec and 0.0 <= rec["eval_overall"] <= 100.0
    assert "eval_acc" in rec and 0.0 <= rec["eval_acc"] <= 100.0
    # regression: every fine-tune epoch writes a checkpoint
    # (tasks/finetune.py save path)
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(str(tmp_path / "out_vqa" / "ckpt")) as mgr:
        assert mgr.latest_step() is not None

    cap_ann = [{"image": f"im{i}.png", "caption": ["the quick brown fox runs"],
                "image_id": i} for i in range(8)]
    (tmp_path / "cap.json").write_text(json.dumps(cap_ann))
    gt = {str(i): ["the quick brown fox runs"] for i in range(8)}
    (tmp_path / "cap_gt.json").write_text(json.dumps(gt))
    cfg = _tiny_model_cfg(tok_dir)
    cfg.update({"train_file": [str(tmp_path / "cap.json")],
                "test_file": [str(tmp_path / "cap.json")],
                "caption_gt_file": str(tmp_path / "cap_gt.json"),
                "image_root": str(img_dir), "max_tokens": 12, "max_masks": 3,
                "num_beams": 2, "min_length": 1, "max_length": 5,
                "batch_size_test": 4})
    (tmp_path / "cap.yaml").write_text(yaml.safe_dump(cfg))
    main(["--task", "captioning", "--config", str(tmp_path / "cap.yaml"),
          "--output_dir", str(tmp_path / "out_cap"), "--seed", "0"])
    rec = json.loads((tmp_path / "out_cap" / "log.txt").read_text()
                     .strip().splitlines()[-1])
    assert "eval_cider" in rec


@pytest.mark.slow
def test_cli_retrieval_cclm_plus_base(tmp_path):
    """model_type: cclm routes every head onto the Plus base (XLM-R-style
    text tower + standalone cross encoder) through the same CLI."""
    from x2vlm_tpu.run import main

    tok_dir = _write_vocab_dir(tmp_path)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    ann = []
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"im{i}.png")
        ann.append({"image": f"im{i}.png", "image_id": i,
                    "caption": [f"the dog {i}"]})
    (tmp_path / "ann.json").write_text(json.dumps(ann))

    cfg = _tiny_model_cfg(tok_dir)
    cfg.update({
        "model_type": "cclm",
        "num_cross_layers": 2,
        "text_num_hidden_layers": 2,
        "text_fusion_start_at": 2,   # text tower fully uni-modal
        "train_file": [str(tmp_path / "ann.json")],
        "test_file": [str(tmp_path / "ann.json")],
        "image_root": str(img_dir),
        "k_test": 3,
    })
    (tmp_path / "cclm.yaml").write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "out_cclm"
    main(["--task", "retrieval", "--config", str(tmp_path / "cclm.yaml"),
          "--output_dir", str(out_dir), "--seed", "0"])
    rec = json.loads((out_dir / "log.txt").read_text().strip().splitlines()[-1])
    assert "eval_r_mean" in rec


def test_cli_captioning_scst(tmp_path):
    """scst: true switches the captioning runner to the self-critical loop
    (rollout sampling + CIDEr-D advantages + policy-gradient steps)."""
    from x2vlm_tpu.run import main

    tok_dir = _write_vocab_dir(tmp_path)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    cap_ann = []
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"im{i}.png")
        cap_ann.append({"image": f"im{i}.png",
                        "caption": ["the quick brown fox runs"],
                        "image_id": i})
    (tmp_path / "cap.json").write_text(json.dumps(cap_ann))
    cfg = _tiny_model_cfg(tok_dir)
    cfg.update({"train_file": [str(tmp_path / "cap.json")],
                "test_file": [str(tmp_path / "cap.json")],
                "image_root": str(img_dir), "max_tokens": 12, "max_masks": 3,
                "min_length": 1, "max_length": 4, "scst": True,
                "batch_size_scst": 2, "scst_num_samples": 2,
                "schedular": {"epochs": 1, "lr": 1e-5}})
    (tmp_path / "scst.yaml").write_text(yaml.safe_dump(cfg))
    main(["--task", "captioning", "--config", str(tmp_path / "scst.yaml"),
          "--output_dir", str(tmp_path / "out_scst"), "--seed", "0"])
    rec = json.loads((tmp_path / "out_scst" / "log.txt").read_text()
                     .strip().splitlines()[-1])
    assert "loss_scst" in rec or "epoch" in rec
    assert (tmp_path / "out_scst" / "ckpt").exists()


@pytest.mark.slow
def test_cli_accumulation_step_math_and_pick_best(tmp_path):
    """Runner-level accumulate_steps semantics (round-3 VERDICT weak #1):
    accumulate_steps is a memory knob — ONE optimizer step per loader batch,
    and the LR schedule is sized to len(loader)*epochs. With min_rate=0 and
    no warmup, the last epoch's steps must still have LR > 0, i.e. the
    params must move between the epoch-0 and epoch-1 checkpoints (the old
    steps_per_epoch = len//accum bug zeroed the LR for the whole second
    half). Also covers pick_best_t2v: best-checkpoint tracking keys on
    img_r_mean (reference --pick_best_t2v, run.py:162, Retrieval.py:367,435).
    """
    from x2vlm_tpu.run import main
    from x2vlm_tpu.train import checkpoint as ckpt_lib

    tok_dir = _write_vocab_dir(tmp_path)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    ann = []
    for i in range(32):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"im{i}.png")
        ann.append({"image": f"im{i}.png", "image_id": i,
                    "caption": [f"the dog {i}"]})
    (tmp_path / "ann.json").write_text(json.dumps(ann))

    cfg = _tiny_model_cfg(tok_dir)
    cfg.update({
        "train_file": [str(tmp_path / "ann.json")],
        "test_file": [str(tmp_path / "ann.json")],
        "image_root": str(img_dir),
        "k_test": 3,
        "batch_size": 16,           # 32 samples → 2 optimizer steps/epoch
        "accumulate_steps": 2,      # microbatch 8 (one per virtual device)
        "pick_best_t2v": True,
        "optimizer": {"lr": 1e-3, "weight_decay": 0.01},
        "schedular": {"epochs": 2, "num_warmup_steps": 0},
    })
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "out"
    main(["--task", "retrieval", "--config", str(cfg_path),
          "--output_dir", str(out_dir), "--seed", "0"])

    ckpt_dir = str(out_dir / "ckpt")
    # (a) one optimizer step per loader batch: 2 epochs × 2 batches = step 4
    final, step = ckpt_lib.restore_train_state(ckpt_dir, None)
    assert step == 4, step
    # (b) LR at the last steps > 0 → epoch 1 moved the params
    epoch0, _ = ckpt_lib.restore_train_state(ckpt_dir, None, step=2)
    p0 = jax.tree_util.tree_leaves(epoch0["params"])
    p1 = jax.tree_util.tree_leaves(final["params"])
    moved = any(float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
                for a, b in zip(p0, p1))
    assert moved, "second epoch trained at LR == 0 (schedule sized to half)"
    # pick_best_t2v: best tracking keyed on img_r_mean → eval logs it and
    # the best-checkpoint dir exists
    log = (out_dir / "log.txt").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert "eval_img_r_mean" in rec
    assert (out_dir / "ckpt_best").exists()

    # --resume with nothing left to do: start_epoch = 4 // 2 = 2 == epochs,
    # so no extra optimizer steps run (the old math skipped/redid epochs)
    main(["--task", "retrieval", "--config", str(cfg_path),
          "--output_dir", str(out_dir), "--seed", "0", "--resume"])
    _, step2 = ckpt_lib.restore_train_state(ckpt_dir, None)
    assert step2 == 4, step2


@pytest.mark.slow
def test_cli_grounding_vlue_eval(tmp_path):
    """`vlue_test: true` routes eval through grounding_eval_bbox_vlue using
    the test json's own bbox/width/height annotations (reference
    Grounding_bbox.py:154-155)."""
    from x2vlm_tpu.run import main

    tok_dir = _write_vocab_dir(tmp_path)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"im{i}.png")
    ann = [{"image": f"im{i}.png", "text": "small red house", "ref_id": i,
            "bbox": [8, 8, 16, 16], "width": 40, "height": 40}
           for i in range(4)]
    (tmp_path / "vlue.json").write_text(json.dumps(ann))
    cfg = _tiny_model_cfg(tok_dir)
    cfg.update({"train_file": [str(tmp_path / "vlue.json")],
                "test_file": str(tmp_path / "vlue.json"),
                "vlue_test": True,
                "image_root": str(img_dir), "batch_size_test": 4})
    (tmp_path / "vlue.yaml").write_text(yaml.safe_dump(cfg))
    main(["--task", "grounding", "--config", str(tmp_path / "vlue.yaml"),
          "--output_dir", str(tmp_path / "out"), "--seed", "0",
          "--evaluate"])
    rec = json.loads((tmp_path / "out" / "log.txt").read_text()
                     .strip().splitlines()[-1])
    assert "score" in rec["eval"] and 0.0 <= rec["eval"]["score"] <= 1.0


def test_fewshot_path_templating(tmp_path):
    """--fewshot ar,25 fills '{}' templates: one slot gets the joined string
    (MARVL.py:247, XGQA.py:313), two slots get (lang, shots) (XVNLI.py:266),
    and eval files get the language alone (XVNLI.py:268)."""
    from x2vlm_tpu.run import parse_args, setup

    cfg = {
        "image_res": 32,
        "train_file": ["data/marvl_fewshot/{}.json",
                       "data/xvnli_train_{}_{}.json"],
        "test_file": "data/xvnli_val_{}.json",
        "text_encoder": "bert-tiny",
    }
    p = tmp_path / "fs.yaml"
    p.write_text(yaml.safe_dump(cfg))
    args = parse_args(["--task", "nlvr", "--config", str(p),
                       "--output_dir", str(tmp_path / "out"),
                       "--fewshot", "ar,25"])
    out, _ = setup(args)
    assert out["train_file"] == ["data/marvl_fewshot/ar,25.json",
                                 "data/xvnli_train_ar_25.json"]
    assert out["test_file"] == "data/xvnli_val_ar.json"


def test_cli_override_flags(tmp_path):
    """--lr/--k_test/--num_workers/--pick_best_r1/--gmt reach the config
    (reference run.py:452-463)."""
    from x2vlm_tpu.run import parse_args, setup

    cfg = {"image_res": 32, "k_test": 32,
           "test_file": "plain.json", "gmt_test_file": "gmt.json",
           "images": {"batch_size": 8, "num_workers": 2},
           "optimizer": {"lr": 1e-4}, "schedular": {"lr": 1e-4}}
    p = tmp_path / "ov.yaml"
    p.write_text(yaml.safe_dump(cfg))
    args = parse_args(["--task", "retrieval", "--config", str(p),
                       "--output_dir", str(tmp_path / "out"),
                       "--lr", "3e-5", "--k_test", "64",
                       "--num_workers", "7", "--pick_best_r1", "--gmt"])
    out, _ = setup(args)
    assert out["optimizer"]["lr"] == 3e-5 and out["schedular"]["lr"] == 3e-5
    assert out["k_test"] == 64
    assert out["images"]["num_workers"] == 7
    assert out["pick_best_r1"] is True
    assert out["test_file"] == "gmt.json"
