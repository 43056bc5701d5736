"""CLI end-to-end coverage for the task routes added for reference parity:
xretrieval / wit / xflickrco (Plus retrieval), marvl, xgqa, xvnli,
CCLM pretraining (multilingual image + aux + parallel-text streams),
--resume, and --fsdp.

Reference anchors: XRetrieval.py:262, WIT.py:251, xFlickrCO.py:251,
MARVL.py:134, XGQA.py:181, XVNLI.py, Pretrain.py:330-354.
"""

import base64
import io
import json

import numpy as np
import pytest
import yaml
from PIL import Image

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a b c d e dog cat runs the quick brown fox "
    "jump ##s ##ing over lazy river bank small big red blue green house tree"
).split()


def _b64_image(rng, w=40, h=40):
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Shared tiny corpus: images + per-task annotation files."""
    d = tmp_path_factory.mktemp("cli_tasks")
    tok_dir = d / "bert-tiny"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(VOCAB))
    (tok_dir / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "BertTokenizerFast", "do_lower_case": True}))

    img_dir = d / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        arr = rng.integers(0, 255, (40, 40, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
    return d, str(tok_dir), str(img_dir)


def _model_cfg(tok_dir, **extra):
    cfg = {
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
        "batch_size_test": 4,
        "optimizer": {"lr": 1e-3, "weight_decay": 0.01},
        "schedular": {"epochs": 1, "num_warmup_steps": 0},
    }
    cfg.update(extra)
    return cfg


def _cclm_cfg(tok_dir, **extra):
    cfg = _model_cfg(tok_dir, model_type="cclm", num_cross_layers=2,
                     text_num_hidden_layers=2, text_fusion_start_at=2)
    cfg.update(extra)
    return cfg


def _run(d, name, cfg, task, extra_args=()):
    from x2vlm_tpu.run import main

    cfg_path = d / f"{name}.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = d / f"out_{name}"
    main(["--task", task, "--config", str(cfg_path),
          "--output_dir", str(out), "--seed", "0", *extra_args])
    return out


def _last_record(out_dir):
    lines = (out_dir / "log.txt").read_text().strip().splitlines()
    return json.loads(lines[-1])


@pytest.mark.slow
def test_cli_marvl_dict_testsets(corpus):
    """MARVL: NLVR2 English training, per-language zero-shot eval — 'en' uses
    NLVR annotations + image_root, others self-contained MARVL jsonl."""
    d, tok_dir, img_dir = corpus
    nlvr_ann = [{"images": [f"im{i}.png", f"im{(i + 1) % 8}.png"],
                 "sentence": "the dog runs",
                 "label": "True" if i % 2 else "False"} for i in range(8)]
    (d / "nlvr.json").write_text(json.dumps(nlvr_ann))
    with open(d / "marvl_tr.jsonl", "w") as f:
        for i in range(6):
            f.write(json.dumps({
                "left_img": f"{img_dir}/im{i}.png",
                "right_img": f"{img_dir}/im{(i + 2) % 8}.png",
                "caption": "the red house", "label": bool(i % 2)}) + "\n")

    cfg = _cclm_cfg(tok_dir,
                    train_file=[str(d / "nlvr.json")],
                    test_file={"en": [str(d / "nlvr.json")],
                               "tr": [str(d / "marvl_tr.jsonl")]},
                    image_root=img_dir)
    out = _run(d, "marvl", cfg, "marvl")
    rec = _last_record(out)
    assert "eval_en_accuracy" in rec and "eval_tr_accuracy" in rec
    assert "eval_accuracy" in rec  # language-mean for best tracking


@pytest.mark.slow
def test_cli_xvnli(corpus):
    d, tok_dir, img_dir = corpus
    with open(d / "xvnli.jsonl", "w") as f:
        labels = ["contradiction", "entailment", "neutral"]
        for i in range(8):
            f.write(json.dumps({"Flikr30kID": f"im{i}",
                                "sentence2": "a small dog",
                                "gold_label": labels[i % 3]}) + "\n")
    cfg = _cclm_cfg(tok_dir,
                    train_file=[str(d / "xvnli.jsonl")],
                    test_file={"en": [str(d / "xvnli.jsonl")],
                               "fr": [str(d / "xvnli.jsonl")]},
                    image_root=img_dir)
    out = _run(d, "xvnli", cfg, "xvnli")
    rec = _last_record(out)
    assert "eval_en_accuracy" in rec and "eval_fr_accuracy" in rec


@pytest.mark.slow
def test_cli_xgqa_per_language_answers(corpus):
    """XGQA: VQA ranking protocol; test dict carries per-language
    (annotations, answer_list) pairs (reference dataset/__init__.py:296-299)."""
    d, tok_dir, img_dir = corpus
    vqa_ann = [{"image": f"im{i}.png", "question": "the dog or cat",
                "answer": ["dog"], "question_id": i} for i in range(8)]
    (d / "xgqa.json").write_text(json.dumps(vqa_ann))
    (d / "answers_en.json").write_text(json.dumps(["dog", "cat", "fox"]))
    (d / "answers_de.json").write_text(json.dumps(["dog", "cat"]))
    cfg = _cclm_cfg(tok_dir,
                    train_file=[str(d / "xgqa.json")],
                    test_file={"en": [str(d / "xgqa.json")],
                               "de": [str(d / "xgqa.json"),
                                      str(d / "answers_de.json")]},
                    answer_list=str(d / "answers_en.json"),
                    image_root=img_dir, vqa_root=img_dir,
                    num_dec_layers=2, k_test=2, answer_max_tokens=5)
    out = _run(d, "xgqa", cfg, "xgqa")
    rec = _last_record(out)
    assert rec["eval_en_n"] == 8 and rec["eval_de_n"] == 8
    # per-language exact-match accuracies + their mean (best-model metric)
    assert "eval_en_acc" in rec and "eval_de_acc" in rec and "eval_acc" in rec
    res = json.loads((out / "vqa_result_de_host0.json").read_text())
    assert all(r["answer"] in ("dog", "cat") for r in res)


@pytest.mark.slow
def test_cli_wit_and_xflickrco(corpus):
    d, tok_dir, img_dir = corpus
    rng = np.random.default_rng(1)
    with open(d / "wit.jsonl", "w") as f:
        for i in range(8):
            f.write(json.dumps({
                "image_content": _b64_image(rng),
                "caption_reference_description": f"the green tree {i}"}) + "\n")
    cfg = _model_cfg(tok_dir, train_file=[str(d / "wit.jsonl")],
                     test_file=[str(d / "wit.jsonl")], k_test=3)
    out = _run(d, "wit", cfg, "wit")
    assert "eval_r_mean" in _last_record(out)

    with open(d / "xflickrco.jsonl", "w") as f:
        for i in range(8):
            f.write(json.dumps({"id": i, "img_path": f"im{i}.png",
                                "sentences": [f"the blue river {i}"]}) + "\n")
    cfg = _model_cfg(tok_dir, train_file=[str(d / "xflickrco.jsonl")],
                     test_file=[str(d / "xflickrco.jsonl")],
                     image_root=img_dir, k_test=3)
    out = _run(d, "xflickrco", cfg, "xflickrco")
    assert "eval_r_mean" in _last_record(out)


@pytest.mark.slow
def test_cli_xretrieval_multilingual_eval(corpus):
    """XRetrieval: standard retrieval classes, {lang: file} test dict with a
    language-averaged r_mean (reference XRetrieval.py per-language loop)."""
    d, tok_dir, img_dir = corpus
    ann = [{"image": f"im{i}.png", "image_id": i, "caption": [f"the dog {i}"]}
           for i in range(8)]
    (d / "xre.json").write_text(json.dumps(ann))
    cfg = _model_cfg(tok_dir, train_file=[str(d / "xre.json")],
                     test_file={"en": [str(d / "xre.json")],
                                "de": [str(d / "xre.json")]},
                     image_root=img_dir, k_test=3)
    out = _run(d, "xre", cfg, "xretrieval")
    rec = _last_record(out)
    assert "eval_en_r_mean" in rec and "eval_de_r_mean" in rec
    assert rec["eval_r_mean"] == pytest.approx(
        (rec["eval_en_r_mean"] + rec["eval_de_r_mean"]) / 2)


@pytest.mark.slow
def test_cli_pretrain_cclm_streams_and_resume(corpus):
    """CCLM pretraining end-to-end: multilingual image stream + aux clean
    stream + parallel-text TTC/TTM/TLM, checkpoint + data-cursor save, then
    --resume continues from the saved step."""
    d, tok_dir, img_dir = corpus
    rng = np.random.default_rng(2)
    with open(d / "mimages.jsonl", "w") as f:
        for i in range(16):
            f.write(json.dumps({
                "binary": _b64_image(rng),
                "caption": {"en": f"the quick fox {i % 3}",
                            "de": f"the lazy dog {i % 3}"}}) + "\n")
    with open(d / "aux_images.jsonl", "w") as f:
        for i in range(16):
            f.write(json.dumps({
                "binary": _b64_image(rng),
                "caption": {"en": f"a clean green house {i % 2}"}}) + "\n")
    with open(d / "para.jsonl", "w") as f:
        for i in range(16):
            f.write(json.dumps({"text1": f"the quick brown fox {i % 3}",
                                "text2": f"a big red tree {i % 3}"}) + "\n")

    cfg = _cclm_cfg(
        tok_dir,
        train_file=[str(d / "mimages.jsonl")],
        train_file_aux=[str(d / "aux_images.jsonl")],
        train_file_mtext=[str(d / "para.jsonl")],
        train_dataset_size=16,
        images={"image_key": "binary", "caption_key": "caption",
                "batch_size": 8, "languages": ["en", "de"]},
        mtexts={"iter_perc": 1.0, "batch_size": 8, "max_tokens": 10},
        aux_iter_perc=0.5,
        max_masks=3, mask_prob=0.5,
        ckpt_frequent_step=3)
    cfg["schedular"]["epochs"] = 1  # 16/8 = 2 steps

    # ckpt_frequent_step=3 > 2 steps: the periodic save never fires, so the
    # checkpoint below can only come from the end-of-run final save
    # (regression: short pretrains used to exit with an empty ckpt/)
    out = _run(d, "cclm_pt", cfg, "pretrain")
    assert (out / "ckpt").exists()
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(str(out / "ckpt")) as mgr:
        assert mgr.latest_step() == 2
    data_state = json.loads((out / "data_state.json").read_text())
    assert "image" in data_state and "mtext" in data_state

    # resume: same output_dir, 2 epochs → continues from step 2 to step 4
    from x2vlm_tpu.run import main

    cfg2 = dict(cfg)
    cfg2["schedular"] = dict(cfg["schedular"], epochs=2)
    cfg_path = d / "cclm_pt_resume.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg2))
    main(["--task", "pretrain", "--config", str(cfg_path),
          "--output_dir", str(out), "--seed", "0", "--resume"])
    with ocp.CheckpointManager(str(out / "ckpt")) as mgr:
        assert mgr.latest_step() == 4


@pytest.mark.slow
def test_cli_retrieval_resume_and_fsdp(corpus):
    """--resume restarts a fine-tune at the right epoch; --fsdp 2 shards the
    train state over the (4 data × 2 fsdp) virtual mesh."""
    d, tok_dir, img_dir = corpus
    ann = [{"image": f"im{i}.png", "image_id": i, "caption": [f"the cat {i}"]}
           for i in range(8)]
    (d / "re_resume.json").write_text(json.dumps(ann))
    cfg = _model_cfg(tok_dir, train_file=[str(d / "re_resume.json")],
                     test_file=[str(d / "re_resume.json")],
                     image_root=img_dir, k_test=3)
    out = _run(d, "re_resume", cfg, "retrieval", extra_args=["--fsdp", "2"])
    n_records = len((out / "log.txt").read_text().strip().splitlines())

    # resume with 2 epochs: epoch 0 already done (1 step/epoch) → runs only
    # epoch 1, appending exactly one more record
    from x2vlm_tpu.run import main

    main(["--task", "retrieval", "--config", str(d / "re_resume.yaml"),
          "--output_dir", str(out), "--seed", "0", "--resume",
          "--epoch", "2", "--fsdp", "2"])
    lines = (out / "log.txt").read_text().strip().splitlines()
    assert len(lines) == n_records + 1
    assert json.loads(lines[-1])["epoch"] == 1


@pytest.mark.slow
def test_cli_video_retrieval_train(corpus):
    """video_retrieval trains through the standard retrieval path (reference
    run.py:155-166 launches Retrieval.py on MSRVTT) then runs the two-stage
    eval on (F, H, W, 3) frame inputs."""
    from PIL import Image as PILImage

    d, tok_dir, img_dir = corpus
    rng = np.random.default_rng(3)
    for v in range(8):
        vdir = d / "vids" / f"v{v}"
        vdir.mkdir(parents=True, exist_ok=True)
        for i in range(3):
            PILImage.fromarray(
                rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
                    vdir / f"f{i}.png")
    ann = [{"video": f"v{v}", "caption": [f"the dog {v}"]} for v in range(8)]
    (d / "vret.json").write_text(json.dumps(ann))
    cfg = _model_cfg(tok_dir,
                     train_file=[str(d / "vret.json")],
                     test_file=[str(d / "vret.json")],
                     video_root=str(d / "vids"),
                     video_encoding="avgpool", frame_len=2,
                     add_frame_pos=True, k_test=2, batch_size=8)
    out = _run(d, "vret", cfg, "video_retrieval")
    rec = _last_record(out)
    assert "eval_r_mean" in rec
    assert any(k.startswith("loss") for k in rec)


@pytest.mark.slow
def test_cli_next_qa_mc(corpus):
    """NExT-QA multiple choice: K (question ‖ option) rows score against the
    shared video through one deduped fusion pass; accuracy over argmax
    (reference next_qa_mc_dataset vqa_dataset.py:651 + vqa_mc_collate_fn,
    which the reference ships without a scorer)."""
    from PIL import Image as PILImage

    d, tok_dir, img_dir = corpus
    rng = np.random.default_rng(4)
    for v in range(8):
        vdir = d / "mcvids" / f"v{v}"
        vdir.mkdir(parents=True, exist_ok=True)
        for i in range(3):
            PILImage.fromarray(
                rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
                    vdir / f"f{i}.png")
    ann = [{"video": f"v{v}", "question": "the dog",
            "options": ["runs", "jumps", "red"], "answer": v % 3}
           for v in range(8)]
    (d / "mc.json").write_text(json.dumps(ann))
    cfg = _model_cfg(tok_dir,
                     train_file=[str(d / "mc.json")],
                     test_file=[str(d / "mc.json")],
                     video_root=str(d / "mcvids"),
                     video_encoding="avgpool", frame_len=2,
                     num_options=3, batch_size=8, batch_size_test=4)
    out = _run(d, "nextqa", cfg, "next_qa_mc")
    rec = _last_record(out)
    assert "eval_accuracy" in rec and 0.0 <= rec["eval_accuracy"] <= 100.0
