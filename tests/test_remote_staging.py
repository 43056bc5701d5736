"""Remote (hdfs://) staging of configs, checkpoints, and outputs through the
launcher — reference run.py:84-101,495-506 (get_from_hdfs + output_hdfs),
utils/torch_io.py:14-31 (HDFS-transparent torch load), Pretrain.py:368-375
(log/ckpt copied to output_hdfs).

Uses a fake `hdfs` CLI on PATH mapping hdfs://test/... to a local dir, so the
real core/io subprocess pipes are exercised end-to-end.
"""

import json
import os
import stat

import numpy as np
import pytest
import yaml
from PIL import Image

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a b c d e dog cat runs the quick brown fox "
    "jump ##s ##ing over lazy river bank small big red blue green house tree"
).split()


@pytest.fixture()
def fake_hdfs(tmp_path, monkeypatch):
    """Fake `hdfs` CLI supporting the full staging surface: -cat, -ls, -test,
    -put [-f], -get, -mkdir -p (put/get accept directories, like the real
    `hdfs dfs -put/-get`)."""
    root = tmp_path / "hdfs_root"
    root.mkdir()
    script = tmp_path / "bin" / "hdfs"
    script.parent.mkdir()
    script.write_text(f"""#!/usr/bin/env python3
import os, shutil, sys
ROOT = {str(root)!r}
def local(p):
    assert p.startswith("hdfs://test/"), p
    return os.path.join(ROOT, p[len("hdfs://test/"):])
args = [a for a in sys.argv[1:] if a != "-f"]  # ['dfs', op, ...]
op = args[1]
if op == "-cat":
    sys.stdout.buffer.write(open(local(args[2]), "rb").read())
elif op == "-ls":
    d = local(args[2])
    for f in sorted(os.listdir(d)):
        rel = os.path.relpath(os.path.join(d, f), ROOT)
        print(f"-rw-r--r--   1 u g 0 2024-01-01 00:00 hdfs://test/{{rel}}")
elif op == "-test":
    sys.exit(0 if os.path.exists(local(args[3])) else 1)
elif op == "-mkdir":
    os.makedirs(local(args[3 if args[2] == "-p" else 2]), exist_ok=True)
elif op == "-put":
    src, dst = args[2], local(args[3])
    if src == "-":
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "wb") as f:
            shutil.copyfileobj(sys.stdin.buffer, f)
    elif os.path.isdir(src):
        dst = os.path.join(dst, os.path.basename(src.rstrip("/")))
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
    else:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy(src, dst)
elif op == "-get":
    src, dst = local(args[2]), args[3]
    if os.path.isdir(src):
        dst = os.path.join(dst, os.path.basename(src.rstrip("/"))) \\
            if os.path.isdir(dst) else dst
        shutil.copytree(src, dst, dirs_exist_ok=True)
    else:
        if os.path.isdir(dst):
            dst = os.path.join(dst, os.path.basename(src))
        shutil.copy(src, dst)
else:
    sys.exit(2)
""")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{script.parent}:{os.environ['PATH']}")
    return root


def test_remote_torch_checkpoint_load(fake_hdfs):
    """`.th` checkpoints load straight from an hdfs:// path through hopen
    pipes (reference utils/torch_io.py:14-23)."""
    import torch

    from x2vlm_tpu.train.checkpoint import load_torch_checkpoint

    sd = {"model": {"module.some.weight": torch.arange(6.0).reshape(2, 3)}}
    torch.save(sd, fake_hdfs / "m.th")
    out = load_torch_checkpoint("hdfs://test/m.th")
    assert list(out) == ["some.weight"]
    np.testing.assert_allclose(out["some.weight"],
                               np.arange(6.0).reshape(2, 3))


def test_fetch_local(fake_hdfs, tmp_path):
    from x2vlm_tpu.core.io import fetch_local

    (fake_hdfs / "cfg.yaml").write_text("a: 1\n")
    local = fetch_local("hdfs://test/cfg.yaml", str(tmp_path / "scratch"))
    assert open(local).read() == "a: 1\n"
    # local paths pass through untouched
    assert fetch_local(local, str(tmp_path)) == local


@pytest.mark.slow
def test_cli_remote_config_and_output_mirror(fake_hdfs, tmp_path):
    """End-to-end: --config hdfs://..., --output_hdfs hdfs://...; the run
    fetches the config, trains+evals, and mirrors log/config/results/ckpt to
    the remote dir at the end (reference run.py:495-506, Pretrain.py:368-375).
    """
    from x2vlm_tpu.run import main

    tok_dir = tmp_path / "bert-tiny"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(VOCAB))
    (tok_dir / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "BertTokenizerFast", "do_lower_case": True}))
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

    # identical tiny shapes to test_cli's retrieval e2e → jit-cache hits
    cfg = {
        "train_file": [str(tmp_path / "ann.json")],
        "test_file": [str(tmp_path / "ann.json")],
        "image_root": str(img_dir),
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
        "k_test": 3,
        "batch_size": 8,
        "optimizer": {"lr": 1e-3, "weight_decay": 0.01},
        "schedular": {"epochs": 1, "num_warmup_steps": 0},
    }
    (fake_hdfs / "cfg.yaml").write_text(yaml.safe_dump(cfg))

    out_dir = tmp_path / "out"
    main(["--task", "retrieval", "--config", "hdfs://test/cfg.yaml",
          "--output_dir", str(out_dir), "--output_hdfs", "hdfs://test/run1",
          "--seed", "0"])

    rec = json.loads((out_dir / "log.txt").read_text().strip().splitlines()[-1])
    assert "eval_r_mean" in rec

    # remote mirror: log + dumped config + checkpoint dir
    remote = fake_hdfs / "run1"
    assert (remote / "log.txt").read_text() == (out_dir / "log.txt").read_text()
    assert (remote / "config.yaml").exists()
    assert (remote / "ckpt").is_dir() and any((remote / "ckpt").iterdir())
