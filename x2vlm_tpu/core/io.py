"""Pluggable filesystem layer (reference utils/hdfs_io.py:24-128 +
utils/torch_io.py — HDFS-transparent open/list/exists/copy via `hdfs dfs`
subprocess pipes, and GCS via gsutil for TPU-native deployments).

Scheme dispatch by prefix: ``hdfs://`` → hdfs CLI pipes, ``gs://`` → gsutil
pipes, anything else → local. All helpers mirror the reference API names."""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import subprocess
from typing import IO, Iterator, List

__all__ = ["hopen", "hlist_files", "hexists", "hmkdir", "hcopy", "hcountline",
           "fetch_local", "mirror_to_remote"]


def _scheme(path: str) -> str:
    if path.startswith("hdfs://"):
        return "hdfs"
    if path.startswith("gs://"):
        return "gs"
    return "local"


@contextlib.contextmanager
def hopen(path: str, mode: str = "r") -> Iterator[IO]:
    """Open local/HDFS/GCS path. Remote reads/writes stream through the
    respective CLI (reference hdfs_io.hopen:24-52)."""
    scheme = _scheme(path)
    if scheme == "local":
        with open(path, mode) as f:
            yield f
        return
    binary = "b" in mode
    if "r" in mode:
        cmd = (["hdfs", "dfs", "-cat", path] if scheme == "hdfs"
               else ["gsutil", "cat", path])
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        try:
            yield proc.stdout if binary else io.TextIOWrapper(proc.stdout)
        finally:
            proc.stdout.close()
            proc.wait()
    else:
        cmd = (["hdfs", "dfs", "-put", "-f", "-", path] if scheme == "hdfs"
               else ["gsutil", "cp", "-", path])
        proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)
        try:
            yield proc.stdin if binary else io.TextIOWrapper(proc.stdin)
        finally:
            proc.stdin.close()
            proc.wait()


def hlist_files(paths: List[str]) -> List[str]:
    """List files under each path (reference hdfs_io.hlist_files:55-82)."""
    out: List[str] = []
    for p in paths:
        scheme = _scheme(p)
        if scheme == "local":
            if os.path.isdir(p):
                out.extend(os.path.join(p, f) for f in sorted(os.listdir(p)))
            elif os.path.exists(p):
                out.append(p)
        elif scheme == "hdfs":
            res = subprocess.run(["hdfs", "dfs", "-ls", p],
                                 capture_output=True, text=True)
            for line in res.stdout.splitlines():
                parts = line.split()
                if len(parts) >= 8 and parts[-1].startswith("hdfs://"):
                    out.append(parts[-1])
        else:
            res = subprocess.run(["gsutil", "ls", p],
                                 capture_output=True, text=True)
            out.extend(l for l in res.stdout.splitlines() if l)
    return out


def hexists(path: str) -> bool:
    scheme = _scheme(path)
    if scheme == "local":
        return os.path.exists(path)
    cmd = (["hdfs", "dfs", "-test", "-e", path] if scheme == "hdfs"
           else ["gsutil", "-q", "stat", path])
    return subprocess.run(cmd, capture_output=True).returncode == 0


def hmkdir(path: str) -> bool:
    scheme = _scheme(path)
    if scheme == "local":
        os.makedirs(path, exist_ok=True)
        return True
    if scheme == "hdfs":
        return subprocess.run(["hdfs", "dfs", "-mkdir", "-p", path]).returncode == 0
    return True  # GCS has no directories


def hcopy(src: str, dst: str) -> bool:
    """Copy a file (or, like `hdfs dfs -put/-get`, a whole directory) across
    local/hdfs/gs schemes (reference hdfs_io.hcopy:85-96)."""
    ss, ds = _scheme(src), _scheme(dst)
    if ss == "local" and ds == "local":
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(dst, os.path.basename(
                src.rstrip("/"))), dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)
        return True
    if "hdfs" in (ss, ds):
        flag = "-put" if ss == "local" else "-get" if ds == "local" else "-cp"
        return subprocess.run(["hdfs", "dfs", flag, "-f", src, dst]).returncode == 0
    recursive = ["-r"] if ss == "local" and os.path.isdir(src) else []
    return subprocess.run(["gsutil", "cp", *recursive, src, dst]).returncode == 0


def fetch_local(path: str, scratch_dir: str = ".") -> str:
    """Stage a remote file to a local scratch dir and return the local path;
    local paths pass through (reference run.py:84-101 get_from_hdfs)."""
    if _scheme(path) == "local":
        return path
    os.makedirs(scratch_dir, exist_ok=True)
    local = os.path.join(scratch_dir, os.path.basename(path.rstrip("/")))
    if not hcopy(path, local):
        raise FileNotFoundError(f"failed to fetch {path}")
    return local


def mirror_to_remote(local_dir: str, remote_dir: str,
                     names: List[str] = ()) -> None:
    """Copy run artifacts (log, dumped config, result JSONs, checkpoints) from
    a local output_dir to a remote one — the reference copies log.txt + ckpts
    to ``--output_hdfs`` at save points (Pretrain.py:368-375, run.py:495-506).
    ``names`` selects entries of ``local_dir``; empty = every entry."""
    hmkdir(remote_dir)
    entries = names or sorted(os.listdir(local_dir))
    for name in entries:
        src = os.path.join(local_dir, name)
        if os.path.exists(src):
            hcopy(src, remote_dir.rstrip("/") + "/"
                  + ("" if os.path.isdir(src) else name))


def hcountline(path: str) -> int:
    n = 0
    with hopen(path, "r") as f:
        for _ in f:
            n += 1
    return n
