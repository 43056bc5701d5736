"""Remote-transparent image opening for the host data plane.

The reference streams all pretrain bytes through hdfs pipes
(utils/hdfs_io.py:24-52, dist_dataset.py:30-44) and opens fine-tune images
from local roots. Here every dataset goes through :func:`open_image`, so an
``hdfs://`` / ``gs://`` image_root works for any task (the bytes stream
through the core/io.py CLI pipes)."""

from __future__ import annotations

import io
import os

from PIL import Image

__all__ = ["open_image", "is_remote"]

_REMOTE_PREFIXES = ("hdfs://", "gs://")


def is_remote(path: str) -> bool:
    return path.startswith(_REMOTE_PREFIXES)


def open_image(path: str, root: str = "") -> Image.Image:
    """Open ``root/path`` (either part may carry a remote scheme) as RGB."""
    if root and not is_remote(path):
        path = os.path.join(root, path)
    if is_remote(path):
        from x2vlm_tpu.core.io import hopen

        with hopen(path, "rb") as f:
            return Image.open(io.BytesIO(f.read())).convert("RGB")
    return Image.open(path).convert("RGB")
