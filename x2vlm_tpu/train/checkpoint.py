"""Checkpointing: orbax-based native save/restore with true resume, plus the
``.th`` import adapter for reference X2-VLM checkpoints.

The import adapter replaces the reference's checkpoint-surgery layer
(models/xvlm.py:38-119,390-460, beit2.py:473-651): it maps the reference's
torch state-dict names onto this framework's flax tree, transposing Linear
weights, splitting BEiT-2's fused qkv, and (optionally) interpolating
relative-position tables across image resolutions.

Unlike the reference (which saves optimizer state but never restores it —
`training_state_latest.th` has no consumer; SURVEY §5), `save_train_state` /
`restore_train_state` round-trip params + optimizer state + step.
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "convert_xvlm_state_dict",
    "convert_checkpoint_auto",
    "split_imported_to_plus",
    "load_torch_checkpoint",
    "merge_imported",
    "save_train_state",
    "restore_train_state",
]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.th``/``.pth`` checkpoint into numpy (host-side; torch
    runs CPU-only here). Remote (hdfs://, gs://) paths stream through hopen
    pipes (reference utils/torch_io.py:14-23). Unwraps the common
    {'model': ...} / {'module': ...} containers (reference
    utils/checkpointer.py, xvlm.py:393-396)."""
    import torch

    if path.startswith(("hdfs://", "gs://")):
        import io as _io

        from x2vlm_tpu.core.io import hopen

        with hopen(path, "rb") as reader:
            buf = _io.BytesIO(reader.read())
        ckpt = torch.load(buf, map_location="cpu", weights_only=False)
    else:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "module", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "numpy"):
            out[k.replace("module.", "")] = v.detach().float().numpy()
    return out


def _t(x):  # torch Linear weight (out, in) → flax kernel (in, out)
    return np.ascontiguousarray(x.T)


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _interp_rel_pos_table(table: np.ndarray, src_window: int, dst_window: int
                          ) -> np.ndarray:
    """Resize a BEiT relative-position bias table from a (2*sw-1)² grid to a
    (2*dw-1)² grid, keeping the 3 cls rows — the reference's exact scheme
    (beit2.py:473-604): the source offsets are laid out on a geometric-
    progression grid whose ratio q is bisected so the grid spans the target
    half-width, then each head is cubically interpolated onto the integer
    target lattice. Cubic interpolation uses RectBivariateSpline, scipy's
    documented bug-for-bug replacement for the removed interp2d on regular
    grids."""
    from scipy.interpolate import RectBivariateSpline

    src = 2 * src_window - 1
    dst = 2 * dst_window - 1
    n_extra = 3
    heads = table.shape[1]
    body = table[:-n_extra]

    # bisect the geometric-progression ratio (reference beit2.py:534-545)
    def geometric_progression(a, r, n):
        return a * (1.0 - r ** n) / (1.0 - r)

    left, right = 1.01, 1.5
    while right - left > 1e-6:
        q = (left + right) / 2.0
        if geometric_progression(1, q, src // 2) > dst // 2:
            right = q
        else:
            left = q

    dis = []
    cur = 1.0
    for i in range(src // 2):
        dis.append(cur)
        cur += q ** (i + 1)
    r_ids = [-v for v in reversed(dis)]
    x = np.asarray(r_ids + [0] + dis, np.float64)

    t = dst // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)

    out = np.empty((dst * dst, heads), body.dtype)
    k = min(3, len(x) - 1)  # tiny test windows can't support a full cubic
    for h in range(heads):
        z = body[:, h].reshape(src, src).astype(np.float64)
        # interp2d(x, y, z) semantics: z[i, j] is the value at (x[j], y[i]);
        # RectBivariateSpline wants the first axis to match its first grid
        spl = RectBivariateSpline(x, x, z, kx=k, ky=k, s=0)
        out[:, h] = spl(dx, dx).reshape(-1)
    return np.concatenate([out, table[-n_extra:]], axis=0)


def convert_xvlm_state_dict(
    sd: Dict[str, np.ndarray],
    *,
    vision_depth: int,
    dst_window: Optional[int] = None,
    load_mlm_head: bool = True,
    vision_cfg: Any = None,
) -> Dict[str, Any]:
    """Convert a reference XVLM(Base) torch state dict to this framework's
    param tree (contents of ``params['base']``). Returns (tree, unused_keys).

    Handles: all three vision towers — BEiT-2 (fused-qkv split, q/v-only
    bias, per-block rel-pos tables with optional window interpolation), CLIP
    (``vision_encoder.encoder.layers...``) and Swin
    (``vision_encoder.layers.N.blocks...``) — dispatched on the checkpoint's
    own key flavor (the reference stores each backbone under its native
    names, xvlm.py:172-283); plus the 18-layer BERT text+fusion stack,
    projection/ITM/bbox/MLM heads, temp. ``vision_cfg`` (the structured
    vision config, optional) supplies the target depth / window for CLIP
    layer subsampling and Swin rel-pos interpolation.
    """
    tree: Dict[str, Any] = {}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    # ---- vision encoder: dispatch on the checkpoint's tower flavor ----
    vis = {k[len("vision_encoder."):]: v for k, v in sd.items()
           if k.startswith("vision_encoder.")}
    clip_like = any(k.startswith("encoder.layers.") or k == "class_embedding"
                    for k in vis)
    swin_like = any(re.match(r"layers\.\d+\.blocks\.", k) for k in vis)
    if clip_like:
        n_src = 1 + max((int(m.group(1)) for k in vis
                         if (m := re.match(r"encoder\.layers\.(\d+)\.", k))),
                        default=-1)
        to_depth = getattr(vision_cfg, "depth", None) or n_src
        vtree, vunused = convert_clip_vit_checkpoint(vis, depth=to_depth)
        tree["vision_encoder"] = vtree
        used.update("vision_encoder." + k for k in vis
                    if k not in set(vunused))
    elif swin_like:
        stage_of = {}
        for k in vis:
            m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.", k)
            if m:
                s, b = int(m.group(1)), int(m.group(2))
                stage_of[s] = max(stage_of.get(s, 0), b + 1)
        depths = tuple(stage_of[s] for s in sorted(stage_of))
        win = getattr(vision_cfg, "window_size", None)
        vtree, vunused = convert_swin_checkpoint(vis, depths=depths,
                                                 dst_window=win)
        tree["vision_encoder"] = vtree
        used.update("vision_encoder." + k for k in vis
                    if k not in set(vunused))
    else:
        # BEiT-2 (the X2-VLM default)
        if "vision_encoder.cls_token" in sd:
            _set(tree, "vision_encoder/cls_token", take("vision_encoder.cls_token"))
        if "vision_encoder.patch_embed.proj.weight" in sd:
            w = take("vision_encoder.patch_embed.proj.weight")  # (C, 3, p, p)
            _set(tree, "vision_encoder/patch_embed/kernel", w.transpose(2, 3, 1, 0))
            _set(tree, "vision_encoder/patch_embed/bias",
                 take("vision_encoder.patch_embed.proj.bias"))
        for ln_name in ("fc_norm",):
            wk = f"vision_encoder.{ln_name}.weight"
            if wk in sd:
                _set(tree, f"vision_encoder/{ln_name}/scale", take(wk))
                _set(tree, f"vision_encoder/{ln_name}/bias",
                     take(f"vision_encoder.{ln_name}.bias"))

        for i in range(vision_depth):
            p = f"vision_encoder.blocks.{i}"
            q = f"vision_encoder/block_{i}"
            if f"{p}.norm1.weight" not in sd:
                continue
            _set(tree, f"{q}/norm1/scale", take(f"{p}.norm1.weight"))
            _set(tree, f"{q}/norm1/bias", take(f"{p}.norm1.bias"))
            _set(tree, f"{q}/norm2/scale", take(f"{p}.norm2.weight"))
            _set(tree, f"{q}/norm2/bias", take(f"{p}.norm2.bias"))
            qkv = take(f"{p}.attn.qkv.weight")  # (3C, C)
            c = qkv.shape[0] // 3
            _set(tree, f"{q}/attn/query/kernel", _t(qkv[:c]))
            _set(tree, f"{q}/attn/key/kernel", _t(qkv[c:2 * c]))
            _set(tree, f"{q}/attn/value/kernel", _t(qkv[2 * c:]))
            _set(tree, f"{q}/attn/query/bias", take(f"{p}.attn.q_bias"))
            _set(tree, f"{q}/attn/value/bias", take(f"{p}.attn.v_bias"))
            _set(tree, f"{q}/attn/out/kernel", _t(take(f"{p}.attn.proj.weight")))
            _set(tree, f"{q}/attn/out/bias", take(f"{p}.attn.proj.bias"))
            _set(tree, f"{q}/gamma_1", take(f"{p}.gamma_1"))
            _set(tree, f"{q}/gamma_2", take(f"{p}.gamma_2"))
            _set(tree, f"{q}/mlp/fc1/kernel", _t(take(f"{p}.mlp.fc1.weight")))
            _set(tree, f"{q}/mlp/fc1/bias", take(f"{p}.mlp.fc1.bias"))
            _set(tree, f"{q}/mlp/fc2/kernel", _t(take(f"{p}.mlp.fc2.weight")))
            _set(tree, f"{q}/mlp/fc2/bias", take(f"{p}.mlp.fc2.bias"))
            table = take(f"{p}.attn.relative_position_bias_table")
            if dst_window is not None:
                src_window = int((np.sqrt(table.shape[0] - 3) + 1) / 2)
                if src_window != dst_window:
                    table = _interp_rel_pos_table(table, src_window, dst_window)
            _set(tree, f"vision_encoder/rel_pos_table_{i}", table)
            used.add(f"{p}.attn.relative_position_index")  # static buffer

    # ---- text encoder (xbert fork; xroberta uses '.roberta.') ----
    if any(k.startswith("text_encoder.bert.") for k in sd):
        tprefix = "text_encoder.bert."
    elif any(k.startswith("text_encoder.roberta.") for k in sd):
        tprefix = "text_encoder.roberta."
    else:
        tprefix = "text_encoder."

    def tkey(suffix):
        return tprefix + suffix

    emb_map = {
        "embeddings.word_embeddings.weight": "text_encoder/embeddings/word_embeddings/embedding",
        "embeddings.position_embeddings.weight": "text_encoder/embeddings/position_embeddings/embedding",
        "embeddings.token_type_embeddings.weight": "text_encoder/embeddings/token_type_embeddings/embedding",
    }
    for src, dst in emb_map.items():
        if tkey(src) in sd:
            _set(tree, dst, take(tkey(src)))
    if tkey("embeddings.LayerNorm.weight") in sd:
        _set(tree, "text_encoder/embeddings/ln/scale", take(tkey("embeddings.LayerNorm.weight")))
        _set(tree, "text_encoder/embeddings/ln/bias", take(tkey("embeddings.LayerNorm.bias")))

    layer_re = re.compile(re.escape(tkey("encoder.layer.")) + r"(\d+)\.")
    n_layers = 1 + max(
        (int(m.group(1)) for k in sd if (m := layer_re.match(k))), default=-1)
    for i in range(n_layers):
        p = tkey(f"encoder.layer.{i}")
        q = f"text_encoder/layer_{i}"
        for attn_src, attn_dst in (("attention.self", "self_attn"),
                                   ("crossattention.self", "cross_attn")):
            if f"{p}.{attn_src}.query.weight" not in sd:
                continue
            for proj in ("query", "key", "value"):
                _set(tree, f"{q}/{attn_dst}/{proj}/kernel",
                     _t(take(f"{p}.{attn_src}.{proj}.weight")))
                _set(tree, f"{q}/{attn_dst}/{proj}/bias",
                     take(f"{p}.{attn_src}.{proj}.bias"))
            out_src = attn_src.replace(".self", ".output")
            _set(tree, f"{q}/{attn_dst}/out/kernel",
                 _t(take(f"{p}.{out_src}.dense.weight")))
            _set(tree, f"{q}/{attn_dst}/out/bias", take(f"{p}.{out_src}.dense.bias"))
            ln_dst = "attn_ln" if attn_dst == "self_attn" else "cross_ln"
            _set(tree, f"{q}/{ln_dst}/scale", take(f"{p}.{out_src}.LayerNorm.weight"))
            _set(tree, f"{q}/{ln_dst}/bias", take(f"{p}.{out_src}.LayerNorm.bias"))
        if f"{p}.intermediate.dense.weight" in sd:
            _set(tree, f"{q}/mlp/fc1/kernel", _t(take(f"{p}.intermediate.dense.weight")))
            _set(tree, f"{q}/mlp/fc1/bias", take(f"{p}.intermediate.dense.bias"))
            _set(tree, f"{q}/mlp/fc2/kernel", _t(take(f"{p}.output.dense.weight")))
            _set(tree, f"{q}/mlp/fc2/bias", take(f"{p}.output.dense.bias"))
            _set(tree, f"{q}/mlp_ln/scale", take(f"{p}.output.LayerNorm.weight"))
            _set(tree, f"{q}/mlp_ln/bias", take(f"{p}.output.LayerNorm.bias"))

    # ---- standalone cross encoder (XVLMPlus/CCLM checkpoints) ----
    cross_re = re.compile(r"cross_encoder\.(?:bert\.)?encoder\.layer\.(\d+)\.")
    n_cross = 1 + max((int(m.group(1)) for k in sd if (m := cross_re.match(k))),
                      default=-1)
    for i in range(n_cross):
        base = next(p for p in (f"cross_encoder.bert.encoder.layer.{i}",
                                f"cross_encoder.encoder.layer.{i}")
                    if f"{p}.attention.self.query.weight" in sd)
        q = f"cross_encoder/layer_{i}"
        for attn_src, attn_dst in (("attention.self", "self_attn"),
                                   ("crossattention.self", "cross_attn")):
            if f"{base}.{attn_src}.query.weight" not in sd:
                continue
            for proj in ("query", "key", "value"):
                _set(tree, f"{q}/{attn_dst}/{proj}/kernel",
                     _t(take(f"{base}.{attn_src}.{proj}.weight")))
                _set(tree, f"{q}/{attn_dst}/{proj}/bias",
                     take(f"{base}.{attn_src}.{proj}.bias"))
            out_src = attn_src.replace(".self", ".output")
            _set(tree, f"{q}/{attn_dst}/out/kernel",
                 _t(take(f"{base}.{out_src}.dense.weight")))
            _set(tree, f"{q}/{attn_dst}/out/bias", take(f"{base}.{out_src}.dense.bias"))
            ln_dst = "attn_ln" if attn_dst == "self_attn" else "cross_ln"
            _set(tree, f"{q}/{ln_dst}/scale", take(f"{base}.{out_src}.LayerNorm.weight"))
            _set(tree, f"{q}/{ln_dst}/bias", take(f"{base}.{out_src}.LayerNorm.bias"))
        if f"{base}.intermediate.dense.weight" in sd:
            _set(tree, f"{q}/mlp/fc1/kernel", _t(take(f"{base}.intermediate.dense.weight")))
            _set(tree, f"{q}/mlp/fc1/bias", take(f"{base}.intermediate.dense.bias"))
            _set(tree, f"{q}/mlp/fc2/kernel", _t(take(f"{base}.output.dense.weight")))
            _set(tree, f"{q}/mlp/fc2/bias", take(f"{base}.output.dense.bias"))
            _set(tree, f"{q}/mlp_ln/scale", take(f"{base}.output.LayerNorm.weight"))
            _set(tree, f"{q}/mlp_ln/bias", take(f"{base}.output.LayerNorm.bias"))

    # ---- MLM head (cls.predictions / lm_head for roberta) ----
    if load_mlm_head:
        for hp in ("text_encoder.cls.predictions.", "text_encoder.lm_head."):
            if hp + "transform.dense.weight" in sd:
                _set(tree, "mlm_head/transform_dense/kernel", _t(take(hp + "transform.dense.weight")))
                _set(tree, "mlm_head/transform_dense/bias", take(hp + "transform.dense.bias"))
                _set(tree, "mlm_head/transform_ln/scale", take(hp + "transform.LayerNorm.weight"))
                _set(tree, "mlm_head/transform_ln/bias", take(hp + "transform.LayerNorm.bias"))
                _set(tree, "mlm_head/decoder/kernel", _t(take(hp + "decoder.weight")))
                bias_key = hp + "bias" if hp + "bias" in sd else hp + "decoder.bias"
                _set(tree, "mlm_head/decoder/bias", take(bias_key))
                _set(tree, "mlm_head/decoder_bias", take(bias_key))  # tied head
                used.add(hp + "decoder.bias")
                used.add(hp + "bias")

    # roberta lm_head naming: dense / layer_norm / decoder (xroberta.py:1269)
    if load_mlm_head and "text_encoder.lm_head.dense.weight" in sd:
        hp = "text_encoder.lm_head."
        _set(tree, "mlm_head/transform_dense/kernel", _t(take(hp + "dense.weight")))
        _set(tree, "mlm_head/transform_dense/bias", take(hp + "dense.bias"))
        _set(tree, "mlm_head/transform_ln/scale", take(hp + "layer_norm.weight"))
        _set(tree, "mlm_head/transform_ln/bias", take(hp + "layer_norm.bias"))
        _set(tree, "mlm_head/decoder/kernel", _t(take(hp + "decoder.weight")))
        bias_key = hp + "bias" if hp + "bias" in sd else hp + "decoder.bias"
        _set(tree, "mlm_head/decoder/bias", take(bias_key))
        _set(tree, "mlm_head/decoder_bias", take(bias_key))  # tied head
        used.add(hp + "decoder.bias")
        used.add(hp + "bias")

    # ---- projections / heads / temp ----
    for name in ("vision_proj", "text_proj"):
        if f"{name}.weight" in sd:
            _set(tree, f"{name}/kernel", _t(take(f"{name}.weight")))
            _set(tree, f"{name}/bias", take(f"{name}.bias"))
    if "temp" in sd:
        _set(tree, "temp", take("temp").reshape(()))
    if "absolute_frame_pos_embed" in sd:
        # video stage-2 checkpoints: (1, frame_len, 1, vision_width);
        # frame-count mismatch is adapted at merge time (reference
        # xvlm.py:603-607 copies the first min(frame_len) rows)
        _set(tree, "frame_pos_embed", take("absolute_frame_pos_embed"))
    # build_mlp heads (Sequential Linear/LayerNorm/GELU/Linear → fc1/ln/fc2);
    # cls_head covers NLVR / classification fine-tuned checkpoints
    for head in ("itm_head", "bbox_head", "cls_head"):
        if f"{head}.0.weight" in sd:
            _set(tree, f"{head}/fc1/kernel", _t(take(f"{head}.0.weight")))
            _set(tree, f"{head}/fc1/bias", take(f"{head}.0.bias"))
            _set(tree, f"{head}/ln/scale", take(f"{head}.1.weight"))
            _set(tree, f"{head}/ln/bias", take(f"{head}.1.bias"))
            _set(tree, f"{head}/fc2/kernel", _t(take(f"{head}.3.weight")))
            _set(tree, f"{head}/fc2/bias", take(f"{head}.3.bias"))

    # ---- VQA decoder stack (fine-tuned checkpoints: text_decoder.*) ----
    dprefix = None
    for cand in ("text_decoder.bert.", "text_decoder.roberta.", "text_decoder."):
        if any(k.startswith(cand + "encoder.layer.") for k in sd):
            dprefix = cand
            break
    if dprefix is not None:
        dec_re = re.compile(re.escape(dprefix + "encoder.layer.") + r"(\d+)\.")
        n_dec = 1 + max((int(m.group(1)) for k in sd if (m := dec_re.match(k))),
                        default=-1)
        for src, dst in emb_map.items():
            key = dprefix + src
            if key in sd:
                _set(tree, "text_decoder/" + dst.split("text_encoder/")[1],
                     take(key))
        if dprefix + "embeddings.LayerNorm.weight" in sd:
            _set(tree, "text_decoder/embeddings/ln/scale",
                 take(dprefix + "embeddings.LayerNorm.weight"))
            _set(tree, "text_decoder/embeddings/ln/bias",
                 take(dprefix + "embeddings.LayerNorm.bias"))
        for i in range(n_dec):
            p = dprefix + f"encoder.layer.{i}"
            q = f"text_decoder/layer_{i}"
            for attn_src, attn_dst in (("attention.self", "self_attn"),
                                       ("crossattention.self", "cross_attn")):
                if f"{p}.{attn_src}.query.weight" not in sd:
                    continue
                for proj in ("query", "key", "value"):
                    _set(tree, f"{q}/{attn_dst}/{proj}/kernel",
                         _t(take(f"{p}.{attn_src}.{proj}.weight")))
                    _set(tree, f"{q}/{attn_dst}/{proj}/bias",
                         take(f"{p}.{attn_src}.{proj}.bias"))
                out_src = attn_src.replace(".self", ".output")
                _set(tree, f"{q}/{attn_dst}/out/kernel",
                     _t(take(f"{p}.{out_src}.dense.weight")))
                _set(tree, f"{q}/{attn_dst}/out/bias",
                     take(f"{p}.{out_src}.dense.bias"))
                ln_dst = "attn_ln" if attn_dst == "self_attn" else "cross_ln"
                _set(tree, f"{q}/{ln_dst}/scale",
                     take(f"{p}.{out_src}.LayerNorm.weight"))
                _set(tree, f"{q}/{ln_dst}/bias",
                     take(f"{p}.{out_src}.LayerNorm.bias"))
            if f"{p}.intermediate.dense.weight" in sd:
                _set(tree, f"{q}/mlp/fc1/kernel",
                     _t(take(f"{p}.intermediate.dense.weight")))
                _set(tree, f"{q}/mlp/fc1/bias", take(f"{p}.intermediate.dense.bias"))
                _set(tree, f"{q}/mlp/fc2/kernel", _t(take(f"{p}.output.dense.weight")))
                _set(tree, f"{q}/mlp/fc2/bias", take(f"{p}.output.dense.bias"))
                _set(tree, f"{q}/mlp_ln/scale", take(f"{p}.output.LayerNorm.weight"))
                _set(tree, f"{q}/mlp_ln/bias", take(f"{p}.output.LayerNorm.bias"))
        for hp in ("text_decoder.cls.predictions.", "text_decoder.lm_head."):
            if hp + "transform.dense.weight" in sd:
                _set(tree, "dec_head/transform_dense/kernel",
                     _t(take(hp + "transform.dense.weight")))
                _set(tree, "dec_head/transform_dense/bias",
                     take(hp + "transform.dense.bias"))
                _set(tree, "dec_head/transform_ln/scale",
                     take(hp + "transform.LayerNorm.weight"))
                _set(tree, "dec_head/transform_ln/bias",
                     take(hp + "transform.LayerNorm.bias"))
                _set(tree, "dec_head/decoder/kernel", _t(take(hp + "decoder.weight")))
                bias_key = hp + "bias" if hp + "bias" in sd else hp + "decoder.bias"
                _set(tree, "dec_head/decoder/bias", take(bias_key))
                _set(tree, "dec_head/decoder_bias", take(bias_key))  # tied head
                used.add(hp + "decoder.bias")
                used.add(hp + "bias")

    unused = sorted(set(sd) - used)
    return tree, unused


_HEAD_LEVEL_KEYS = ("text_decoder", "dec_head", "cls_head")


def merge_imported(init_params, imported_base: Dict[str, Any], scope: str = "base"):
    """Overlay an imported tree onto freshly-initialized params, checking
    shapes. Missing keys keep their fresh init (== reference `strict=False`
    load + init_params tracking, xvlm.py:608-613). Returns (params, missing).

    Subtrees living at the task-head level rather than inside the composition
    core (VQA decoder, classification head) are routed there automatically."""
    import flax

    params = flax.core.unfreeze(init_params)
    root = params["params"]
    imported_base = dict(imported_base)
    # route head-level subtrees
    for key in _HEAD_LEVEL_KEYS:
        if key in imported_base and key in root and key not in root.get(scope, {}):
            sub = imported_base.pop(key)
            missing_sub: list = []

            def walk_sub(dst, src, path):
                for k, v in dst.items():
                    p = f"{path}/{k}" if path else k
                    if isinstance(v, dict):
                        walk_sub(v, src.get(k, {}) if isinstance(src, dict) else {}, p)
                    elif isinstance(src, dict) and k in src:
                        new = np.asarray(src[k])
                        if new.shape != v.shape:
                            raise ValueError(
                                f"shape mismatch at {key}/{p}: ckpt {new.shape} vs {v.shape}")
                        dst[k] = jnp.asarray(new, v.dtype)

            walk_sub(root[key], sub, "")
    target = root[scope]
    missing = []

    def walk(dst, src, path):
        for k, v in dst.items():
            p = f"{path}/{k}" if path else k
            if isinstance(v, dict):
                walk(v, src.get(k, {}) if isinstance(src, dict) else {}, p)
            elif isinstance(src, dict) and k in src:
                new = np.asarray(src[k])
                if new.shape != v.shape:
                    if (k == "frame_pos_embed" and new.ndim == v.ndim == 4
                            and new.shape[0] == v.shape[0]
                            and new.shape[2:] == v.shape[2:]):
                        # frame-count mismatch: load the first min(frame_len)
                        # frames, keep fresh init for the rest (reference
                        # xvlm.py:603-607)
                        f = min(new.shape[1], v.shape[1])
                        buf = np.asarray(v).copy()
                        buf[:, :f] = new[:, :f]
                        dst[k] = jnp.asarray(buf, v.dtype)
                        continue
                    raise ValueError(f"shape mismatch at {p}: ckpt {new.shape} vs model {v.shape}")
                dst[k] = jnp.asarray(new, v.dtype)
            else:
                missing.append(p)

    walk(target, imported_base, "")
    return params, missing


def convert_beit2_checkpoint(sd: Dict[str, np.ndarray], *, depth: int,
                             dst_window: Optional[int] = None) -> Dict[str, Any]:
    """Import a raw BEiT-2 pretraining checkpoint (beitv2_*_pt1k_ft21k.pth:
    keys ``blocks.{i}...``, optionally a *shared* ``rel_pos_bias`` table) as a
    vision-encoder tree for from-scratch X2-VLM pretraining — the reference's
    load_pretrained_beit2 (beit2.py:473-651): shared table expands to
    per-block, windows interpolate, the classifier head is dropped."""
    sd = dict(sd)
    sd.pop("head.weight", None)
    sd.pop("head.bias", None)
    shared = sd.pop("rel_pos_bias.relative_position_bias_table", None)
    if shared is not None:
        for i in range(depth):
            sd.setdefault(f"blocks.{i}.attn.relative_position_bias_table",
                          np.array(shared))
    prefixed = {"vision_encoder." + k: v for k, v in sd.items()}
    tree, unused = convert_xvlm_state_dict(
        prefixed, vision_depth=depth, dst_window=dst_window,
        load_mlm_head=False)
    return tree.get("vision_encoder", {}), [u[len("vision_encoder."):]
                                            for u in unused]


def convert_clip_vit_checkpoint(sd: Dict[str, np.ndarray], *, depth: int
                                ) -> Dict[str, Any]:
    """Import an OpenAI CLIP vision tower (HF layout after the reference's
    renames, xvlm.py:179-217: ``vision_model.`` prefix stripped, embeddings
    flattened) into the CLIPViT tree. Accepts either raw HF names
    (``vision_model.encoder.layers...``) or pre-stripped ones.

    ``depth`` is the TARGET model depth. A 12-layer checkpoint loading into a
    6-layer model takes every other layer starting from 1 — the reference's
    mapper {1:0, 3:1, 5:2, 7:3, 9:4, 11:5} (xvlm.py:215-217)."""
    # normalize: strip vision_model./embeddings. like the reference loader
    norm = {}
    for k, v in sd.items():
        if k.startswith("vision_model."):
            k = k[len("vision_model."):]
        if k.startswith("embeddings."):
            k = k[len("embeddings."):]
        k = k.replace("patch_embedding.weight", "patch_embed.weight")
        k = k.replace("position_embedding.weight", "pos_embed.weight")
        if k == "position_ids":
            continue
        norm[k] = v
    tree: Dict[str, Any] = {}
    used = set()

    def take(key):
        used.add(key)
        return norm[key]

    if "patch_embed.weight" in norm:
        w = take("patch_embed.weight")  # (C, 3, p, p) conv, no bias
        _set(tree, "patch_embed/kernel", w.transpose(2, 3, 1, 0))
    if "class_embedding" in norm:
        _set(tree, "class_embedding", take("class_embedding").reshape(-1))
    if "pos_embed.weight" in norm:
        _set(tree, "pos_embed", take("pos_embed.weight"))
    for src, dst in (("pre_layrnorm", "pre_layernorm"),
                     ("pre_layernorm", "pre_layernorm"),
                     ("post_layernorm", "post_layernorm")):
        if f"{src}.weight" in norm:
            _set(tree, f"{dst}/scale", take(f"{src}.weight"))
            _set(tree, f"{dst}/bias", take(f"{src}.bias"))
    src_re = re.compile(r"encoder\.layers\.(\d+)\.")
    n_src = 1 + max((int(m.group(1)) for k in norm if (m := src_re.match(k))),
                    default=-1)
    if n_src in (0, depth):
        src_of = lambda i: i
    elif n_src == 2 * depth:
        src_of = lambda i: 2 * i + 1  # every-other init (ref xvlm.py:215-217)
    else:
        raise ValueError(
            f"CLIP layer-count mismatch: checkpoint has {n_src}, model wants "
            f"{depth} (only N->N and 2N->N every-other init are defined)")
    for i in range(depth):
        p = f"encoder.layers.{src_of(i)}"
        q = f"block_{i}"
        if f"{p}.self_attn.q_proj.weight" not in norm:
            continue
        for src, dst in (("q_proj", "query"), ("k_proj", "key"),
                         ("v_proj", "value"), ("out_proj", "out")):
            _set(tree, f"{q}/attn/{dst}/kernel",
                 _t(take(f"{p}.self_attn.{src}.weight")))
            _set(tree, f"{q}/attn/{dst}/bias", take(f"{p}.self_attn.{src}.bias"))
        for ln in ("layer_norm1", "layer_norm2"):
            _set(tree, f"{q}/{ln}/scale", take(f"{p}.{ln}.weight"))
            _set(tree, f"{q}/{ln}/bias", take(f"{p}.{ln}.bias"))
        _set(tree, f"{q}/fc1/kernel", _t(take(f"{p}.mlp.fc1.weight")))
        _set(tree, f"{q}/fc1/bias", take(f"{p}.mlp.fc1.bias"))
        _set(tree, f"{q}/fc2/kernel", _t(take(f"{p}.mlp.fc2.weight")))
        _set(tree, f"{q}/fc2/bias", take(f"{p}.mlp.fc2.bias"))
    return tree, sorted(set(norm) - used)


def _interp_swin_rel_pos_table(table: np.ndarray, dst_window: int
                               ) -> np.ndarray:
    """Resize a Swin relative-position bias table from its (2*sw-1)² lattice
    to (2*dw-1)² (reference relative_position_bias_table_resize uses bicubic
    F.interpolate, swin_transformer.py:61-77; Swin tables have no cls rows)."""
    rows, heads = table.shape
    src = int(round(math.isqrt(rows)))
    dst = 2 * dst_window - 1
    if src == dst:
        return table
    body = jnp.asarray(table.reshape(src, src, heads))
    resized = jax.image.resize(body, (dst, dst, heads), "cubic")
    return np.asarray(resized).reshape(dst * dst, heads)


def convert_swin_checkpoint(sd: Dict[str, np.ndarray], *,
                            depths: tuple,
                            dst_window: Optional[int] = None
                            ) -> Dict[str, Any]:
    """Import a Swin checkpoint (timm layout: ``layers.{s}.blocks.{b}...``)
    into the SwinTransformer tree (reference load_pretrained_swin,
    swin_transformer.py:17-114). ``dst_window`` bicubically interpolates the
    per-block relative-position bias tables when the target window differs
    (reference swin_transformer.py:61-77,698) — e.g. fine-tuning a
    window-7/224px checkpoint at window-12/384px."""
    tree: Dict[str, Any] = {}
    used = set()

    def maybe_interp(table):
        if dst_window is not None:
            return _interp_swin_rel_pos_table(table, dst_window)
        return table

    def take(key):
        used.add(key)
        return sd[key]

    if "patch_embed.proj.weight" in sd:
        w = take("patch_embed.proj.weight")
        _set(tree, "patch_embed/kernel", w.transpose(2, 3, 1, 0))
        _set(tree, "patch_embed/bias", take("patch_embed.proj.bias"))
    if "patch_embed.norm.weight" in sd:
        _set(tree, "patch_norm/scale", take("patch_embed.norm.weight"))
        _set(tree, "patch_norm/bias", take("patch_embed.norm.bias"))
    if "norm.weight" in sd:
        _set(tree, "norm/scale", take("norm.weight"))
        _set(tree, "norm/bias", take("norm.bias"))
    for s, depth in enumerate(depths):
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            q = f"stage_{s}_block_{b}"
            if f"{p}.norm1.weight" not in sd:
                continue
            for ln in ("norm1", "norm2"):
                _set(tree, f"{q}/{ln}/scale", take(f"{p}.{ln}.weight"))
                _set(tree, f"{q}/{ln}/bias", take(f"{p}.{ln}.bias"))
            _set(tree, f"{q}/attn/qkv/kernel", _t(take(f"{p}.attn.qkv.weight")))
            _set(tree, f"{q}/attn/qkv/bias", take(f"{p}.attn.qkv.bias"))
            _set(tree, f"{q}/attn/proj/kernel", _t(take(f"{p}.attn.proj.weight")))
            _set(tree, f"{q}/attn/proj/bias", take(f"{p}.attn.proj.bias"))
            _set(tree, f"{q}/attn/rel_pos_table",
                 maybe_interp(take(f"{p}.attn.relative_position_bias_table")))
            used.add(f"{p}.attn.relative_position_index")
            _set(tree, f"{q}/mlp/fc1/kernel", _t(take(f"{p}.mlp.fc1.weight")))
            _set(tree, f"{q}/mlp/fc1/bias", take(f"{p}.mlp.fc1.bias"))
            _set(tree, f"{q}/mlp/fc2/kernel", _t(take(f"{p}.mlp.fc2.weight")))
            _set(tree, f"{q}/mlp/fc2/bias", take(f"{p}.mlp.fc2.bias"))
        if f"layers.{s}.downsample.reduction.weight" in sd:
            _set(tree, f"merge_{s}/reduction/kernel",
                 _t(take(f"layers.{s}.downsample.reduction.weight")))
            _set(tree, f"merge_{s}/norm/scale",
                 take(f"layers.{s}.downsample.norm.weight"))
            _set(tree, f"merge_{s}/norm/bias",
                 take(f"layers.{s}.downsample.norm.bias"))
    unused = sorted(k for k in set(sd) - used
                    if "attn_mask" not in k and "relative_position_index" not in k
                    and not k.startswith("head."))
    return tree, unused


def convert_hf_bert_checkpoint(sd: Dict[str, np.ndarray], *,
                               to_layers: Optional[int] = None,
                               fusion_layer: int = 12) -> Dict[str, Any]:
    """Import a raw HF BERT/RoBERTa checkpoint (keys ``bert.encoder.layer...``
    or ``encoder.layer...``) as a text-encoder(+mlm head) tree, optionally
    expanding 12→N layers by duplicating the upper half into the fusion slots
    (reference build_text_encoder:286-387). Cross-attention params stay fresh
    (the reference's init_params / lr_mult story)."""
    from x2vlm_tpu.factory import expand_text_layers

    renamed = {}
    for k, v in sd.items():
        if k.startswith("bert.") or k.startswith("roberta."):
            renamed["text_encoder." + k] = v
        elif k.startswith("cls.") or k.startswith("lm_head."):
            renamed["text_encoder." + k] = v
        elif k.startswith("embeddings.") or k.startswith("encoder."):
            renamed["text_encoder.bert." + k] = v
        else:
            renamed["text_encoder." + k] = v
    tree, unused = convert_xvlm_state_dict(renamed, vision_depth=0)
    text = tree.get("text_encoder", {})
    if to_layers is not None:
        from_layers = 1 + max(
            (int(k.split("_")[1]) for k in text if k.startswith("layer_")),
            default=-1)
        text = expand_text_layers(text, from_layers=from_layers,
                                  to_layers=to_layers,
                                  fusion_layer=fusion_layer)
    out = {"text_encoder": text}
    if "mlm_head" in tree:
        out["mlm_head"] = tree["mlm_head"]
    return out, unused


def convert_checkpoint_auto(sd: Dict[str, np.ndarray], *, vision_cfg=None,
                            text_layers: Optional[int] = None,
                            text_fusion_layer: int = 12):
    """Sniff a torch state dict's flavor and convert it (reference: each
    backbone/stage has its own loader — load_pretrained_beit2, the CLIP/Swin
    branches of build_vision_encoder xvlm.py:172-283, load_pretrained_text
    xvlm.py:1124-1138, and whole-model load_pretrained xvlm.py:390-460).

    Recognized flavors → (tree, unused, kind):
    - full XVLM/X2-VLM ``.th`` (``vision_encoder.*`` / ``text_encoder.*``)
    - raw HF CLIP vision tower (``vision_model.*`` / ``encoder.layers.*``)
    - raw timm Swin (``layers.N.blocks.*``)
    - raw BEiT-2 (``blocks.N.*``, optional shared ``rel_pos_bias`` table)
    - raw HF BERT/RoBERTa (``bert./roberta./encoder.layer.*``)
    """
    from x2vlm_tpu.models.beit2 import BEiT2Config

    def beit_window():
        return (vision_cfg.window[0]
                if isinstance(vision_cfg, BEiT2Config) else None)

    if any(k.startswith(("vision_encoder.", "text_encoder.")) for k in sd):
        depth = getattr(vision_cfg, "depth", 40) or 40
        tree, unused = convert_xvlm_state_dict(
            sd, vision_depth=depth, dst_window=beit_window(),
            vision_cfg=vision_cfg)
        return tree, unused, "xvlm"
    if any(k.startswith("vision_model.") or k.endswith("class_embedding")
           or k.startswith("encoder.layers.") for k in sd):
        vtree, unused = convert_clip_vit_checkpoint(
            sd, depth=getattr(vision_cfg, "depth", 12))
        return {"vision_encoder": vtree}, unused, "clip"
    if any(re.match(r"layers\.\d+\.blocks\.", k) for k in sd):
        vtree, unused = convert_swin_checkpoint(
            sd, depths=getattr(vision_cfg, "depths", (2, 2, 18, 2)),
            dst_window=getattr(vision_cfg, "window_size", None))
        return {"vision_encoder": vtree}, unused, "swin"
    if any(re.match(r"blocks\.\d+\.", k) for k in sd) or \
            "rel_pos_bias.relative_position_bias_table" in sd:
        vtree, unused = convert_beit2_checkpoint(
            sd, depth=getattr(vision_cfg, "depth", 12),
            dst_window=beit_window())
        return {"vision_encoder": vtree}, unused, "beit2"
    if any(k.startswith(("bert.", "roberta.", "encoder.layer.",
                         "embeddings.word_embeddings")) for k in sd):
        tree, unused = convert_hf_bert_checkpoint(
            sd, to_layers=text_layers, fusion_layer=text_fusion_layer)
        return tree, unused, "bert"
    raise ValueError(
        "unrecognized checkpoint flavor; expected an XVLM .th, a raw "
        "CLIP/Swin/BEiT-2 vision tower, or an HF BERT/RoBERTa state dict "
        f"(first keys: {sorted(sd)[:5]})")


def split_imported_to_plus(tree: Dict[str, Any], *,
                           xvlm_text_layers: Optional[int] = None,
                           replace_text_encoder: bool = False
                           ) -> Dict[str, Any]:
    """Base→Plus checkpoint surgery on a converted tree: the fused 18-layer
    text stack splits into text[0:T] / cross_encoder[T:] (reference
    load_pretrained_xvlm, xvlm.py:1073-1121; ``T`` is the config's
    ``xvlm_ckpt_text_num_hidden_layers``). With ``replace_text_encoder``
    (CCLM: a fresh XLM-R takes the text tower's place) the text tower is
    dropped and the MLM head keeps only its vocab-independent transform
    (the reference deletes cls.predictions.decoder/bias, xvlm.py:1105-1115).
    """
    from x2vlm_tpu.models.xvlm_plus import split_params_to_plus

    text = tree.get("text_encoder", {})
    n_layers = 1 + max((int(k.split("_")[1]) for k in text
                        if k.startswith("layer_")), default=-1)
    if xvlm_text_layers is None:
        xvlm_text_layers = 12
    out = split_params_to_plus(tree, fusion_layer=xvlm_text_layers,
                               num_layers=n_layers,
                               replace_text_encoder=replace_text_encoder)
    if replace_text_encoder and "mlm_head" in out:
        head = {k: v for k, v in out["mlm_head"].items()
                if k not in ("decoder", "decoder_bias")}
        out["mlm_head"] = head
    return out


# ---------- native checkpointing (orbax) ----------

def save_train_state(ckpt_dir: str, state, step: int):
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_train_state(ckpt_dir: str, abstract_state, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            return None, None
        if abstract_state is None:
            restored = mgr.restore(step)
        else:
            restored = mgr.restore(
                step, args=ocp.args.StandardRestore(abstract_state))
        return restored, step
