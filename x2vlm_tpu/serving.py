"""Deployment export: AOT-serialized StableHLO serving bundles (jax.export).

The reference has no deployment story (training scripts double as eval
servers); the TPU-native posture is to export the retrieval serving path —
the two encoders and the ITM rerank head (reference Retrieval.py:126-137
two-stage protocol) — as *portable compiled programs*:

    bundle/
      manifest.json        shapes, dtypes, platforms, model config echo
      params.npz           flat '/'-joined param arrays (weights)
      encode_images.jexp   Exported: (params, images) -> (embeds, feat)
      encode_texts.jexp    Exported: (params, ids, atts) -> (embeds, feat)
      itm_score.jexp       Exported: (params, img_embeds, txt_embeds, txt_atts)
                           -> (N,) match scores

Weights are ARGUMENTS, not baked constants: the .jexp artifacts carry only
the lowered program (StableHLO), so they are small, and a fine-tuned params
swap does not need a re-export. `load_bundle` rehydrates everything and
serves through `ServingBundle.encode_images/encode_texts/itm_score`, which
run the deserialized programs via jax on whatever backend matches the
export platforms.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["export_retrieval_bundle", "export_captioning_bundle",
           "export_vqa_bundle", "export_grounding_bundle", "load_bundle",
           "load_captioning_bundle", "load_vqa_bundle",
           "load_grounding_bundle", "ServingBundle", "CaptioningBundle",
           "VQABundle", "GroundingBundle", "save_params_npz",
           "load_params_npz"]


def _flatten(params: Dict) -> Dict[str, np.ndarray]:
    out = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            out[prefix] = np.asarray(node)

    walk(params, "")
    return out


def save_params_npz(path: str, variables: Dict) -> None:
    np.savez(path, **_flatten(variables))


def load_params_npz(path: str) -> Dict:
    flat = np.load(path)
    tree: Dict = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return tree


def _spec(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree)


def export_retrieval_bundle(
    model,
    variables: Dict,
    out_dir: str,
    *,
    batch_images: int,
    batch_texts: int,
    max_tokens: int,
    rerank_pairs: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    mesh: Optional[Mesh] = None,
    config_echo: Optional[Dict] = None,
) -> Dict[str, str]:
    """Export the three retrieval serving programs + weights to ``out_dir``.

    ``platforms``: jax.export platform list (e.g. ["tpu"], ["cpu"]); None =
    the current default backend. Shapes are static (the TPU contract): one
    artifact per batch geometry — export again for other batch sizes.

    ``mesh``: a 1-axis ("data") device mesh for MULTI-CHIP serving — the
    programs are exported with params replicated and batches sharded over
    the axis (batch_* are then GLOBAL batch sizes and must divide the mesh);
    `load_bundle(dir, mesh=...)` replays them across the same device count.
    """
    os.makedirs(out_dir, exist_ok=True)
    cfg = model.config
    res = cfg.vision.image_res
    rerank_pairs = rerank_pairs or batch_texts

    pspec = _spec(variables)
    images = jax.ShapeDtypeStruct((batch_images, res, res, 3), jnp.float32)
    ids = jax.ShapeDtypeStruct((batch_texts, max_tokens), jnp.int32)
    atts = jax.ShapeDtypeStruct((batch_texts, max_tokens), jnp.int32)

    def enc_i(v, image):
        return model.apply(v, image, method=model.encode_images)

    def enc_t(v, ids, atts):
        return model.apply(v, ids, atts, method=model.encode_texts)

    def shardings(n_batch_args):
        if mesh is None:
            return {}
        rep = NamedSharding(mesh, PartitionSpec())
        dat = NamedSharding(mesh, PartitionSpec("data"))
        params_sh = jax.tree_util.tree_map(lambda _: rep, pspec)
        return {"in_shardings": (params_sh,) + (dat,) * n_batch_args,
                "out_shardings": dat}

    kw = dict(platforms=list(platforms)) if platforms else {}
    exp_i = jexport.export(jax.jit(enc_i, **shardings(1)), **kw)(pspec, images)
    exp_t = jexport.export(jax.jit(enc_t, **shardings(2)), **kw)(pspec, ids,
                                                                 atts)

    # rerank shapes come from the encoders' output avals
    img_embeds_aval = exp_i.out_avals[0]
    txt_embeds_aval = exp_t.out_avals[0]
    ie = jax.ShapeDtypeStruct((rerank_pairs,) + img_embeds_aval.shape[1:],
                              img_embeds_aval.dtype)
    te = jax.ShapeDtypeStruct((rerank_pairs,) + txt_embeds_aval.shape[1:],
                              txt_embeds_aval.dtype)
    ta = jax.ShapeDtypeStruct((rerank_pairs, max_tokens), jnp.int32)

    def score(v, image_embeds, text_embeds, text_atts):
        return model.apply(v, image_embeds, text_embeds, text_atts,
                           method=model.itm_score)

    exp_s = jexport.export(jax.jit(score, **shardings(3)), **kw)(
        pspec, ie, te, ta)

    artifacts = {}
    for name, exp in (("encode_images", exp_i), ("encode_texts", exp_t),
                      ("itm_score", exp_s)):
        path = os.path.join(out_dir, f"{name}.jexp")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        artifacts[name] = path
    save_params_npz(os.path.join(out_dir, "params.npz"), variables)

    manifest = {
        "artifacts": sorted(artifacts),
        "platforms": list(exp_i.platforms),
        "nr_devices": int(exp_i.nr_devices),
        "batch_images": batch_images,
        "batch_texts": batch_texts,
        "rerank_pairs": rerank_pairs,
        "image_res": res,
        "max_tokens": max_tokens,
        "embed_dim": int(cfg.embed_dim),
        "config": config_echo or {},
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return artifacts


def export_captioning_bundle(
    model,
    variables: Dict,
    out_dir: str,
    *,
    batch: int,
    prompt_ids: Sequence[int],
    mask_token_id: int,
    eos_token_id: int,
    num_beams: int = 3,
    min_length: int = 5,
    max_length: int = 20,
    forbid_duplicate_ngrams: bool = True,
    ngram_size: int = 3,
    platforms: Optional[Sequence[str]] = None,
    config_echo: Optional[Dict] = None,
) -> str:
    """Export the FULL on-device UniLM beam search (encode + steps×[decode,
    top-K² merge, EOS freeze, n-gram block, cache reorder] as one program;
    models/captioning.beam_search_generate_device) to
    ``out_dir/beam_search.jexp``. The cheap traceback stays host-side at
    serve time (CaptioningBundle.generate), where length_penalty remains a
    runtime knob."""
    from x2vlm_tpu.models.captioning import _device_search_cache

    os.makedirs(out_dir, exist_ok=True)
    res = model.config.vision.image_res
    run = _device_search_cache(
        model, batch, num_beams, tuple(prompt_ids), int(mask_token_id),
        int(eos_token_id), int(min_length), int(max_length),
        bool(forbid_duplicate_ngrams), int(ngram_size))
    pspec = _spec(variables)
    images = jax.ShapeDtypeStruct((batch, res, res, 3), jnp.float32)
    kw = dict(platforms=list(platforms)) if platforms else {}
    exp = jexport.export(run, **kw)(pspec, images)
    path = os.path.join(out_dir, "beam_search.jexp")
    with open(path, "wb") as f:
        f.write(exp.serialize())
    save_params_npz(os.path.join(out_dir, "params.npz"), variables)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({
            "artifacts": ["beam_search"],
            "platforms": list(exp.platforms),
            "nr_devices": int(exp.nr_devices),
            "batch": batch, "image_res": res,
            "prompt_ids": [int(i) for i in prompt_ids],
            "mask_token_id": int(mask_token_id),
            "eos_token_id": int(eos_token_id),
            "num_beams": num_beams, "min_length": min_length,
            "max_length": max_length,
            "config": config_echo or {},
        }, f, indent=2)
    return path


def export_vqa_bundle(
    model,
    variables: Dict,
    out_dir: str,
    *,
    batch: int,
    question_len: int,
    n_answers: int,
    answer_len: int,
    k_test: int = 128,
    platforms: Optional[Sequence[str]] = None,
    config_echo: Optional[Dict] = None,
) -> str:
    """Export the generate-as-rank VQA program (reference VQA protocol:
    decoder scores the k_test ITM-shortlisted answers; tasks/vqa.py) as
    ``out_dir/rank_answers.jexp``. The answer list is an ARGUMENT
    (n_answers × answer_len token ids + atts), so one artifact serves any
    answer vocabulary of that geometry."""
    os.makedirs(out_dir, exist_ok=True)
    res = model.config.vision.image_res
    k = min(k_test, n_answers)

    def rank(v, image, q_ids, q_atts, ans_ids, ans_atts):
        batch_d = {"image": image, "question_ids": q_ids,
                   "question_atts": q_atts, "answer_ids": ans_ids,
                   "answer_atts": ans_atts}
        return model.apply(v, batch_d, k, method=model.predict)

    pspec = _spec(variables)
    args = (pspec,
            jax.ShapeDtypeStruct((batch, res, res, 3), jnp.float32),
            jax.ShapeDtypeStruct((batch, question_len), jnp.int32),
            jax.ShapeDtypeStruct((batch, question_len), jnp.int32),
            jax.ShapeDtypeStruct((n_answers, answer_len), jnp.int32),
            jax.ShapeDtypeStruct((n_answers, answer_len), jnp.int32))
    kw = dict(platforms=list(platforms)) if platforms else {}
    exp = jexport.export(jax.jit(rank), **kw)(*args)
    path = os.path.join(out_dir, "rank_answers.jexp")
    with open(path, "wb") as f:
        f.write(exp.serialize())
    save_params_npz(os.path.join(out_dir, "params.npz"), variables)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({"artifacts": ["rank_answers"],
                   "platforms": list(exp.platforms),
                   "nr_devices": int(exp.nr_devices),
                   "batch": batch, "image_res": res,
                   "question_len": question_len, "n_answers": n_answers,
                   "answer_len": answer_len, "k_test": k,
                   "config": config_echo or {}}, f, indent=2)
    return path


@dataclasses.dataclass
class VQABundle:
    manifest: Dict[str, Any]
    params: Dict
    _rank: Any

    def rank(self, image, q_ids, q_atts, answer_ids, answer_atts):
        """→ (topk answer indices, topk scores); row 0 is the prediction."""
        return self._rank.call(self.params, jnp.asarray(image),
                               jnp.asarray(q_ids), jnp.asarray(q_atts),
                               jnp.asarray(answer_ids),
                               jnp.asarray(answer_atts))


def load_vqa_bundle(bundle_dir: str) -> VQABundle:
    with open(os.path.join(bundle_dir, "manifest.json")) as f:
        manifest = json.load(f)
    params = load_params_npz(os.path.join(bundle_dir, "params.npz"))
    with open(os.path.join(bundle_dir, "rank_answers.jexp"), "rb") as f:
        rank = jexport.deserialize(bytearray(f.read()))
    return VQABundle(manifest=manifest, params=params, _rank=rank)


def export_grounding_bundle(
    model,
    variables: Dict,
    out_dir: str,
    *,
    batch: int,
    max_tokens: int,
    platforms: Optional[Sequence[str]] = None,
    config_echo: Optional[Dict] = None,
) -> str:
    """Export the visual-grounding predictor (image + referring expression →
    sigmoid cxcywh box in [0,1]; reference model_grounding.py:18-30) as
    ``out_dir/predict_bbox.jexp``."""
    os.makedirs(out_dir, exist_ok=True)
    res = model.config.vision.image_res

    def predict(v, image, text_ids, text_atts):
        return model.apply(v, image, text_ids, text_atts,
                           method=model.predict)

    pspec = _spec(variables)
    args = (pspec,
            jax.ShapeDtypeStruct((batch, res, res, 3), jnp.float32),
            jax.ShapeDtypeStruct((batch, max_tokens), jnp.int32),
            jax.ShapeDtypeStruct((batch, max_tokens), jnp.int32))
    kw = dict(platforms=list(platforms)) if platforms else {}
    exp = jexport.export(jax.jit(predict), **kw)(*args)
    path = os.path.join(out_dir, "predict_bbox.jexp")
    with open(path, "wb") as f:
        f.write(exp.serialize())
    save_params_npz(os.path.join(out_dir, "params.npz"), variables)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({"artifacts": ["predict_bbox"],
                   "platforms": list(exp.platforms),
                   "nr_devices": int(exp.nr_devices),
                   "batch": batch, "image_res": res,
                   "max_tokens": max_tokens,
                   "config": config_echo or {}}, f, indent=2)
    return path


@dataclasses.dataclass
class GroundingBundle:
    manifest: Dict[str, Any]
    params: Dict
    _predict: Any

    def predict(self, image, text_ids, text_atts):
        """→ (B, 4) cxcywh boxes, normalized to [0, 1]."""
        return self._predict.call(self.params, jnp.asarray(image),
                                  jnp.asarray(text_ids),
                                  jnp.asarray(text_atts))


def load_grounding_bundle(bundle_dir: str) -> GroundingBundle:
    with open(os.path.join(bundle_dir, "manifest.json")) as f:
        manifest = json.load(f)
    params = load_params_npz(os.path.join(bundle_dir, "params.npz"))
    with open(os.path.join(bundle_dir, "predict_bbox.jexp"), "rb") as f:
        predict = jexport.deserialize(bytearray(f.read()))
    return GroundingBundle(manifest=manifest, params=params, _predict=predict)


@dataclasses.dataclass
class CaptioningBundle:
    manifest: Dict[str, Any]
    params: Dict
    _run: Any

    def generate(self, images, length_penalty: float = 0.0):
        """→ list of token-id sequences (caller detokenizes)."""
        from x2vlm_tpu.models.captioning import _trace_back

        ids_hist, ptr_hist, score_hist = self._run.call(
            self.params, jnp.asarray(images))
        return _trace_back(
            self.manifest["batch"], list(np.asarray(ids_hist)),
            list(np.asarray(ptr_hist)), list(np.asarray(score_hist)),
            self.manifest["eos_token_id"], length_penalty)


def load_captioning_bundle(bundle_dir: str) -> CaptioningBundle:
    with open(os.path.join(bundle_dir, "manifest.json")) as f:
        manifest = json.load(f)
    params = load_params_npz(os.path.join(bundle_dir, "params.npz"))
    with open(os.path.join(bundle_dir, "beam_search.jexp"), "rb") as f:
        run = jexport.deserialize(bytearray(f.read()))
    return CaptioningBundle(manifest=manifest, params=params, _run=run)


@dataclasses.dataclass
class ServingBundle:
    """Rehydrated serving bundle: deserialized programs + loaded weights.

    For multi-device bundles (manifest nr_devices > 1) a matching 1-axis
    mesh must be supplied to :func:`load_bundle`; batch inputs are global
    arrays, sharded over the mesh's axis on entry."""

    manifest: Dict[str, Any]
    params: Dict
    _encode_images: Any
    _encode_texts: Any
    _itm_score: Any

    def encode_images(self, images):
        return self._encode_images(self.params, jnp.asarray(images))

    def encode_texts(self, ids, atts):
        return self._encode_texts(self.params, jnp.asarray(ids),
                                  jnp.asarray(atts))

    def itm_score(self, image_embeds, text_embeds, text_atts):
        return self._itm_score(self.params, image_embeds, text_embeds,
                               jnp.asarray(text_atts))


def load_bundle(bundle_dir: str, mesh: Optional[Mesh] = None) -> ServingBundle:
    with open(os.path.join(bundle_dir, "manifest.json")) as f:
        manifest = json.load(f)
    params = load_params_npz(os.path.join(bundle_dir, "params.npz"))
    n_dev = int(manifest.get("nr_devices", 1))
    if n_dev > 1:
        if mesh is None:
            raise ValueError(
                f"bundle was exported for {n_dev} devices — pass a 1-axis "
                f"mesh of {n_dev} devices to load_bundle(mesh=...)")
        if mesh.size != n_dev:
            raise ValueError(f"mesh has {mesh.size} devices, bundle needs "
                             f"{n_dev}")
        params = jax.device_put(
            params, NamedSharding(mesh, PartitionSpec()))

    def load(name):
        with open(os.path.join(bundle_dir, f"{name}.jexp"), "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        if n_dev <= 1:
            return exp.call
        # multi-device replay: the exported program carries its shardings;
        # wrap in a jit whose device context is the mesh (inputs are put
        # onto it before the call)
        dat = NamedSharding(mesh, PartitionSpec("data"))
        jit_call = jax.jit(exp.call)

        def call(p, *xs):
            return jit_call(p, *(jax.device_put(jnp.asarray(x), dat)
                                 for x in xs))

        return call

    return ServingBundle(manifest=manifest, params=params,
                         _encode_images=load("encode_images"),
                         _encode_texts=load("encode_texts"),
                         _itm_score=load("itm_score"))
