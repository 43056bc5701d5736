"""Captioning task: batched beam-search generation over an eval set
(reference Captioning_MLM.py:74-103)."""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from x2vlm_tpu.models.captioning import (
    beam_search_generate, beam_search_generate_device,
)

__all__ = ["generate_captions"]


def generate_captions(model, variables, dataset, tokenizer, *,
                      prompt: str = "", num_beams: int = 3, min_length: int = 5,
                      max_length: int = 20, length_penalty: float = 0.0,
                      batch_size: int = 16,
                      host_id: int = 0, num_hosts: int = 1,
                      on_device: bool = True) -> List[Dict]:
    """Returns [{image_id, caption}]. ``on_device=True`` (default) runs the
    whole beam search as one jitted fori_loop dispatch per batch (identical
    outputs to the host-driven loop — cross-checked in tests); the host
    variant remains for debugging."""
    prompt_ids = tokenizer.convert_tokens_to_ids(
        [tokenizer.cls_token] + (tokenizer.tokenize(prompt) if prompt else []))
    n = len(dataset)
    step = n // num_hosts + 1
    indices = list(range(host_id * step, min(n, (host_id + 1) * step)))
    results: List[Dict] = []
    for lo in range(0, len(indices), batch_size):
        chunk = indices[lo: lo + batch_size]
        samples = [dataset[i] for i in chunk]
        rows = samples + [samples[-1]] * (batch_size - len(samples))
        image = jnp.asarray(np.stack([s["image"] for s in rows]))
        search = beam_search_generate_device if on_device else \
            beam_search_generate
        seqs = search(
            model, variables, image, prompt_ids,
            mask_token_id=tokenizer.mask_token_id,
            eos_token_id=tokenizer.sep_token_id,
            num_beams=num_beams, min_length=min_length, max_length=max_length,
            length_penalty=length_penalty)
        for j, s in enumerate(samples):
            caption = tokenizer.decode(seqs[j], skip_special_tokens=True)
            results.append({"image_id": int(s["image_id"]), "caption": caption})
    return results
