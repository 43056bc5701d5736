"""Self-critical sequence training (SCST) for captioning.

The reference ships ``ScstRewardCriterion`` (utils/__init__.py:17-98) and a
``--scst`` flag (Captioning_MLM.py:272) but never wires a training loop —
the flag is dead code. This module provides the full working loop, one step:

1. sample ``num_samples`` caption rollouts per image on-device
   (``sample_generate_captioning`` — one jitted dispatch);
2. CIDEr-D advantages with a leave-one-out baseline (train/scst.py);
3. one policy-gradient step: advantage-weighted NLL of the sampled captions
   under the UniLM factorization (every token predicted from a [MASK] at its
   position with tril visibility — the dataset's FG-free encoding with
   mask probability 1).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from x2vlm_tpu.models.captioning import sample_generate_captioning
from x2vlm_tpu.train.scst import scst_rewards

__all__ = ["build_scst_batch", "scst_train_step"]


def _encode_row(token_ids: List[int], prompt_ids: List[int], *,
                mask_token_id: int, sep_token_id: int, pad_token_id: int,
                L: int, max_masks: int) -> Dict[str, np.ndarray]:
    """FG-free UniLM encoding of one sampled caption with EVERY caption token
    (and the closing [SEP]) as a prediction target (data/finetune.py
    fg_free preprocessing with mask probability 1)."""
    toks = list(prompt_ids) + list(token_ids) + [sep_token_id]
    n_src = len(prompt_ids)
    seq: List[int] = []
    pos: List[int] = []
    masked_pos: List[int] = []
    masked_ids: List[int] = []
    for p, tok in enumerate(toks):
        if p >= n_src and len(masked_pos) < max_masks:
            masked_pos.append(len(seq))
            seq.append(mask_token_id)
            pos.append(p)
            masked_ids.append(tok)
        seq.append(tok)
        pos.append(p)
    seq = seq[:L]
    pos = pos[:L]
    atts = np.tril(np.ones((L, L), np.int32))
    for mp in masked_pos:
        if mp < L:
            atts[:, mp] = 0
            atts[mp, mp] = 1
    pad = L - len(seq)
    seq = seq + [pad_token_id] * pad
    nxt = (pos[-1] + 1) if pos else 0
    pos = pos + list(range(nxt, nxt + pad))
    n_mask = len(masked_pos)
    pad_m = max_masks - n_mask
    # a caption longer than L can leave masked slots beyond the truncated
    # sequence — zero their weight so the clamped mlm gather never trains on
    # the wrong row
    weight = [1.0 if mp < L else 0.0 for mp in masked_pos] + [0.0] * pad_m
    masked_pos = [min(mp, L - 1) for mp in masked_pos]
    masked_pos = masked_pos + [0] * pad_m
    masked_ids = masked_ids + [-100] * pad_m
    return {
        "text_ids_masked": np.asarray(seq, np.int32),
        "text_atts_matrix": atts,
        "position_ids": np.asarray(pos, np.int32),
        "masked_pos": np.asarray(masked_pos, np.int32),
        "masked_ids": np.asarray(masked_ids, np.int32),
        "masked_weight": np.asarray(weight, np.float32),
    }


def build_scst_batch(images: jnp.ndarray, sampled: Sequence[List[int]],
                     advantages: np.ndarray, prompt_ids: List[int], *,
                     mask_token_id: int, sep_token_id: int,
                     pad_token_id: int, max_length: int) -> Dict:
    """images (B, ...); sampled: B·k token lists image-major; advantages
    (B·k,). Returns the training batch for the policy-gradient step."""
    B = images.shape[0]
    k = len(sampled) // B
    max_masks = max_length + 1                       # caption tokens + [SEP]
    L = len(prompt_ids) + 2 * max_masks
    rows = [
        _encode_row(s, prompt_ids, mask_token_id=mask_token_id,
                    sep_token_id=sep_token_id, pad_token_id=pad_token_id,
                    L=L, max_masks=max_masks)
        for s in sampled
    ]
    batch = {key: jnp.asarray(np.stack([r[key] for r in rows]))
             for key in rows[0]}
    batch["image"] = jnp.repeat(images, k, axis=0)
    batch["sample_weights"] = jnp.asarray(advantages, jnp.float32)
    return batch


def scst_train_step(model, state, step_fn, images: jnp.ndarray,
                    references: Sequence[List[str]], tokenizer, rng, *,
                    prompt_ids: List[int], num_samples: int = 5,
                    max_length: int = 20, temperature: float = 1.0):
    """One SCST step. ``step_fn`` is a make_train_step-style callable.
    Returns (new_state, metrics, sampled_captions)."""
    sampled_ids = sample_generate_captioning(
        model, {"params": state.params}, images, prompt_ids, rng,
        mask_token_id=tokenizer.mask_token_id,
        eos_token_id=tokenizer.sep_token_id,
        num_samples=num_samples, max_length=max_length,
        temperature=temperature)
    captions = [tokenizer.decode(s, skip_special_tokens=True)
                for s in sampled_ids]
    adv = scst_rewards(captions, list(references),
                       num_samples_per_image=num_samples)
    batch = build_scst_batch(
        images, sampled_ids, adv, prompt_ids,
        mask_token_id=tokenizer.mask_token_id,
        sep_token_id=tokenizer.sep_token_id,
        pad_token_id=tokenizer.pad_token_id, max_length=max_length)
    state, metrics = step_fn(state, batch, rng)
    return state, metrics, captions
