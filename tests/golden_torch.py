"""Torch golden fixture for checkpoint-import parity tests.

A minimal, independent torch implementation of the reference model *semantics*
(BEiT-2 blocks with per-block relative-position bias + LayerScale + mean-pool
output; BERT embeddings + self/cross post-LN layers with the fusion split;
MLM/ITM/bbox/projection heads), whose ``state_dict()`` uses the **reference's
key naming** (vision_encoder.blocks.{i}.attn.qkv.weight, ...). Import parity
against this fixture validates both the torch→flax key mapping and our forward
math without needing the released checkpoints (not available offline).
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def rel_pos_index(window):
    wh, ww = window
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return torch.from_numpy(idx), num_rel


class GoldenBeitAttention(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.randn(dim) * 0.02)
        self.v_bias = nn.Parameter(torch.randn(dim) * 0.02)
        idx, num_rel = rel_pos_index(window)
        self.register_buffer("relative_position_index", idx)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn(num_rel, heads) * 0.02)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv_bias = torch.cat(
            [self.q_bias, torch.zeros_like(self.v_bias), self.v_bias])
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(B, N, 3, self.heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.proj(x)


class GoldenBeitBlock(nn.Module):
    def __init__(self, dim, heads, window, mlp_ratio=4.0, init_values=0.1):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = GoldenBeitAttention(dim, heads, window)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, hidden)
        self.mlp.fc2 = nn.Linear(hidden, dim)
        self.gamma_1 = nn.Parameter(init_values * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_values * torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.gamma_2 * h


class GoldenBeit(nn.Module):
    """state-dict prefix: matches reference beit2 VisionTransformer naming."""

    def __init__(self, image_res, patch, dim, depth, heads):
        super().__init__()
        w = image_res // patch
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [GoldenBeitBlock(dim, heads, (w, w)) for _ in range(depth)])
        self.fc_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):  # x: (B, 3, H, W)
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        patches = self.fc_norm(x[:, 1:])
        pooled = patches.mean(dim=1, keepdim=True)
        return torch.cat([pooled, patches], dim=1)


class GoldenBertSelfAttn(nn.Module):
    def __init__(self, dim, heads, kv_dim=None):
        super().__init__()
        self.heads = heads
        self.self = nn.Module()
        self.self.query = nn.Linear(dim, dim)
        self.self.key = nn.Linear(kv_dim or dim, dim)
        self.self.value = nn.Linear(kv_dim or dim, dim)
        self.output = nn.Module()
        self.output.dense = nn.Linear(dim, dim)
        self.output.LayerNorm = nn.LayerNorm(dim, eps=1e-12)

    def forward(self, x, kv=None, key_mask=None):
        B, N, C = x.shape
        src = x if kv is None else kv
        d = C // self.heads

        def split(t):
            return t.view(B, -1, self.heads, d).transpose(1, 2)

        q = split(self.self.query(x))
        k = split(self.self.key(src))
        v = split(self.self.value(src))
        attn = (q @ k.transpose(-2, -1)) * (d ** -0.5)
        if key_mask is not None:
            attn = attn.masked_fill(
                ~key_mask[:, None, None, :].bool(), float(-1e30))
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.output.LayerNorm(x + self.output.dense(h))


class GoldenBertLayer(nn.Module):
    def __init__(self, dim, heads, intermediate, kv_dim, has_cross):
        super().__init__()
        self.attention = GoldenBertSelfAttn(dim, heads)
        if has_cross:
            self.crossattention = GoldenBertSelfAttn(dim, heads, kv_dim=kv_dim)
        self.intermediate = nn.Module()
        self.intermediate.dense = nn.Linear(dim, intermediate)
        self.output = nn.Module()
        self.output.dense = nn.Linear(intermediate, dim)
        self.output.LayerNorm = nn.LayerNorm(dim, eps=1e-12)

    def forward(self, x, key_mask, img=None, img_mask=None):
        x = self.attention(x, key_mask=key_mask)
        if img is not None and hasattr(self, "crossattention"):
            x = self.crossattention(x, kv=img, key_mask=img_mask)
        h = self.output.dense(F.gelu(self.intermediate.dense(x)))
        return self.output.LayerNorm(x + h)


class GoldenBert(nn.Module):
    def __init__(self, vocab, dim, layers, fusion, heads, intermediate, kv_dim,
                 max_pos=64):
        super().__init__()
        self.fusion = fusion
        self.embeddings = nn.Module()
        self.embeddings.word_embeddings = nn.Embedding(vocab, dim)
        self.embeddings.position_embeddings = nn.Embedding(max_pos, dim)
        self.embeddings.token_type_embeddings = nn.Embedding(2, dim)
        self.embeddings.LayerNorm = nn.LayerNorm(dim, eps=1e-12)
        self.encoder = nn.Module()
        self.encoder.layer = nn.ModuleList([
            GoldenBertLayer(dim, heads, intermediate, kv_dim, has_cross=(i >= fusion))
            for i in range(layers)
        ])

    def embed(self, ids):
        S = ids.shape[1]
        pos = torch.arange(S)[None]
        x = (self.embeddings.word_embeddings(ids)
             + self.embeddings.position_embeddings(pos)
             + self.embeddings.token_type_embeddings(torch.zeros_like(ids)))
        return self.embeddings.LayerNorm(x)

    def forward(self, ids, key_mask, img=None, img_mask=None, mode="multi_modal"):
        x = self.embed(ids)
        lo, hi = 0, len(self.encoder.layer)
        if mode == "text":
            hi = self.fusion
        for layer in self.encoder.layer[lo:hi]:
            x = layer(x, key_mask, img, img_mask)
        return x


class GoldenXVLM(nn.Module):
    """Full tiny XVLM with reference state-dict naming."""

    def __init__(self, image_res=32, patch=16, vdim=32, vdepth=2, vheads=2,
                 vocab=100, tdim=32, tlayers=4, fusion=2, theads=2,
                 intermediate=64, embed_dim=16):
        super().__init__()
        self.vision_encoder = GoldenBeit(image_res, patch, vdim, vdepth, vheads)
        self.text_encoder = nn.Module()
        self.text_encoder.bert = GoldenBert(vocab, tdim, tlayers, fusion, theads,
                                            intermediate, kv_dim=vdim)
        # MLM head (cls.predictions)
        cls = nn.Module()
        cls.predictions = nn.Module()
        cls.predictions.transform = nn.Module()
        cls.predictions.transform.dense = nn.Linear(tdim, tdim)
        cls.predictions.transform.LayerNorm = nn.LayerNorm(tdim, eps=1e-12)
        cls.predictions.decoder = nn.Linear(tdim, vocab, bias=False)
        # HF weight tying: decoder shares the word-embedding matrix
        cls.predictions.decoder.weight = \
            self.text_encoder.bert.embeddings.word_embeddings.weight
        cls.predictions.bias = nn.Parameter(torch.randn(vocab) * 0.02)
        self.text_encoder.cls = cls
        self.vision_proj = nn.Linear(vdim, embed_dim)
        self.text_proj = nn.Linear(tdim, embed_dim)
        self.temp = nn.Parameter(torch.ones([]) * 0.07)
        self.itm_head = nn.Sequential(
            nn.Linear(tdim, tdim * 2), nn.LayerNorm(tdim * 2, eps=1e-5),
            nn.GELU(), nn.Linear(tdim * 2, 2))
        self.bbox_head = nn.Sequential(
            nn.Linear(tdim, tdim * 2), nn.LayerNorm(tdim * 2, eps=1e-5),
            nn.GELU(), nn.Linear(tdim * 2, 4))

    def forward(self, image, ids, key_mask):
        img_embeds = self.vision_encoder(image)
        img_mask = torch.ones(img_embeds.shape[:2])
        text_embeds = self.text_encoder.bert(ids, key_mask, mode="text")
        cross = self.text_encoder.bert(ids, key_mask, img=img_embeds,
                                       img_mask=img_mask, mode="multi_modal")
        img_feat = F.normalize(self.vision_proj(img_embeds[:, 0]), dim=-1)
        txt_feat = F.normalize(self.text_proj(text_embeds[:, 0]), dim=-1)
        itm = self.itm_head(cross[:, 0])
        bbox = torch.sigmoid(self.bbox_head(cross[:, 0]))
        # MLM logits over full sequence
        t = self.text_encoder.cls.predictions.transform
        h = t.LayerNorm(F.gelu(t.dense(cross)))
        mlm = self.text_encoder.cls.predictions.decoder(h) + \
            self.text_encoder.cls.predictions.bias
        return dict(img_embeds=img_embeds, text_embeds=text_embeds, cross=cross,
                    img_feat=img_feat, txt_feat=txt_feat, itm=itm, bbox=bbox,
                    mlm=mlm)


class GoldenRoberta(nn.Module):
    """RoBERTa-style text encoder with the reference naming
    (text_encoder.roberta.* + lm_head.*): position ids offset by
    padding_idx+1 = 2 (xroberta.py:1296), single token type."""

    def __init__(self, vocab=60, dim=32, layers=2, heads=2, intermediate=64,
                 max_pos=66):
        super().__init__()
        self.roberta = GoldenBert(vocab, dim, layers, fusion=layers,
                                  heads=heads, intermediate=intermediate,
                                  kv_dim=dim, max_pos=max_pos)
        self.roberta.embeddings.token_type_embeddings = nn.Embedding(1, dim)
        self.lm_head = nn.Module()
        self.lm_head.dense = nn.Linear(dim, dim)
        self.lm_head.layer_norm = nn.LayerNorm(dim, eps=1e-12)
        self.lm_head.decoder = nn.Linear(dim, vocab, bias=False)
        self.lm_head.decoder.weight = \
            self.roberta.embeddings.word_embeddings.weight
        self.lm_head.bias = nn.Parameter(torch.randn(vocab) * 0.02)

    def forward(self, ids, key_mask):
        S = ids.shape[1]
        emb = self.roberta.embeddings
        pos = torch.arange(2, 2 + S)[None]
        x = (emb.word_embeddings(ids) + emb.position_embeddings(pos)
             + emb.token_type_embeddings(torch.zeros_like(ids)))
        x = emb.LayerNorm(x)
        for layer in self.roberta.encoder.layer:
            x = layer(x, key_mask)
        h = self.lm_head.layer_norm(F.gelu(self.lm_head.dense(x)))
        return x, self.lm_head.decoder(h) + self.lm_head.bias
