"""Shared flax building blocks used by every encoder stack.

Precision contract (core/precision.py): parameters are fp32, matmuls run in
`dtype` (bf16 by default), LayerNorm statistics and softmax run in fp32.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2vlm_tpu.ops.attention import dot_product_attention

__all__ = ["LayerNorm", "FusedLayerNorm", "Mlp", "DropPath",
           "MultiHeadAttention", "PatchEmbed", "gelu_exact", "gelu_fast",
           "ACTIVATIONS", "checkpoint_policy"]

Dtype = Any


def checkpoint_policy(name: Optional[str]):
    """Resolve a config-level remat policy name to a jax.checkpoint policy.

    ``None``/"full" is classic gradient checkpointing (save only block
    inputs; recompute everything in the backward — min memory, +1 forward
    of FLOPs). "dots" saves the outputs of weight matmuls (dot_generals
    with no batch dims) so the backward recomputes only the cheap
    elementwise/VPU ops — near no-remat speed at a fraction of no-remat's
    activation memory (A/B numbers in STATUS.md). "dots_saveable"
    additionally saves batched dots (attention logits).
    """
    if name is None or name == "full":
        return None
    policies = {
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots_saveable": jax.checkpoint_policies.dots_saveable,
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }
    if name not in policies:
        raise ValueError(
            f"unknown remat_policy {name!r}; one of {sorted(policies)} or 'full'")
    return policies[name]


# CLIP image stats (kept numerically identical to data.transforms.CLIP_MEAN/
# STD — the uint8 fast path must match host normalization bit-for-bit)
IMAGE_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073], jnp.float32)
IMAGE_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711], jnp.float32)


class PatchEmbed(nn.Module):
    """Non-overlapping patchify as space-to-depth + ONE matmul.

    Mathematically identical to ``nn.Conv(kernel=(p,p), strides=(p,p),
    padding=VALID)`` — and parameter-tree identical (kernel (p, p, in, C)
    lecun-normal, bias zeros), so checkpoints are interchangeable. Measured
    neutral vs the conv lowering at 224px/16px on v5e (XLA:TPU already lowers
    a stride=patch conv efficiently); kept because the explicit matmul form
    guarantees the MXU mapping at every resolution/patch combination instead
    of depending on the conv rewriter.

    Returns (B, num_patches, C) — the flattened token layout every caller
    reshapes to anyway.
    """

    embed_dim: int
    patch_size: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        B, H, W, C = pixels.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, C, self.embed_dim), jnp.float32)
        if pixels.dtype == jnp.uint8:
            # uint8 host transport: the CLIP normalize runs on-device in fp32
            # (same math/order as data.transforms.normalize — bit-identical
            # to host-normalized input), fused by XLA into the patch matmul.
            # 4× less host→device traffic + no per-image float pass on the
            # one-core host (see tools/bench_input_pipeline.py).
            pixels = (pixels.astype(jnp.float32) / 255.0
                      - IMAGE_MEAN) / IMAGE_STD
        x = pixels.astype(self.dtype)
        # (B, H, W, C) → (B, N, p·p·C); the flatten order (ph, pw, C) matches
        # the conv kernel's (kh, kw, in) layout, so kernel.reshape matches.
        x = x.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, (H // p) * (W // p),
                                                  p * p * C)
        w = kernel.astype(self.dtype).reshape(p * p * C, self.embed_dim)
        out = x @ w
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.embed_dim,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm(x, gamma, beta, eps):
    y, _, _ = _ln_stats(x, gamma, beta, eps)
    return y


def _ln_stats(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    y = ((xf - mean) * inv * gamma + beta).astype(x.dtype)
    return y, mean, inv


def _ln_fwd(x, gamma, beta, eps):
    y, mean, inv = _ln_stats(x, gamma, beta, eps)
    return y, (x, gamma, mean, inv)


def _ln_bwd(eps, res, dy):
    x, gamma, mean, inv = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xhat = (xf - mean) * inv
    dgamma = jnp.sum(dyf * xhat, axis=tuple(range(x.ndim - 1)))
    dbeta = jnp.sum(dyf, axis=tuple(range(x.ndim - 1)))
    dxhat = dyf * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (inv * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dgamma, dbeta


_layer_norm.defvjp(_ln_fwd, _ln_bwd)


class FusedLayerNorm(nn.Module):
    """LayerNorm with bf16 activations in/out and fp32 statistics/params.

    Identical math to ``nn.LayerNorm(dtype=f32)`` (fast-variance formula,
    stats in fp32 — the precision contract holds), but the custom VJP saves
    only (x bf16, mean, inv) and recomputes x̂ in backward: the stock path
    stashes fp32 activation intermediates for autodiff, which the step trace
    showed as ~20 ms/step of loop-fusion HBM traffic at b32/224px. Param
    names/shapes match nn.LayerNorm (scale, bias) for checkpoint parity."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return _layer_norm(x, gamma, beta, self.epsilon)


# Minimax fit of erf(t) ≈ tanh(t·poly(t²)) for gelu (t = x/√2), fitted over
# x ∈ [-12, 12] with the saturating tail handled by the tanh itself.
# Accuracy vs erf-GELU, f32-evaluated over ALL finite bf16 inputs:
# max abs err 4.8e-7; after bf16 rounding 99.82% of inputs are bit-identical,
# the rest (negative-tail values with |gelu(x)| ≤ 1e-4) differ by one ulp.
_GELU_TANH_COEFFS = (
    1.1283825678459931, 0.10274975149248093, -1.5877455044145124e-04,
    -6.42949490766616e-04, 9.503170667205867e-05, -6.7250225691438245e-06,
    1.960067181744401e-07)


def gelu_exact(x):
    """erf-based GELU (torch.nn.GELU default; BERT 'gelu').

    Computed as 0.5·x·(1 + tanh(p(x/√2))) with a degree-13 odd minimax
    polynomial p — numerically the erf GELU (see _GELU_TANH_COEFFS notes)
    but riding the TPU's hardware tanh instead of XLA's erf expansion
    (poly + exp + select), which profiled ~15% of whole-model encode time.
    """
    dt = x.dtype
    xf = x.astype(jnp.float32)
    # clamp only the tanh argument: for |x| > 10 the factor saturates to
    # {0, 1} exactly, so gelu(x) = 0 or x regardless of the poly's overflow
    t = jnp.clip(xf, -10.0, 10.0) * jnp.float32(0.7071067811865476)
    z2 = t * t
    p = jnp.float32(_GELU_TANH_COEFFS[-1])
    for c in _GELU_TANH_COEFFS[-2::-1]:
        p = p * z2 + jnp.float32(c)
    p = p * t
    return (jnp.float32(0.5) * xf * (1.0 + jnp.tanh(p))).astype(dt)


def gelu_fast(x):
    """tanh-approximated GELU — ~25%% faster FFN on TPU (erf is VPU-expensive);
    activation diff ~1e-3, below metric noise. Select via config act='gelu_fast'
    for throughput-critical serving; default stays exact for import parity."""
    return jax.nn.gelu(x, approximate=True)


ACTIVATIONS = {"gelu": gelu_exact, "gelu_exact": gelu_exact,
               "gelu_fast": gelu_fast}


class LayerNorm(nn.Module):
    """fp32 LayerNorm returning the input's dtype."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="ln")(x.astype(jnp.float32))
        return y.astype(self.dtype)


class Mlp(nn.Module):
    """Transformer FFN: dense -> act -> dense (+ optional dropout).

    ``quant=True``: int8 W8A8 matmuls (serving; ops/quant.QDense — identical
    param tree, so checkpoints load into either mode)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    act: Callable = gelu_exact
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        if self.quant:
            if not deterministic:
                raise ValueError(
                    "quant_int8 is serving-only: round() has zero gradient, "
                    "so training through QDense silently learns nothing — "
                    "disable quant_int8 for training")
            from x2vlm_tpu.ops.quant import QDense

            # fuse the activation into fc1's dequant epilogue (one kernel,
            # no intermediate HBM round-trip)
            act_name = ("gelu_fast" if self.act is gelu_fast else "gelu")
            x = QDense(self.hidden_dim, dtype=self.dtype, name="fc1")(
                x, act=act_name)
            x = QDense(out_dim, dtype=self.dtype, name="fc2")(x)
        else:
            dense = lambda feat, name: nn.Dense(
                feat, dtype=self.dtype, param_dtype=jnp.float32, name=name)
            x = dense(self.hidden_dim, "fc1")(x)
            x = self.act(x)
            x = dense(out_dim, "fc2")(x)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth per sample (reference: timm DropPath used in beit2.py/swin)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DenseParams(nn.Module):
    """``nn.Dense``-compatible parameter container ({kernel, bias}, same
    shapes/init/param names) for projections whose matmul is emitted manually
    — e.g. fused-layout attention projections that write (B, H, S, D) straight
    out of the matmul epilogue. Checkpoint import/export sees an identical
    tree to ``nn.Dense``."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


def _proj(x, w, b, dtype):
    """nn.Dense semantics: promote inputs+params to `dtype`, dot, add bias."""
    y = x.astype(dtype) @ w.astype(dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y


def _proj_bhsd(x, w, b, dtype, num_heads):
    """Project (B, S, C) -> (B, H, S, D) in ONE dot_general: the head-split
    transpose rides the matmul's output epilogue. A standalone transpose
    feeding a Pallas kernel is a full extra HBM pass (~3 ms per tower at
    224px/B=128, measured in the encode trace)."""
    C, inner = w.shape
    wr = w.reshape(C, num_heads, inner // num_heads)
    y = jnp.einsum("bsc,chd->bhsd", x.astype(dtype), wr.astype(dtype))
    if b is not None:
        y = y + b.reshape(1, num_heads, 1, -1).astype(dtype)
    return y


class MultiHeadAttention(nn.Module):
    """Projection wrapper around the shared attention core.

    Handles both self-attention (`kv` is None) and cross-attention (`kv` given,
    possibly with a different feature width — the fusion layers project K/V
    from the vision width, reference xbert.py:236-238).

    `qkv_bias_mode`: "full" (q,k,v biases — BERT), "qv" (q and v biases only,
    k bias fixed zero — BEiT-2, reference beit2.py:83-88), "none".
    """

    num_heads: int
    head_dim: Optional[int] = None
    qkv_bias_mode: str = "full"
    attn_dropout_rate: float = 0.0
    proj_dropout_rate: float = 0.0
    scale: Optional[float] = None
    dtype: Dtype = jnp.bfloat16
    quant: bool = False   # int8 W8A8 projections (serving; attention stays bf16)

    @nn.compact
    def __call__(
        self,
        x,
        kv=None,
        *,
        bias=None,
        key_mask=None,
        mask=None,
        causal: bool = False,
        cache=None,
        kv_gather_idx=None,
        deterministic: bool = True,
        impl: str = "auto",
    ):
        """`kv_gather_idx` (B,) int: `kv` holds only the *unique* KV source
        rows; K/V are projected once per unique row and gathered out to the
        query batch. Saves the duplicated cross-attention K/V projections in
        hard-negative ITM, where 3·B fusion rows share B unique images."""
        B, Sq, C = x.shape
        head_dim = self.head_dim or C // self.num_heads
        inner = head_dim * self.num_heads
        kv_src = x if kv is None else kv
        Skv = kv_src.shape[1]
        attn_scale = self.scale if self.scale is not None else head_dim ** -0.5

        # short-query attention (text/fusion towers, Sq ≈ 40; fusion
        # cross-attention to the image stream, Skv ≈ 197): the batched
        # (B·H, Sq, Skv) matmuls pay a fixed ~0.4 µs/batched-element MXU
        # latency (a shape floor, CLAUDE.md) — route through the
        # block-diagonal Pallas kernel, which does all heads of a row in one
        # matmul pair on the projection layout (no head-split transposes)
        from x2vlm_tpu.ops.tiny_attention import tiny_supported

        drop_active = self.attn_dropout_rate > 0.0 and not deterministic
        use_tiny = (cache is None and mask is None and bias is None
                    and not causal and impl != "xla"
                    and tiny_supported(B, Sq, Skv, self.num_heads, head_dim,
                                       has_mask=key_mask is not None,
                                       has_drop=drop_active))

        bq = self.qkv_bias_mode in ("full", "qv")
        bk = self.qkv_bias_mode == "full"
        bv = self.qkv_bias_mode in ("full", "qv")
        proj_layout = True  # q/k/v in (B, S, H·D) — vs fused (B, H, S, D)
        if self.quant:
            from x2vlm_tpu.ops.quant import QDense, quantize_act
            # quantize each source once, share across the projections fed by it
            xq, sx = quantize_act(x)
            kvq, skv_s = (xq, sx) if kv is None else quantize_act(kv_src)
            q = QDense(inner, use_bias=bq, dtype=self.dtype, name="query")(x, xq, sx)
            k = QDense(inner, use_bias=bk, dtype=self.dtype, name="key")(kv_src, kvq, skv_s)
            v = QDense(inner, use_bias=bv, dtype=self.dtype, name="value")(kv_src, kvq, skv_s)
        else:
            wq, bq_p = DenseParams(inner, bq, name="query")(C)
            wk, bk_p = DenseParams(inner, bk, name="key")(kv_src.shape[-1])
            wv, bv_p = DenseParams(inner, bv, name="value")(kv_src.shape[-1])
            if use_tiny:
                q = _proj(x, wq, bq_p, self.dtype)
                k = _proj(kv_src, wk, bk_p, self.dtype)
                v = _proj(kv_src, wv, bv_p, self.dtype)
            else:
                # fused-layout projections (B, H, S, D); the softmax scale is
                # folded into the query weights in fp32 — one less full
                # elementwise pass over Q in the attention prep
                q = _proj_bhsd(x, wq * attn_scale,
                               None if bq_p is None else bq_p * attn_scale,
                               self.dtype, self.num_heads)
                k = _proj_bhsd(kv_src, wk, bk_p, self.dtype, self.num_heads)
                v = _proj_bhsd(kv_src, wv, bv_p, self.dtype, self.num_heads)
                proj_layout = False
                attn_scale = 1.0

        if use_tiny:
            # (on non-TPU backends tiny_block_attention runs the same math
            # via its XLA reference path — tests stay backend-agnostic)
            from x2vlm_tpu.ops.tiny_attention import tiny_block_attention

            if kv_gather_idx is not None:
                # cross-batch gather of the unique-KV panels on the
                # projection layout (see the bhsd-path comment below)
                from x2vlm_tpu.core import mesh as mesh_lib

                k = mesh_lib.constrain_batch(jnp.take(
                    mesh_lib.constrain_replicated(k), kv_gather_idx, axis=0))
                v = mesh_lib.constrain_batch(jnp.take(
                    mesh_lib.constrain_replicated(v), kv_gather_idx, axis=0))
            drop_rng = self.make_rng("dropout") if drop_active else None
            out = tiny_block_attention(
                q, k, v, num_heads=self.num_heads, key_mask=key_mask,
                dropout_rate=self.attn_dropout_rate, dropout_rng=drop_rng,
                deterministic=deterministic,
                scale=attn_scale)
            if self.quant:
                from x2vlm_tpu.ops.quant import QDense
                out = QDense(C, dtype=self.dtype, name="out")(out)
            else:
                out = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                               name="out")(out)
            if self.proj_dropout_rate > 0.0:
                out = nn.Dropout(self.proj_dropout_rate)(
                    out, deterministic=deterministic)
            return out

        if proj_layout:
            # quant path: QDense emits (B, S, inner) — relayout to the
            # (B, H, S, D) attention layout here
            q = q.reshape(B, Sq, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            Bkv = kv_src.shape[0]
            k = k.reshape(Bkv, k.shape[1], self.num_heads, head_dim).transpose(0, 2, 1, 3)
            v = v.reshape(Bkv, v.shape[1], self.num_heads, head_dim).transpose(0, 2, 1, 3)
        if kv_gather_idx is not None:
            # cross-batch gather of the unique-KV panels: all-gather once,
            # take shard-locally, pin back to the query's batch sharding
            # (avoids SPMD involuntary full remat)
            from x2vlm_tpu.core import mesh as mesh_lib

            k = mesh_lib.constrain_replicated(k)
            v = mesh_lib.constrain_replicated(v)
            k = mesh_lib.constrain_batch(jnp.take(k, kv_gather_idx, axis=0))
            v = mesh_lib.constrain_batch(jnp.take(v, kv_gather_idx, axis=0))

        if cache is not None:
            # Static-shape incremental decode (replaces the reference's
            # history_states concatenation, xbert.py:349-353, whose growing
            # shapes would force a recompile per step on TPU): fixed
            # (B, H, Lmax, D) K/V buffers, new projections written at
            # cache["index"], queries masked to positions <= index + offset.
            index = cache["index"]
            k = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype),
                                             (0, 0, index, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype),
                                             (0, 0, index, 0))
            Lmax = k.shape[2]
            kv_pos = jnp.arange(Lmax)[None, None, None, :]
            q_pos = (index + jnp.arange(Sq))[None, None, :, None]
            mask = kv_pos <= q_pos  # (1, 1, Sq, Lmax)
            mask = jnp.broadcast_to(mask, (B, 1, Sq, Lmax))
            key_mask = None
            causal = False

        dropout_rng = None
        if self.attn_dropout_rate > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        out = dot_product_attention(
            q, k, v,
            bias=bias, key_mask=key_mask, mask=mask, causal=causal,
            scale=attn_scale,
            dropout_rate=self.attn_dropout_rate,
            dropout_rng=dropout_rng,
            deterministic=deterministic,
            impl=impl,
        )
        if self.quant:
            from x2vlm_tpu.ops.quant import QDense
            out = out.transpose(0, 2, 1, 3).reshape(B, Sq, inner)
            out = QDense(C, dtype=self.dtype, name="out")(out)
        else:
            # out-projection consumes (B, H, Sq, D) directly — the head-merge
            # transpose rides this matmul's input instead of standing alone
            # as a full HBM pass after the Pallas kernel (measured ~3 ms at
            # 224px/B=128 in the encode trace)
            wo, bo = DenseParams(C, True, name="out")(inner)
            out = jnp.einsum(
                "bhsd,hdc->bsc", out.astype(self.dtype),
                wo.reshape(self.num_heads, head_dim, C).astype(self.dtype))
            out = out + bo.astype(self.dtype)
        if self.proj_dropout_rate > 0.0:
            out = nn.Dropout(self.proj_dropout_rate)(out, deterministic=deterministic)
        if cache is not None:
            # "index" is managed by the caller (UniLM decode re-writes the
            # trailing [MASK] slot each step; causal decode advances by Sq).
            return out, {"k": k, "v": v, "index": cache["index"]}
        return out
