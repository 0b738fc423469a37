"""Transformer sentence encoder (MiniLM-L6-class; BASELINE.json:8-9).

BERT-style post-LN encoder in flax.linen, written TPU-first:
  - activations in bfloat16, parameters in float32 (master weights);
  - all matmuls MXU-shaped (hidden/mlp dims multiples of 128 in the default
    configs), static max_len, attention as one fused dot_general pair;
  - mean/CLS pooling + optional L2 normalization — the output feeds the index
    directly ("building the vectordb with the encoder",
    /root/reference/README.md:2).

Weight import from a HuggingFace BERT checkpoint is in models/hf_import.py
(gated: the build environment is offline).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from cloudvectordb_tpu.utils.config import EncoderConfig

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


class SelfAttention(nn.Module):
    cfg: EncoderConfig
    dtype: Any

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        c = self.cfg
        head_dim = c.hidden_dim // c.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (c.num_heads, head_dim), dtype=self.dtype, name=name
        )
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)
        scale = head_dim ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, None, :], logits.astype(jnp.float32), neg)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn_p = c.dropout if c.attn_dropout is None else c.attn_dropout
        probs = nn.Dropout(attn_p)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = nn.DenseGeneral(
            c.hidden_dim, axis=(-2, -1), dtype=self.dtype, name="out"
        )(out)
        return out


class EncoderLayer(nn.Module):
    cfg: EncoderConfig
    dtype: Any

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        c = self.cfg
        attn = SelfAttention(c, self.dtype, name="attention")(x, mask, deterministic)
        attn = nn.Dropout(c.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="attention_ln")(x + attn)
        h = nn.Dense(c.mlp_dim, dtype=self.dtype, name="mlp_in")(x)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(c.hidden_dim, dtype=self.dtype, name="mlp_out")(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="mlp_ln")(x + h)


class Encoder(nn.Module):
    """token ids (B, L) + mask (B, L) → sentence embeddings (B, out_dim)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        c = self.cfg
        dtype = _DTYPES[c.dtype]
        tok = nn.Embed(c.vocab_size, c.hidden_dim, dtype=dtype, name="tok_emb")(
            input_ids
        )
        pos_ids = jnp.arange(input_ids.shape[1])[None, :]
        pos = nn.Embed(c.max_len, c.hidden_dim, dtype=dtype, name="pos_emb")(pos_ids)
        x = nn.LayerNorm(dtype=dtype, name="emb_ln")(tok + pos)
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        mask = attention_mask.astype(bool)
        # remat: recompute layer activations in the backward pass — frees HBM
        # for bigger contrastive batches (in-batch negatives scale with B)
        layer_cls = nn.remat(EncoderLayer, static_argnums=(3,)) if c.remat else EncoderLayer
        for layer in range(c.num_layers):
            x = layer_cls(c, dtype, name=f"layer_{layer}")(x, mask, deterministic)
        if c.pooling == "cls":
            pooled = x[:, 0, :]
        else:  # masked mean pooling
            w = attention_mask.astype(jnp.float32)[:, :, None]
            pooled = jnp.sum(x.astype(jnp.float32) * w, axis=1) / jnp.maximum(
                jnp.sum(w, axis=1), 1.0
            )
        if c.out_dim and c.out_dim != c.hidden_dim:
            pooled = nn.Dense(c.out_dim, dtype=jnp.float32, name="proj")(pooled)
        pooled = pooled.astype(jnp.float32)
        if c.normalize:
            pooled = pooled / jnp.maximum(
                jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
            )
        return pooled

    @property
    def embed_dim(self) -> int:
        return self.cfg.out_dim or self.cfg.hidden_dim


def init_encoder(cfg: EncoderConfig, seed: int = 0):
    """Returns (model, params) with a dummy trace at max_len."""
    model = Encoder(cfg)
    ids = jnp.zeros((2, cfg.max_len), jnp.int32)
    mask = jnp.ones((2, cfg.max_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), ids, mask, deterministic=True)
    return model, params["params"]
