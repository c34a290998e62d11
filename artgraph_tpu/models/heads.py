"""Every classifier / fusion / projector model of the reference, in Flax.

Class names, constructor arguments, forward signatures and output structures
match the reference exactly so the CLI layer maps 1:1:

  ResnetSingleTask / ResnetMultiTask      (ref: src/models/models.py:41-90)
  ViTSingleTask / ViTMultiTask            (ref: src/models/models.py:92-123)
  ContextNetSingleTask / ContextNetlMultiTask
                                          (ref: src/models/models_kg.py:7-61)
  MultiModalSingleTask / MultiModalMultiTask  ("sansaro", Castellano et al)
                                          (ref: src/models/models_kg.py:63-137)
  NewMultiModal{Single,Multi}Task[Vit|ViT]
                                          (ref: src/models/models_kg.py:139-243)
  LabelProjector / LabelProjectorVit      (ref: src/models/models_kg.py:245-279)

All take NHWC float image batches (normalization happens upstream on device,
see artgraph_tpu.ops.preprocess). `train=True` enables dropout (rng collection
'dropout') and batch-norm batch statistics.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from artgraph_tpu.models.resnet import ResNet50, at_least_f32
from artgraph_tpu.models.vit import ViT

Dtype = Any
VIT_DIM = 768
RESNET_DIM = 2048


class _Head(nn.Module):
    """Dropout -> Linear classifier head (f32 logits, or wider under f64)."""

    num_out: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_out, dtype=at_least_f32(self.dtype),
                        param_dtype=jnp.float32, name="linear")(x)


# --- Image-only baselines (ref: src/models/models.py) ----------------------

class ResnetSingleTask(nn.Module):
    num_class: int
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ResNet50(dtype=self.dtype, name="resnet")(img, train=train)
        return _Head(self.num_class, self.dropout, dtype=self.dtype,
                     name="classifier")(feat, train)


class ResnetMultiTask(nn.Module):
    num_classes: Dict[str, int]
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ResNet50(dtype=self.dtype, name="resnet")(img, train=train)
        out_style = _Head(self.num_classes["style"], self.dropout,
                          dtype=self.dtype, name="style_classifier")(feat, train)
        out_genre = _Head(self.num_classes["genre"], self.dropout,
                          dtype=self.dtype, name="genre_classifier")(feat, train)
        return [out_style, out_genre]


class ViTSingleTask(nn.Module):
    num_class: int
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ViT(dtype=self.dtype, name="vit")(img, train=train)
        return _Head(self.num_class, self.dropout, dtype=self.dtype,
                     name="head")(feat, train)


class ViTMultiTask(nn.Module):
    num_classes: Dict[str, int]
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ViT(dtype=self.dtype, name="vit")(img, train=train)
        out_style = _Head(self.num_classes["style"], self.dropout,
                          dtype=self.dtype, name="style_classifier")(feat, train)
        out_genre = _Head(self.num_classes["genre"], self.dropout,
                          dtype=self.dtype, name="genre_classifier")(feat, train)
        return [out_style, out_genre]


# --- ContextNet (Garcia et al; ref: src/models/models_kg.py:7-61) ----------

class ContextNetSingleTask(nn.Module):
    emb_size: int
    num_class: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ResNet50(dtype=self.dtype, name="resnet")(img, train=train)
        # at_least_f32: f32 logits under bf16 compute, f64 under the
        # trajectory-parity instrument (tests/test_train_trajectory.py)
        out = nn.Dense(self.num_class, dtype=at_least_f32(self.dtype),
                       param_dtype=jnp.float32, name="classifier")(feat)
        graph_proj = nn.Dense(self.emb_size, dtype=at_least_f32(self.dtype),
                              param_dtype=jnp.float32, name="encoder")(feat)
        return out, graph_proj


class ContextNetlMultiTask(nn.Module):
    # reference's (sic) class name preserved
    emb_size: int
    num_classes: Dict[str, int]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ResNet50(dtype=self.dtype, name="resnet")(img, train=train)
        dense = lambda n, name: nn.Dense(n, dtype=at_least_f32(self.dtype),
                                         param_dtype=jnp.float32, name=name)
        graph_proj = dense(self.emb_size, "encoder")(feat)
        out_style = dense(self.num_classes["style"], "class_style")(feat)
        out_genre = dense(self.num_classes["genre"], "class_genre")(feat)
        return [out_style, out_genre], graph_proj


# corrected-name alias for the pip API; the reference spelling stays the
# canonical class (checkpoint key maps and CLIs use it)
ContextNetMultiTask = ContextNetlMultiTask


# --- MultiModal "sansaro" (Castellano et al; ref: models_kg.py:63-137) -----

class _TanhEncoder(nn.Module):
    emb_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = at_least_f32(self.dtype)
        x = nn.Dense(self.emb_size, dtype=dt,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = jnp.tanh(x)
        x = nn.Dense(self.emb_size, dtype=dt,
                     param_dtype=jnp.float32, name="fc2")(x)
        return jnp.tanh(x)


class MultiModalSingleTask(nn.Module):
    emb_size: int
    num_class: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ResNet50(dtype=self.dtype, name="resnet")(img, train=train)
        graph_proj = _TanhEncoder(self.emb_size, dtype=self.dtype,
                                  name="encoder")(feat)
        concat = jnp.concatenate([feat, graph_proj], axis=1)
        out = _Head(self.num_class, 0.2, dtype=self.dtype,
                    name="classifier")(concat, train)
        return out, graph_proj


class MultiModalMultiTask(nn.Module):
    emb_size: int
    num_classes: Dict[str, int]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ResNet50(dtype=self.dtype, name="resnet")(img, train=train)
        graph_proj = _TanhEncoder(self.emb_size, dtype=self.dtype,
                                  name="encoder")(feat)
        concat = jnp.concatenate([feat, graph_proj], axis=1)
        out_style = _Head(self.num_classes["style"], 0.2, dtype=self.dtype,
                          name="class_style")(concat, train)
        out_genre = _Head(self.num_classes["genre"], 0.2, dtype=self.dtype,
                          name="class_genre")(concat, train)
        return [out_style, out_genre], graph_proj


# --- NewMultiModal: embedding provided at forward time
#     (ref: models_kg.py:139-243) ------------------------------------------

class NewMultiModalSingleTask(nn.Module):
    emb_size: int
    num_class: int
    dropout: float = 0.4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, embedding, train: bool = False):
        feat = ResNet50(dtype=self.dtype, name="resnet")(img, train=train)
        comb = jnp.concatenate([feat, embedding.astype(jnp.float32)], axis=1)
        return _Head(self.num_class, self.dropout, dtype=self.dtype,
                     name="classifier")(comb, train)


class NewMultiModalMultiTask(nn.Module):
    emb_size: int
    num_classes: Dict[str, int]
    dropout: float = 0.4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, embedding_style, embedding_genre,
                 train: bool = False):
        feat = ResNet50(dtype=self.dtype, name="resnet")(img, train=train)
        comb_style = jnp.concatenate(
            [feat, embedding_style.astype(jnp.float32)], axis=1)
        comb_genre = jnp.concatenate(
            [feat, embedding_genre.astype(jnp.float32)], axis=1)
        out_style = _Head(self.num_classes["style"], self.dropout,
                          dtype=self.dtype, name="class_style")(comb_style, train)
        out_genre = _Head(self.num_classes["genre"], self.dropout,
                          dtype=self.dtype, name="class_genre")(comb_genre, train)
        return [out_style, out_genre]


class NewMultiModalSingleTaskVit(nn.Module):
    emb_size: int
    num_class: int
    dropout: float = 0.4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, embedding, train: bool = False):
        feat = ViT(dtype=self.dtype, name="vit")(img, train=train)
        comb = jnp.concatenate([feat, embedding.astype(jnp.float32)], axis=1)
        return _Head(self.num_class, self.dropout, dtype=self.dtype,
                     name="classifier")(comb, train)


class NewMultiModalMultiTaskViT(nn.Module):
    emb_size: int
    num_classes: Dict[str, int]
    dropout: float = 0.4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, embedding_style, embedding_genre,
                 train: bool = False):
        feat = ViT(dtype=self.dtype, name="vit")(img, train=train)
        comb_style = jnp.concatenate(
            [feat, embedding_style.astype(jnp.float32)], axis=1)
        comb_genre = jnp.concatenate(
            [feat, embedding_genre.astype(jnp.float32)], axis=1)
        out_style = _Head(self.num_classes["style"], self.dropout,
                          dtype=self.dtype, name="class_style")(comb_style, train)
        out_genre = _Head(self.num_classes["genre"], self.dropout,
                          dtype=self.dtype, name="class_genre")(comb_genre, train)
        return [out_style, out_genre]


# --- Visual -> embedding projectors (ref: models_kg.py:245-279) ------------

class LabelProjector(nn.Module):
    emb_size: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ResNet50(dtype=self.dtype, name="resnet")(img, train=train)
        return nn.Dense(self.emb_size, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="encoder")(feat)


class LabelProjectorVit(nn.Module):
    emb_size: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ViT(dtype=self.dtype, name="vit")(img, train=train)
        return nn.Dense(self.emb_size, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="encoder")(feat)
