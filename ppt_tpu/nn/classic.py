"""Classic point-cloud backbones: PointNet and DGCNN classifiers.

Capability parity with the vendored openpoints backbone zoo
(``openpoints/models/backbone/pointnet.py`` and ``dgcnn.py``): the two
canonical baselines, channels-last flax, each ending in the same 256-d
feature trunk convention as the other ULIP backbones so they plug into
``ulip_customized``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu import ops


class PointNetClassic(nn.Module):
    """Vanilla PointNet (no T-Nets): per-point shared MLP
    64-64-64-128-1024, global max-pool, FC trunk to 256-d."""

    mlp: Sequence[int] = (64, 64, 64, 128, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        x = xyz.astype(self.dtype)
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
        x = jnp.max(x, axis=1)  # [B, 1024]
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="fbn1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.4)(x, deterministic=not train)
        x = nn.Dense(256, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="fbn2")(x)
        x = nn.relu(x)
        return x


class DgcnnClassifier(nn.Module):
    """DGCNN classification trunk: 4 EdgeConv stages over feature-space
    kNN graphs, multi-scale concat, global max+avg pooling, FC trunk."""

    k: int = 20
    widths: Tuple[int, ...] = (64, 64, 128, 256)
    emb_dim: int = 1024
    trunk: bool = True  # False -> return the raw 2*emb_dim pooled features
    dtype: jnp.dtype = jnp.float32

    def _edge_conv(self, coords: jax.Array, feats: jax.Array) -> jax.Array:
        idx = jax.lax.stop_gradient(ops.knn_point(self.k, coords, coords))
        nbrs = ops.index_points(feats, idx)  # [B, N, k, D]
        center = jnp.broadcast_to(feats[:, :, None, :], nbrs.shape)
        return jnp.concatenate([nbrs - center, center], axis=-1)

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        x = xyz.astype(self.dtype)
        feats = []
        graph_coords = x
        for i, w in enumerate(self.widths):
            h = self._edge_conv(graph_coords, x)
            h = nn.Dense(w, use_bias=False, dtype=self.dtype, name=f"edge{i}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"bn{i}"
            )(h)
            h = nn.leaky_relu(h, 0.2)
            x = jnp.max(h, axis=2)  # [B, N, w]
            graph_coords = x  # dynamic graph: kNN in feature space
            feats.append(x)
        cat = jnp.concatenate(feats, axis=-1)
        emb = nn.Dense(self.emb_dim, use_bias=False, dtype=self.dtype, name="emb")(cat)
        emb = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="embn")(emb)
        emb = nn.leaky_relu(emb, 0.2)
        pooled = jnp.concatenate(
            [jnp.max(emb, axis=1), jnp.mean(emb, axis=1)], axis=-1
        )
        if not self.trunk:
            # matches openpoints DGCNN.forward_cls_feat output (2*emb_dim)
            return pooled
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(pooled)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="fbn1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.Dense(256, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="fbn2")(x)
        x = nn.leaky_relu(x, 0.2)
        return x
