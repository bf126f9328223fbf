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


class Tnet(nn.Module):
    """Spatial/feature transformer net (``STN3d``/``STNkd``,
    openpoints ``backbone/pointnet.py:13-88``): shared MLP 64-128-1024,
    max pool, FC 512-256-k*k, output biased to the identity."""

    k: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: [B, N, k]
        h = x.astype(self.dtype)
        for i, ch in enumerate((64, 128, 1024)):
            h = nn.Dense(ch, dtype=self.dtype, name=f"conv{i + 1}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"bn{i + 1}"
            )(h)
            h = nn.relu(h)
        h = jnp.max(h, axis=1)
        for i, ch in enumerate((512, 256)):
            h = nn.Dense(ch, dtype=self.dtype, name=f"fc{i + 1}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"bn{i + 4}"
            )(h)
            h = nn.relu(h)
        h = nn.Dense(self.k * self.k, dtype=self.dtype, name="fc3")(h)
        eye = jnp.eye(self.k, dtype=h.dtype).reshape(1, -1)
        return (h + eye).reshape(-1, self.k, self.k)


class PointNetEncoder(nn.Module):
    """The full classic PointNet encoder with T-Nets
    (``PointNetEncoder.forward_cls_feat``, openpoints
    ``backbone/pointnet.py:91-160``): input STN over the 3 coordinate
    channels (extra channels pass through), two 64-d embedding layers,
    feature STN (k=64), MLP 64-128-1024 with **no ReLU after the last
    BN**, global max pool -> 1024-d."""

    input_transform: bool = True
    feature_transform: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: [B, N, D>=3] channels-last
        x = x.astype(self.dtype)
        if self.input_transform:
            trans = Tnet(3, dtype=self.dtype, name="stn")(x, train)
            coords = jnp.einsum("bnc,bcd->bnd", x[..., :3], trans)
            x = jnp.concatenate([coords, x[..., 3:]], axis=-1)
        for name, ch in (("conv0_1", 64), ("conv0_2", 64)):
            x = nn.Dense(ch, dtype=self.dtype, name=name)(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name="bn" + name[4:]
            )(x)
            x = nn.relu(x)
        if self.feature_transform:
            trans_feat = Tnet(64, dtype=self.dtype, name="fstn")(x, train)
            x = jnp.einsum("bnc,bcd->bnd", x, trans_feat)
        for i, ch in enumerate((64, 128, 1024)):
            x = nn.Dense(ch, dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"bn{i + 1}"
            )(x)
            if i < 2:  # reference: bn3(conv3(x)) feeds max-pool un-activated
                x = nn.relu(x)
        return jnp.max(x, axis=1)  # [B, 1024]


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
