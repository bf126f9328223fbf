"""Graph-convolution backbones: BallDGCNN, DeepGCN, GroupPointNet.

References (all under ``openpoints/models/backbone/``):
  - ``ball_dgcnn.py:13-108``   — DGCNN over a STATIC spatial graph
    (ball-query or kNN on coordinates, computed once);
  - ``deepgcn.py:13-128``      — DeepGCN with dilated dynamic kNN graphs
    in feature space (res / plain / dense blocks,
    ``layers/graph_conv.py:64-130``, ``layers/knn.py:66-110``);
  - ``grouppointnet.py:11-100``— FPS-subsampled single grouping + shared
    MLP + neighborhood max.

TPU-first: channels-last ``[B, N, C]``, 1x1 convs as Dense, the
neighborhood gathers through the shared ops layer. The openpoints
EdgeConv edge feature is ``[center, neighbor - center]``
(``graph_conv.py:47-50``) and the conv block order differs per model:
BallDGCNN uses conv-act-norm, DeepGCN conv-norm-act — both preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu import ops


def _edge_features(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """[center, neighbor - center] over gathered neighbors
    (``EdgeConv.forward``, graph_conv.py:47-50)."""
    nbrs = ops.index_points(feats, idx)  # [B, N, K, C]
    center = jnp.broadcast_to(feats[:, :, None, :], nbrs.shape)
    return jnp.concatenate([center, nbrs - center], axis=-1)


class _ConvBlock(nn.Module):
    """create_convblock equivalent: Dense + BN + act in either order.

    ``order='can'`` = conv-act-norm (BallDGCNN), ``'cna'`` =
    conv-norm-act (DeepGCN). ``act`` is ('relu' | ('lrelu', slope)).
    """

    features: int
    order: str = "cna"
    act: Tuple[str, float] = ("relu", 0.0)
    # create_convblock* forces bias=False whenever a norm layer exists
    # (layers/conv.py:28-31), which is every block in these backbones
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def activate(h):
            kind, slope = self.act
            return nn.relu(h) if kind == "relu" else nn.leaky_relu(h, slope)

        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="conv")(x)
        bn = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                          name="bn")
        if self.order == "can":
            x = activate(x)
            x = bn(x)
        else:
            x = bn(x)
            x = activate(x)
        return x


class BallDgcnn(nn.Module):
    """DGCNN over one static spatial graph (``BallDGCNN``,
    ball_dgcnn.py:13-108). Channel plan with defaults: edge convs
    64, 64, 128, 256 -> concat 512 -> fusion 1024; ``__call__`` returns
    per-point fusion features [B, N, emb]; ``cls_feat`` max+avg pools.
    """

    channels: int = 64
    embed_dim: int = 1024
    n_blocks: int = 5
    k: int = 20
    group: str = "ballquery"  # 'ballquery' | 'knn'
    radius: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        pts = xyz.astype(jnp.float32)
        if "ball" in self.group or "query" in self.group:
            idx = ops.query_ball_point(self.radius, self.k, pts, pts)
        else:
            idx = ops.knn_point(self.k, pts, pts)
        idx = jax.lax.stop_gradient(idx)

        x = xyz.astype(self.dtype)
        feats = []
        ch = self.channels
        for i in range(self.n_blocks - 1):  # head + (n_blocks-2) layers
            h = _edge_features(x, idx)
            h = _ConvBlock(
                ch, order="can", act=("lrelu", 0.2),
                dtype=self.dtype, name=f"edge{i}",
            )(h, train)
            x = jnp.max(h, axis=2)
            feats.append(x)
            if i > 0:
                ch *= 2
        cat = jnp.concatenate(feats, axis=-1)
        return _ConvBlock(
            self.embed_dim, order="can", act=("lrelu", 0.2),
            dtype=self.dtype, name="fusion",
        )(cat, train)

    def cls_feat(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        fusion = self(xyz, train)
        return jnp.concatenate(
            [jnp.max(fusion, axis=1), jnp.mean(fusion, axis=1)], axis=-1
        )


@dataclasses.dataclass(frozen=True)
class DeepGcnConfig:
    in_channels: int = 3
    channels: int = 64
    emb_dims: int = 1024
    n_blocks: int = 14
    block: str = "res"  # 'res' | 'plain' | 'dense'
    k: int = 16
    epsilon: float = 0.2
    use_stochastic: bool = True
    use_dilation: bool = True


class DeepGcn(nn.Module):
    """DeepGCN (``DeepGCN``, deepgcn.py:13-128): dilated dynamic-kNN
    EdgeConvs with residual/plain/dense wiring, multi-level concat,
    fusion conv. ``__call__`` returns [B, N, emb_dims].

    Dilated kNN: neighbors = knn(k * dilation) strided by ``dilation``
    (``DenseDilated``, knn.py:66-88); the stochastic variant (training
    only, probability ``epsilon``) takes a random k-subset via the
    'graph' rng collection.
    """

    config: DeepGcnConfig = DeepGcnConfig()
    dtype: jnp.dtype = jnp.float32

    def _dilated_knn(self, feats, dilation, train):
        cfg = self.config
        idx = ops.knn_point(cfg.k * dilation, feats, feats)
        idx = jax.lax.stop_gradient(idx)
        if cfg.use_stochastic and train:
            rng = self.make_rng("graph")
            sub_rng, gate_rng = jax.random.split(rng)
            randsub = jax.random.permutation(sub_rng, cfg.k * dilation)[: cfg.k]
            use_rand = jax.random.uniform(gate_rng) < cfg.epsilon
            return jnp.where(use_rand, idx[:, :, randsub], idx[:, :, ::dilation])
        return idx[:, :, ::dilation]

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        pts = xyz[..., :3].astype(jnp.float32)
        x = xyz.astype(self.dtype)

        # head: graph over coordinates (deepgcn.py:123)
        idx = jax.lax.stop_gradient(ops.knn_point(cfg.k, pts, pts))
        h = _edge_features(x, idx)
        h = _ConvBlock(cfg.channels, order="cna", act=("relu", 0.0),
                       dtype=self.dtype, name="edge0")(h, train)
        x = jnp.max(h, axis=2)

        feats = [x]
        for i in range(cfg.n_blocks - 1):
            dilation = 1 + i if cfg.use_dilation and cfg.block != "plain" else 1
            prev = feats[-1]
            idx = self._dilated_knn(prev, dilation, train and cfg.block != "plain")
            h = _edge_features(prev, idx)
            out_ch = cfg.channels
            h = _ConvBlock(out_ch, order="cna", act=("relu", 0.0),
                           dtype=self.dtype, name=f"edge{i + 1}")(h, train)
            h = jnp.max(h, axis=2)
            if cfg.block == "res":
                feats.append(h + prev)
            elif cfg.block == "dense":
                feats.append(jnp.concatenate([prev, h], axis=-1))
            else:  # plain
                feats.append(h)
        cat = jnp.concatenate(feats, axis=-1)
        return _ConvBlock(cfg.emb_dims, order="cna", act=("lrelu", 0.2),
                          dtype=self.dtype, name="fusion")(cat, train)

    def cls_feat(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        fusion = self(xyz, train)
        return jnp.concatenate(
            [jnp.max(fusion, axis=1), jnp.mean(fusion, axis=1)], axis=-1
        )


class GroupPointNet(nn.Module):
    """FPS subsample + one ball-query grouping + shared MLPs + max
    (``GroupPointNet``, grouppointnet.py:11-100).

    Reference quirk preserved: its ``group_args`` uses key ``'group'``
    but ``create_grouper`` reads ``'NAME'`` (group.py:340), so the
    grouper is ALWAYS ball-query with radius 0.1 regardless of the
    'knn' setting — this port defaults to the behavior actually
    executed, with ``group`` exposed for the intended semantics.
    """

    channels: int = 64
    n_blocks: int = 5
    sample_ratio: float = 0.25
    nsample: int = 20
    radius: float = 0.1
    group: str = "ballquery"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        pts = xyz[..., :3].astype(jnp.float32)
        f = xyz.astype(self.dtype)
        npoint = int(pts.shape[1] * self.sample_ratio)
        idx = ops.farthest_point_sample(pts, npoint)
        centers = ops.index_points(pts, idx)  # [B, M, 3]
        if "ball" in self.group or "query" in self.group:
            nbr = ops.query_ball_point(self.radius, self.nsample, pts, centers)
        else:
            nbr = ops.knn_point(self.nsample, pts, centers)
        dp = ops.index_points(pts, nbr) - centers[:, :, None, :]
        gf = ops.index_points(f, nbr)
        x = jnp.concatenate([dp.astype(self.dtype), gf], axis=-1)
        for i in range(self.n_blocks - 2):
            x = _ConvBlock(
                self.channels, order="can", act=("lrelu", 0.2),
                dtype=self.dtype, name=f"conv{i}",
            )(x, train)
        return jnp.max(x, axis=2)  # [B, M, channels]

    def cls_feat(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        f = self(xyz, train)
        return jnp.concatenate(
            [jnp.max(f, axis=1), jnp.mean(f, axis=1)], axis=-1
        )
