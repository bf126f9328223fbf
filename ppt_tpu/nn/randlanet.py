"""RandLA-Net semantic segmentation backbone, TPU-native.

Reference: ``openpoints/models/backbone/randlenet.py:1-318`` (the
RandLA-Net encoder/decoder with Local Feature Aggregation blocks).

TPU-first re-design:
  - channels-last ``[B, N, C]`` everywhere; the reference's 1x1
    Conv2d/ConvTranspose2d SharedMLPs (kernel 1, stride 1 — a transposed
    conv with k=1,s=1 IS a 1x1 conv) become Dense layers;
  - the CPU ``torch_points.knn`` calls (randlenet.py:173,278) become the
    shared ops-layer kNN (Pallas-fused on TPU);
  - random decimation: the reference permutes once and repeatedly takes
    the first N/4^i points (randlenet.py:260-269). Under jit the
    permutation is an explicit rng argument; the slices are static.

Weight-compatibility notes kept for checkpoint conversion: distances in
the local spatial encoding are EUCLIDEAN (torch_points knn returns
sqrt'd distances), the attentive-pooling softmax runs over the NEIGHBOR
axis (``dim=-2`` of ``[B, N, K, C]``... reference applies it to
``x.permute(0,2,3,1)`` = ``[B, N, K, C]`` at dim=-2 == K), and decoder
upsampling is 1-NN gather (randlenet.py:278-287).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu import ops


def _bn(name: str):
    # reference SharedMLP BatchNorm2d(eps=1e-6, momentum=0.99):
    # torch momentum 0.99 -> flax momentum 0.01
    return nn.BatchNorm(
        use_running_average=None, dtype=jnp.float32, momentum=0.01,
        epsilon=1e-6, name=name,
    )


class SharedMLP(nn.Module):
    """1x1 conv (+BN, +activation) over channels-last tensors
    (``SharedMLP``, randlenet.py:12-55)."""

    features: int
    bn: bool = False
    act: Optional[str] = None  # None | 'relu' | 'lrelu02' | 'lrelu'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.features, dtype=self.dtype, name="conv")(x)
        if self.bn:
            x = _bn("bn")(x, use_running_average=not train)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "lrelu02":
            x = nn.leaky_relu(x, 0.2)
        elif self.act == "lrelu":
            x = nn.leaky_relu(x, 0.01)  # torch LeakyReLU default slope
        return x


class LocalSpatialEncoding(nn.Module):
    """Relative-position encoding concat'd with features
    (``LocalSpatialEncoding``, randlenet.py:58-104).

    Encodes ``[center, neighbor, center - neighbor, ||center-neighbor||]``
    (10 channels) through a SharedMLP and concatenates the running
    features along channels: ``[B, N, K, 2*d]``.
    """

    d: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        coords: jax.Array,  # [B, N, 3]
        features: jax.Array,  # [B, N, d]
        idx: jax.Array,  # [B, N, K]
        dist: jax.Array,  # [B, N, K] euclidean
        train: bool = False,
    ) -> jax.Array:
        nbrs = ops.index_points(coords, idx)  # [B, N, K, 3]
        center = jnp.broadcast_to(coords[:, :, None, :], nbrs.shape)
        enc = jnp.concatenate(
            [center, nbrs, center - nbrs, dist[..., None]], axis=-1
        ).astype(self.dtype)
        enc = SharedMLP(self.d, bn=True, act="relu", dtype=self.dtype,
                        name="mlp")(enc, train)
        K = idx.shape[-1]
        feat = jnp.broadcast_to(
            features[:, :, None, :], (*idx.shape, features.shape[-1])
        )
        return jnp.concatenate([enc, feat], axis=-1)  # [B, N, K, 2d]


class AttentivePooling(nn.Module):
    """Learned softmax pooling over neighbors
    (``AttentivePooling``, randlenet.py:108-136)."""

    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: [B, N, K, C] -> [B, N, 1, out]
        scores = nn.Dense(
            x.shape[-1], use_bias=False, dtype=self.dtype, name="score_fn"
        )(x)
        scores = jax.nn.softmax(scores, axis=2)  # over K
        pooled = jnp.sum(scores * x, axis=2, keepdims=True)  # [B, N, 1, C]
        return SharedMLP(self.out_features, bn=True, act="relu",
                         dtype=self.dtype, name="mlp")(pooled, train)


class LocalFeatureAggregation(nn.Module):
    """Dilated residual LFA block
    (``LocalFeatureAggregation``, randlenet.py:140-183)."""

    d_out: int
    num_neighbors: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, coords: jax.Array, features: jax.Array, train: bool = False
    ) -> jax.Array:
        # coords [B, N, 3]; features [B, N, 1, d_in] -> [B, N, 1, 2*d_out]
        idx = ops.knn_point(self.num_neighbors, coords, coords)
        sq = jnp.sum(
            (ops.index_points(coords, idx) - coords[:, :, None, :]) ** 2, -1
        )
        dist = jnp.sqrt(sq)  # torch_points knn returns euclidean distances

        x = SharedMLP(self.d_out // 2, act="lrelu02", dtype=self.dtype,
                      name="mlp1")(features, train)
        x = LocalSpatialEncoding(self.d_out // 2, dtype=self.dtype,
                                 name="lse1")(coords, x[:, :, 0], idx, dist, train)
        x = AttentivePooling(self.d_out // 2, dtype=self.dtype,
                             name="pool1")(x, train)
        x = LocalSpatialEncoding(self.d_out // 2, dtype=self.dtype,
                                 name="lse2")(coords, x[:, :, 0], idx, dist, train)
        x = AttentivePooling(self.d_out, dtype=self.dtype, name="pool2")(x, train)
        x = SharedMLP(2 * self.d_out, dtype=self.dtype, name="mlp2")(x, train)
        sc = SharedMLP(2 * self.d_out, bn=True, dtype=self.dtype,
                       name="shortcut")(features, train)
        return nn.leaky_relu(x + sc, 0.01)


@dataclasses.dataclass(frozen=True)
class RandLANetConfig:
    d_in: int = 3
    num_classes: int = 13
    num_neighbors: int = 16
    decimation: int = 4
    # encoder d_out per level (doubled by each LFA), reference :201-206
    widths: Tuple[int, ...] = (16, 64, 128, 256)


class RandLANet(nn.Module):
    """Encoder/decoder over random decimation (``RandLANet``,
    randlenet.py:186-301). ``__call__(pts [B,N,C]) -> [B, N, classes]``.

    ``rng`` (or the 'decimation' rng collection when absent) drives the
    random point permutation; pass ``deterministic=True`` for the
    identity permutation (useful for golden tests).
    """

    config: RandLANetConfig = RandLANetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pts: jax.Array,  # [B, N, d_in]
        train: bool = False,
        deterministic_perm: bool = True,
    ) -> jax.Array:
        cfg = self.config
        B, N, _ = pts.shape
        d = cfg.decimation

        if not deterministic_perm:
            perm = jax.random.permutation(self.make_rng("decimation"), N)
            pts = pts[:, perm]
        coords = pts[..., :3].astype(jnp.float32)

        x = nn.Dense(8, dtype=self.dtype, name="fc_start")(pts.astype(self.dtype))
        x = _bn("bn_start")(x, use_running_average=not train)
        x = nn.leaky_relu(x, 0.2)
        x = x[:, :, None, :]  # [B, N, 1, 8]

        # ---- encoder: LFA then decimate by slicing the (permuted) order ----
        n_lvl = len(cfg.widths)
        skips = []
        counts = [N // d**i for i in range(n_lvl + 1)]
        for i, w in enumerate(cfg.widths):
            # static clamp: at small N the deep levels hold fewer points
            # than num_neighbors (reference scenes are 10^4-10^5 points)
            k_eff = min(cfg.num_neighbors, counts[i])
            x = LocalFeatureAggregation(
                w, k_eff, dtype=self.dtype, name=f"encoder_{i}"
            )(coords[:, : counts[i]], x, train)
            skips.append(x)
            x = x[:, : counts[i + 1]]

        x = SharedMLP(2 * cfg.widths[-1], act="relu", dtype=self.dtype,
                      name="mlp")(x, train)

        # ---- decoder: 1-NN upsample + skip concat (reference :277-293) ----
        dec_widths = (256, 128, 32, 8)
        for i, w in enumerate(dec_widths):
            lvl = n_lvl - i  # coarse level index
            coarse = coords[:, : counts[lvl]]
            fine = coords[:, : counts[lvl - 1]]
            nn_idx = ops.knn_point(1, coarse, fine)  # [B, n_fine, 1]
            up = ops.index_points(x[:, :, 0], nn_idx[..., 0])[:, :, None, :]
            x = jnp.concatenate([up, skips.pop()], axis=-1)
            x = SharedMLP(w, bn=True, act="relu", dtype=self.dtype,
                          name=f"decoder_{i}")(x, train)

        # ---- head (reference :224-229) ----
        x = SharedMLP(64, bn=True, act="relu", dtype=self.dtype,
                      name="fc_end_0")(x, train)
        x = SharedMLP(32, bn=True, act="relu", dtype=self.dtype,
                      name="fc_end_1")(x, train)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = SharedMLP(cfg.num_classes, dtype=self.dtype, name="fc_end_3")(x, train)

        out = x[:, :, 0, :]  # [B, N, classes]
        if not deterministic_perm:
            inv = jnp.argsort(perm)
            out = out[:, inv]
        return out
