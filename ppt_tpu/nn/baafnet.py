"""BAAF-Net: Bilateral Augmentation and Adaptive Fusion (semantic seg).

Reference: ``openpoints/models/backbone/baafnet.py:1-527`` — pure-torch
implementation (own FPS/kNN helpers), so this port is validated by a
FULL-forward parity test.

REFERENCE DEFECT preserved behind a flag: the reference's ``knn``
(baafnet.py:7-21) calls ``topk`` without ``largest=False`` — it selects
the k FARTHEST points (and its 1-"NN" upsampling index is the farthest
coarse point). ``farthest_knn=True`` reproduces that executed behavior
for checkpoint/parity compatibility; the default ``False`` is the
corrected nearest-neighbor semantics the paper describes.

TPU-first: channels-last [B, N, C]; every 1x1 Conv1d/2d/Transpose
becomes Dense; FPS/kNN go through the shared ops layer.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu import ops


def _knn(p_db: jax.Array, p_q: jax.Array, k: int, farthest: bool) -> jax.Array:
    """Reference ``knn(db, q, k)`` (baafnet.py:7-21): top-k by distance,
    DESCENDING when ``farthest`` (the executed reference behavior)."""
    d = ops.square_distance(p_q, p_db)  # [B, Nq, Ndb]
    if farthest:
        _, idx = jax.lax.top_k(d, k)
    else:
        _, idx = jax.lax.top_k(-d, k)
    return idx


class Mlp(nn.Module):
    """MLP1d/MLP2d/the Trans variants (baafnet.py:120-241): Dense + BN +
    act over channels-last tensors (a k=1 [transpose-]conv IS a Dense)."""

    d_out: int
    bn: bool = True
    act: str = "relu"  # 'relu' | 'lrelu' | 'none'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.d_out, dtype=self.dtype, name="linear")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32, name="bn")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "lrelu":
            x = nn.leaky_relu(x, 0.2)
        return x


class BilateralAugmentation(nn.Module):
    """(baafnet.py:244-306). Returns (alc [B,N,k,d_out], p_knn_tilde)."""

    d_out: int
    k: int = 16
    farthest_knn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p, f, train: bool = False):
        knn_idx = _knn(p, p, self.k, self.farthest_knn)
        f = Mlp(self.d_out // 2, dtype=self.dtype, name="mlp0")(f, train)

        p_knn = ops.index_points(p, knn_idx).astype(self.dtype)  # [B,N,k,3]
        f_knn = ops.index_points(f, knn_idx)

        def embed(x, x_knn):
            xe = jnp.broadcast_to(x[:, :, None, :], x_knn.shape)
            return jnp.concatenate([xe, x_knn - xe], axis=-1)

        lgc = embed(p.astype(self.dtype), p_knn)  # [B,N,k,6]
        lsc = embed(f, f_knn)  # [B,N,k,d_out]

        p_knn_tilde = Mlp(3, dtype=self.dtype, name="mlp1")(lsc, train) + p_knn
        lgc_aug = jnp.concatenate([lgc, p_knn_tilde], axis=-1)  # [B,N,k,9]

        f_knn_tilde = Mlp(self.d_out // 2, dtype=self.dtype,
                          name="mlp2")(lgc_aug, train) + f_knn
        lsc_aug = jnp.concatenate([lsc, f_knn_tilde], axis=-1)

        p_enc = Mlp(self.d_out // 2, dtype=self.dtype, name="mlp3")(lgc_aug, train)
        f_enc = Mlp(self.d_out // 2, dtype=self.dtype, name="mlp4")(lsc_aug, train)
        alc = jnp.concatenate([p_enc, f_enc], axis=-1)
        return alc, p_knn_tilde


class MixedLocalAggregation(nn.Module):
    """(baafnet.py:309-338): softmax-weighted sum + max over neighbors,
    then two MLPs. [B,N,k,d] -> [B,N,2d]."""

    d: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, alc, train: bool = False):
        w = Mlp(self.d, bn=False, act="none", dtype=self.dtype,
                name="mlp0")(alc, train)
        w = jax.nn.softmax(w, axis=2)
        s = jnp.sum(alc * w, axis=2, keepdims=True)  # [B,N,1,d]
        m = jnp.max(alc, axis=2, keepdims=True)
        mla = jnp.concatenate([s, m], axis=-1)  # [B,N,1,2d]
        mla = Mlp(self.d, dtype=self.dtype, name="mlp1")(mla, train)
        mla = Mlp(2 * self.d, act="lrelu", dtype=self.dtype,
                  name="mlp2")(mla, train)
        return mla[:, :, 0, :]  # squeeze the singleton k axis


class BilateralContextBlock(nn.Module):
    d_out: int
    k: int = 16
    farthest_knn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p, f, train: bool = False):
        alc, p_knn_tilde = BilateralAugmentation(
            self.d_out, self.k, self.farthest_knn, dtype=self.dtype, name="BA"
        )(p, f, train)
        f = MixedLocalAggregation(self.d_out, dtype=self.dtype,
                                  name="MLA")(alc, train)
        return f, p_knn_tilde


@dataclasses.dataclass(frozen=True)
class BaafNetConfig:
    n_points: int = 4096
    ds_ratio: int = 4
    k: int = 16
    num_classes: int = 13
    # dims[0] = input feature channels; the rest are the encoder widths
    dims: Tuple[int, ...] = (3, 4, 16, 64, 128, 256, 512)
    farthest_knn: bool = False


class BaafNet(nn.Module):
    """(``BAAFNet``, baafnet.py:365-527). ``__call__(p [B,N,3],
    f [B,N,dims[0]]) -> per-point logits [B, N, classes]``."""

    config: BaafNetConfig = BaafNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p: jax.Array, f: jax.Array, train: bool = False):
        cfg = self.config
        dims = cfg.dims[1:]
        L = len(dims) - 1
        far = cfg.farthest_knn

        f = Mlp(dims[0] * 2, act="lrelu", dtype=self.dtype,
                name="mlp0")(f.astype(self.dtype), train)

        n_points = cfg.n_points
        f_enc = []
        us_idx_list = []
        p_knn_tilde_list = []
        for i in range(L):
            f, pkt = BilateralContextBlock(
                dims[i + 1], cfg.k, far, dtype=self.dtype,
                name=f"EncoderBCBModules_{i}",
            )(p, f, train)
            p_knn_tilde_list.append(pkt)
            if i == 0:
                f_enc.append(f)
            n_points = n_points // cfg.ds_ratio
            ds_idx = ops.farthest_point_sample(p, n_points)
            p_ds = ops.index_points(p, ds_idx)
            f = ops.index_points(f, ds_idx)
            f_enc.append(f)
            us_idx_list.append(_knn(p_ds, p, 1, far))  # [B, N_fine, 1]
            p = p_ds

        f_dec, weights = [], []
        for n in range(L):
            f = f_enc[-1 - n]
            f = Mlp(2 * dims[-1 - n], dtype=self.dtype,
                    name=f"DecoderMLPModules_{n}")(f, train)
            for j in range(L - n):
                interp = ops.index_points(f, us_idx_list[-j - n - 1][..., 0])
                f_cat = jnp.concatenate([f_enc[-j - n - 2], interp], axis=-1)
                f = Mlp(2 * dims[-2 - n - j], dtype=self.dtype,
                        name=f"DecoderReconModules_{n}_{j}")(f_cat, train)
            f_dec.append(f)
            weights.append(
                Mlp(1, bn=False, act="none", dtype=self.dtype,
                    name=f"DecoderWeightModules_{n}")(f, train)
            )

        w = jax.nn.softmax(jnp.concatenate(weights, axis=-1), axis=-1)
        f = sum(fd * w[..., n : n + 1] for n, fd in enumerate(f_dec))

        h = Mlp(64, dtype=self.dtype, name="classifier_0")(f, train)
        h = Mlp(32, dtype=self.dtype, name="classifier_1")(h, train)
        h = nn.Dropout(0.5)(h, deterministic=not train)
        return Mlp(cfg.num_classes, dtype=self.dtype,
                   name="classifier_3")(h, train)
