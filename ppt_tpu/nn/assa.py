"""ASSA — Anisotropic Separable Set Abstraction (ASSANet's aggregator).

Reference: ``openpoints/models/layers/local_aggregation.py:32-140``
(the layer behind ``cfgs/s3dis/assanet*.yaml``) with grouping from
``layers/group.py`` (ball query, relative xyz normalized by the radius).

The anisotropic step: grouped neighbor features are multiplied by EACH
of the 3 relative-coordinate channels, tripling the channel dim before
the neighborhood reduction —

    out[b, q, (a, c)] = reduce_s  dp[b, q, s, a] * fj[b, q, s, c]

which is exactly a tiny batched matmul over the neighborhood axis; the
torch reference materializes the expanded [B, 3C, np, ns] tensor
(local_aggregation.py:128-132), here it is one einsum the MXU chews.

Pointwise convs sandwich the reduction (pre-convs on the support set,
post-convs on the aggregated queries), with a residual from the
query-gathered pre-conv features (:121-126, :134-139). Channel plan
quirks preserved: for ``feature_type='assa'`` without inverted dims the
pre-reduction width is ceil(w/3) so the 3x expansion restores ~w
(:67-69).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu import ops


class _ConvBnAct1d(nn.Module):
    out: int
    use_act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.out, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="bn")(x)
        if self.use_act:
            x = nn.relu(x)
        return x


class Assa(nn.Module):
    """channels = the reference's channel list (pre-mutation); the same
    ceil(w/3) adjustment is applied internally for 'assa'."""

    channels: Tuple[int, ...]
    radius: float = 0.1
    nsample: int = 16
    feature_type: str = "assa"  # 'assa' | 'dp_fj'
    reduction: str = "mean"  # 'mean' | 'max' | 'sum'
    use_res: bool = True
    use_inverted_dims: bool = False
    normalize_dp: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query_xyz: jax.Array,  # [B, np, 3]
        support_xyz: jax.Array,  # [B, N, 3]
        feats: jax.Array,  # [B, N, C]
        query_idx: Optional[jax.Array] = None,  # [B, np] into support
        train: bool = False,
    ) -> jax.Array:
        chans = list(self.channels)
        num_preconv = int(math.ceil((len(chans) - 1) / 2))
        if self.feature_type == "assa" and not self.use_inverted_dims:
            chans[num_preconv] = int(math.ceil(chans[num_preconv] / 3.0))

        h = feats.astype(self.dtype)
        for i in range(num_preconv):
            h = _ConvBnAct1d(chans[i + 1], dtype=self.dtype,
                             name=f"conv{i}")(h, train)
        skip_src = h  # [B, N, C']

        idx = ops.query_ball_point(
            self.radius, self.nsample, support_xyz, query_xyz
        )
        dp = ops.index_points(support_xyz, idx) - query_xyz[:, :, None, :]
        if self.normalize_dp:
            dp = dp / self.radius
        fj = ops.index_points(h, idx)  # [B, np, ns, C']

        if self.feature_type == "assa":
            # anisotropic: einsum over the neighborhood axis replaces the
            # reference's materialized [B, 3C, np, ns] expansion
            agg = jnp.einsum(
                "bqsa,bqsc->bqac", dp.astype(self.dtype), fj
            )  # [B, np, 3, C']
            if self.reduction == "mean":
                agg = agg / self.nsample
            elif self.reduction == "sum":
                pass  # the einsum already sums over the neighborhood
            elif self.reduction == "max":
                # max needs the expanded form; small shapes only
                expanded = dp[..., :, None].astype(self.dtype) * fj[..., None, :]
                agg = jnp.max(expanded, axis=2)
            B, np_, _, c = agg.shape
            # reference channel order: (coordinate axis major, feature
            # minor) — fj.unsqueeze(1).expand(B,3,...) * dp.unsqueeze(2)
            # then view(B, 3*C, ...) (local_aggregation.py:128-132)
            h = agg.reshape(B, np_, 3 * c)
        else:  # dp_fj
            cat = jnp.concatenate([dp.astype(self.dtype), fj], axis=-1)
            if self.reduction == "mean":
                h = jnp.mean(cat, axis=2)
            elif self.reduction == "sum":
                h = jnp.sum(cat, axis=2)
            else:
                h = jnp.max(cat, axis=2)

        for j, i in enumerate(range(num_preconv, len(chans) - 1)):
            last = self.use_res and i == len(chans) - 2
            h = _ConvBnAct1d(chans[i + 1], use_act=not last,
                             dtype=self.dtype, name=f"conv{num_preconv + j}")(
                h, train
            )

        if self.use_res:
            if query_idx is not None:
                skip = ops.index_points(skip_src, query_idx)
            else:
                skip = skip_src
            if skip.shape[-1] != chans[-1]:
                skip = nn.Dense(chans[-1], use_bias=False, dtype=self.dtype,
                                name="skip_layer")(skip)
            h = nn.relu(h + skip)
        return h
