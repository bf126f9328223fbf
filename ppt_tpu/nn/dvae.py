"""Discrete VAE point-cloud tokenizer (PointBERT's dVAE).

Reference: ``models/pointbert/dvae.py:19-344`` — Group + mini-PointNet
encoder, a 4-round EdgeConv (DGCNN) head producing per-group token
logits, a Gumbel-softmax codebook lookup, a second DGCNN, and a folding
decoder reconstructing each neighborhood (coarse MLP points + fine
grid-folded points). Losses: coarse+fine Chamfer-L1 plus a KL term
pushing mean token usage toward uniform.

Channels-last flax re-design; the EdgeConv neighbor search is the shared
``ops.knn_point`` (k=4 as in the reference's ``get_graph_feature``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ppt_tpu import ops
from ppt_tpu.nn.pointbert import MiniPointNet, group_points
from ppt_tpu.ops.losses3d import chamfer_l1


@dataclasses.dataclass(frozen=True)
class DvaeConfig:
    group_size: int = 32
    num_group: int = 64
    encoder_dims: int = 256
    tokens_dims: int = 256
    decoder_dims: int = 256
    num_tokens: int = 8192


class EdgeConvStack(nn.Module):
    """DGCNN feature head (``DGCNN``, dvae.py:19-112): input transform +
    4 EdgeConv rounds (k=4) + a fusion layer over the concatenated
    per-round features."""

    output_channel: int
    k: int = 4
    dtype: jnp.dtype = jnp.float32

    def _edge(self, coor: jax.Array, f: jax.Array) -> jax.Array:
        idx = jax.lax.stop_gradient(ops.knn_point(self.k, coor, coor))
        nbrs = ops.index_points(f, idx)  # [B, N, k, D]
        q = jnp.broadcast_to(f[:, :, None, :], nbrs.shape)
        return jnp.concatenate([nbrs - q, q], axis=-1)

    @nn.compact
    def __call__(self, f: jax.Array, coor: jax.Array) -> jax.Array:
        # f: [B, G, C]; coor: [B, G, 3] -> [B, G, output_channel]
        f = nn.Dense(128, dtype=self.dtype, name="input_trans")(f)
        feats = []
        widths = (256, 512, 512, 1024)
        for i, w in enumerate(widths):
            h = self._edge(coor, f)
            h = nn.Dense(w, use_bias=False, dtype=self.dtype, name=f"layer{i+1}")(h)
            h = nn.GroupNorm(num_groups=4, dtype=jnp.float32, name=f"gn{i+1}")(h)
            h = nn.leaky_relu(h, 0.2)
            f = jnp.max(h, axis=2)
            feats.append(f)
        cat = jnp.concatenate(feats, axis=-1)  # [B, G, 2304]
        out = nn.Dense(
            self.output_channel, use_bias=False, dtype=self.dtype, name="layer5"
        )(cat)
        out = nn.GroupNorm(num_groups=4, dtype=jnp.float32, name="gn5")(out)
        return nn.leaky_relu(out, 0.2)


class FoldingDecoder(nn.Module):
    """Per-group folding decoder (``Decoder``, dvae.py:226-280):
    a coarse-point MLP plus a 2x2-grid folding refinement."""

    num_fine: int  # == group_size, multiple of 4
    grid_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        # feature: [B, G, C] -> coarse [B, G, M, 3], fine [B, G, num_fine, 3]
        B, G, C = feature.shape
        num_coarse = self.num_fine // (self.grid_size**2)
        S = self.grid_size**2

        h = nn.Dense(1024, dtype=self.dtype, name="mlp1")(feature)
        h = nn.relu(h)
        h = nn.Dense(1024, dtype=self.dtype, name="mlp2")(h)
        h = nn.relu(h)
        coarse = nn.Dense(3 * num_coarse, dtype=self.dtype, name="mlp3")(h)
        coarse = coarse.reshape(B, G, num_coarse, 3)

        # folding grid seed in [-0.05, 0.05]^2
        lin = np.linspace(-0.05, 0.05, self.grid_size, dtype=np.float32)
        seed = np.stack(
            [np.tile(lin, self.grid_size), np.repeat(lin, self.grid_size)], -1
        )  # [S, 2]
        seed = jnp.asarray(seed)

        center = jnp.repeat(coarse, S, axis=2)  # [B, G, num_fine, 3]
        seeds = jnp.tile(seed[None, None, None], (B, G, num_coarse, 1, 1))
        seeds = seeds.reshape(B, G, self.num_fine, 2)
        glob = jnp.broadcast_to(
            feature[:, :, None, :], (B, G, self.num_fine, C)
        )
        feat = jnp.concatenate(
            [glob, seeds.astype(self.dtype), center.astype(self.dtype)], axis=-1
        )

        x = nn.Dense(512, dtype=self.dtype, name="final1")(feat)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="fbn1")(x)
        x = nn.relu(x)
        x = nn.Dense(512, dtype=self.dtype, name="final2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="fbn2")(x)
        x = nn.relu(x)
        fine = nn.Dense(3, dtype=self.dtype, name="final3")(x) + center
        return coarse, fine


class DiscreteVAE(nn.Module):
    """Point-cloud tokenizer (``DiscreteVAE``, dvae.py:283-344)."""

    config: DvaeConfig = DvaeConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = MiniPointNet(cfg.encoder_dims, dtype=self.dtype)
        self.dgcnn_1 = EdgeConvStack(cfg.num_tokens, dtype=self.dtype)
        self.codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (cfg.num_tokens, cfg.tokens_dims),
        )
        self.dgcnn_2 = EdgeConvStack(cfg.decoder_dims, dtype=self.dtype)
        self.decoder = FoldingDecoder(cfg.group_size, dtype=self.dtype)

    def group_logits(
        self, neighborhood: jax.Array, center: jax.Array, train: bool = False
    ) -> jax.Array:
        """Codebook logits per group [B, G, num_tokens]."""
        tokens = self.encoder(neighborhood, train)
        return self.dgcnn_1(tokens, center)

    def tokenize(
        self, neighborhood: jax.Array, center: jax.Array, train: bool = False
    ) -> jax.Array:
        """Discrete group ids [B, G] — the MPM pretraining targets."""
        return jnp.argmax(self.group_logits(neighborhood, center, train), axis=-1)

    def __call__(
        self,
        pts: jax.Array,
        temperature: float = 1.0,
        hard: bool = False,
        train: bool = False,
    ):
        cfg = self.config
        neighborhood, center = group_points(pts, cfg.num_group, cfg.group_size)
        logits = self.group_logits(neighborhood, center, train)

        codebook = self.codebook
        if train:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(self.make_rng("gumbel"), logits.shape,
                                   minval=1e-20, maxval=1.0)
            ))
            y = jax.nn.softmax((logits + g) / temperature, axis=-1)
        else:
            y = jax.nn.softmax(logits / temperature, axis=-1)
        if hard:
            one_hot = jax.nn.one_hot(
                jnp.argmax(y, -1), cfg.num_tokens, dtype=y.dtype
            )
            y = one_hot + y - jax.lax.stop_gradient(y)  # straight-through

        sampled = jnp.einsum("bgn,nc->bgc", y, codebook.astype(y.dtype))
        feature = self.dgcnn_2(sampled, center)
        coarse, fine = self.decoder(feature, train)

        whole_fine = (fine + center[:, :, None, :]).reshape(pts.shape[0], -1, 3)
        whole_coarse = (coarse + center[:, :, None, :]).reshape(pts.shape[0], -1, 3)
        return {
            "whole_coarse": whole_coarse,
            "whole_fine": whole_fine,
            "coarse": coarse,
            "fine": fine,
            "neighborhood": neighborhood,
            "logits": logits,
        }


def dvae_loss(
    ret, num_tokens: int, recon: str = "chamfer"
) -> Tuple[jax.Array, jax.Array]:
    """(reconstruction, KL) losses (``DiscreteVAE.get_loss``,
    dvae.py:301-330): per-group reconstruction coarse+fine; KL of mean
    token distribution from uniform. ``recon`` selects the
    reconstruction metric: 'chamfer' (reference default, Chamfer-L1) or
    'emd' (the reference's approxmatch EMD, ``emd_kernel.cu`` — the
    dvae config's other loss option)."""
    B, G = ret["coarse"].shape[:2]
    coarse = ret["coarse"].reshape(B * G, -1, 3)
    fine = ret["fine"].reshape(B * G, -1, 3)
    gt = ret["neighborhood"].reshape(B * G, -1, 3)
    if recon == "emd":
        from ppt_tpu.ops.losses3d import earth_mover_distance

        loss_recon = earth_mover_distance(coarse, gt) + earth_mover_distance(
            fine, gt
        )
    else:
        loss_recon = chamfer_l1(coarse, gt) + chamfer_l1(fine, gt)

    softmax = jax.nn.softmax(ret["logits"], axis=-1)
    mean_softmax = jnp.mean(softmax, axis=1)  # [B, num_tokens]
    log_qy = jnp.log(mean_softmax + 1e-10)
    log_uniform = -jnp.log(num_tokens)
    # KL(uniform || qy), batchmean — matches torch's kl_div arg order
    loss_klv = jnp.mean(
        jnp.sum(jnp.exp(log_uniform) * (log_uniform - log_qy), axis=-1)
    )
    return loss_recon, loss_klv
