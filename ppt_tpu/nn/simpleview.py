"""SimpleView: multi-view depth projection + thin ResNet18 classifier.

Reference: ``openpoints/models/backbone/simpleview.py:32-153`` (MVModel +
MVFC) and ``simpleview_util.py`` (PCViews: 6 orthographic cameras,
perspective projection, inverse-depth-weighted splatting).

TPU-first redesign: the projection is one fused jnp pipeline —
all 6 views batched into ``[B*6, N, 3]`` by a constant rotation stack,
the per-pixel scatter_add of the reference (``distribute``,
simpleview_util.py:60-133) becomes two ``.at[].add`` scatters over a
flattened ``[B*6*R*R]`` canvas. The CNN runs NHWC on the MXU.

Exact reference quirks preserved for parity: ``ceil(x - size/2)``
pixel rounding, modulo wrap of out-of-bounds coordinates combined with
an in-bounds mask (so wrapped pixels receive zero weight), inverse-depth
weights, zero-depth fallback where no point lands, and the camera set
``TRANS=-1.4`` at ``RESOLUTION=128``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ppt_tpu.nn.resnet import ResNetStages

RESOLUTION = 128
TRANS = -1.4


def _euler2mat(angles: np.ndarray) -> np.ndarray:
    """Batch of XYZ euler rotations (``euler2mat``,
    simpleview_util.py:8-57): R = Rx @ Ry @ Rz."""
    out = []
    for x, y, z in angles:
        cz, sz = np.cos(z), np.sin(z)
        cy, sy = np.cos(y), np.sin(y)
        cx, sx = np.cos(x), np.sin(x)
        zmat = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        ymat = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        xmat = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        out.append(xmat @ ymat @ zmat)
    return np.stack(out)


def _pc_views() -> Tuple[np.ndarray, np.ndarray]:
    """The 6 camera poses (``PCViews.__init__``,
    simpleview_util.py:240-252). Returns (rot [6,3,3] pre-transposed,
    trans [6,3])."""
    views = np.asarray([
        [[0 * np.pi / 2, 0, np.pi / 2], [0, 0, TRANS]],
        [[1 * np.pi / 2, 0, np.pi / 2], [0, 0, TRANS]],
        [[2 * np.pi / 2, 0, np.pi / 2], [0, 0, TRANS]],
        [[3 * np.pi / 2, 0, np.pi / 2], [0, 0, TRANS]],
        [[0, -np.pi / 2, np.pi / 2], [0, 0, TRANS]],
        [[0, np.pi / 2, np.pi / 2], [0, 0, TRANS]],
    ])
    rot = _euler2mat(views[:, 0, :]).transpose(0, 2, 1)
    return rot.astype(np.float32), views[:, 1, :].astype(np.float32)


def points_to_depth_views(points: jax.Array, resolution: int = RESOLUTION) -> jax.Array:
    """[B, N, 3] -> [B*6, R, R] depth images (``PCViews.get_img`` +
    ``points2depth`` with size_x = size_y = 1)."""
    B, N, _ = points.shape
    rot, trans = _pc_views()
    V = rot.shape[0]
    # interleave like torch.repeat_interleave(points, V, dim=0):
    # image b*V+v = view v of cloud b
    p = points[:, None, :, :]  # [B, 1, N, 3]
    p = jnp.broadcast_to(p, (B, V, N, 3)).reshape(B * V, N, 3)
    rmat = jnp.tile(jnp.asarray(rot), (B, 1, 1))  # [B*V, 3, 3]
    tvec = jnp.tile(jnp.asarray(trans), (B, 1))[:, None, :]
    p = p @ rmat - tvec  # [B*V, N, 3]

    R = resolution
    eps = 1e-12
    depth = p[:, :, 2]
    cx = (p[:, :, 0] / (depth + eps) + 1.0) * R / 2.0
    cy = (p[:, :, 1] / (depth + eps) + 1.0) * R / 2.0
    # size 1 splat: ceil(c - 0.5) (simpleview_util.py:78-88)
    px = jnp.ceil(cx - 0.5)
    py = jnp.ceil(cy - 0.5)
    valid = (
        (px >= 0) & (px <= R - 1) & (py >= 0) & (py <= R - 1) & (depth >= 0)
    )
    # modulo wrap like the reference; masked weights zero them out
    ix = jnp.mod(px, R).astype(jnp.int32)
    iy = jnp.mod(py, R).astype(jnp.int32)
    w = valid.astype(jnp.float32) / (depth + eps)
    wv = depth * w

    BV = B * V
    base = (jnp.arange(BV, dtype=jnp.int32) * (R * R))[:, None]
    flat = (base + ix * R + iy).reshape(-1)
    wsum = jnp.zeros((BV * R * R,), jnp.float32).at[flat].add(w.reshape(-1))
    vsum = jnp.zeros((BV * R * R,), jnp.float32).at[flat].add(wv.reshape(-1))
    wsum = jnp.where(wsum == 0.0, 1.0, wsum)
    return (vsum / wsum).reshape(BV, R, R)


@dataclasses.dataclass(frozen=True)
class SimpleViewConfig:
    num_classes: int = 15
    channels: int = 16  # thin-resnet stem width (``MVModel(channels=16)``)
    resolution: int = RESOLUTION
    dropout: float = 0.5
    layers: Tuple[int, ...] = (2, 2, 2, 2)


class SimpleView(nn.Module):
    """MVModel (simpleview.py:62-116): project -> shared CNN over the 6
    views -> MVFC fusion head. ``__call__(pts [B,N,3]) -> [B, classes]``.
    """

    config: SimpleViewConfig = SimpleViewConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        B = pts.shape[0]
        img = points_to_depth_views(pts.astype(jnp.float32), cfg.resolution)
        img = img[..., None].astype(self.dtype)  # NHWC, 1 channel

        # stem replacing resnet's 7x7 (simpleview.py:143-148)
        h = nn.Conv(cfg.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(img)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="stem_bn")(h)
        h = nn.relu(h)
        feat = ResNetStages(
            layers=cfg.layers, feature_size=cfg.channels,
            zero_init_residual=True, dtype=self.dtype, name="backbone",
        )(h, train)  # [B*6, channels*8]

        # MVFC (simpleview.py:33-58)
        V = 6
        in_feat = feat.shape[-1]
        f = feat.reshape(B, V, in_feat)
        f = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="fc_bn0")(f)
        f = nn.Dropout(cfg.dropout)(f, deterministic=not train)
        f = f.reshape(B, V * in_feat)
        f = nn.Dense(in_feat, dtype=self.dtype, name="fc1")(f)
        f = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="fc_bn1")(f)
        f = nn.relu(f)
        f = nn.Dropout(cfg.dropout)(f, deterministic=not train)
        return nn.Dense(cfg.num_classes, dtype=self.dtype, name="fc2")(f)
