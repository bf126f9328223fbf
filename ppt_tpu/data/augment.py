"""On-device, fused point-cloud augmentations.

The reference augments per-sample in numpy inside DataLoader workers
(``data/dataset_3d.py:63-160``); here the same transforms are pure
``jax.random``-keyed batch functions that fuse into the training step —
no host round-trip, no per-sample Python loops, deterministic under a
key. Each function takes ``[B, N, 3]`` and a key and is fully vectorized
over the batch.

Semantics parity (same distributions as the reference):
  - ``translate_pointcloud``: per-cloud anisotropic scale U[2/3, 3/2] and
    shift U[-0.2, 0.2] (``:155-160``) — the only train-time augmentation
    the PPT drivers actually use;
  - ``rotate_y``: per-cloud uniform rotation about the gravity axis;
  - ``jitter``: clipped Gaussian noise per point;
  - ``random_point_dropout``: replaces a random subset with the first
    point (keeps shapes static, like the reference ``:83-90``);
  - ``shuffle_points``: random permutation per cloud (randomizes the FPS
    seed point, matching ``np.random.shuffle`` in the loaders).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def normalize_to_unit_sphere(pc: jax.Array) -> jax.Array:
    """Center at the centroid and scale to max radius 1 per cloud
    (``pc_normalize``, data/dataset_3d.py:33-40)."""
    centered = pc - jnp.mean(pc, axis=-2, keepdims=True)
    scale = jnp.max(
        jnp.linalg.norm(centered, axis=-1, keepdims=True), axis=-2, keepdims=True
    )
    return centered / scale


def translate_pointcloud(key: jax.Array, pc: jax.Array) -> jax.Array:
    B = pc.shape[0]
    k1, k2 = jax.random.split(key)
    scale = jax.random.uniform(k1, (B, 1, 3), minval=2.0 / 3.0, maxval=3.0 / 2.0)
    shift_ = jax.random.uniform(k2, (B, 1, 3), minval=-0.2, maxval=0.2)
    return pc * scale + shift_


def rotate_y(key: jax.Array, pc: jax.Array) -> jax.Array:
    """Per-cloud rotation about the up (y) axis
    (``rotate_point_cloud``, :63-81)."""
    B = pc.shape[0]
    angle = jax.random.uniform(key, (B,), maxval=2.0 * jnp.pi)
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack(
        [c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1
    ).reshape(B, 3, 3)
    return jnp.einsum("bnc,bcd->bnd", pc, rot)


def rotate_perturbation(
    key: jax.Array, pc: jax.Array, angle_sigma: float = 0.06, angle_clip: float = 0.18
) -> jax.Array:
    """Small random rotations about all three axes (``:133-152``)."""
    B = pc.shape[0]
    angles = jnp.clip(
        angle_sigma * jax.random.normal(key, (B, 3)), -angle_clip, angle_clip
    )
    ax, ay, az = angles[:, 0], angles[:, 1], angles[:, 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    zeros, ones = jnp.zeros_like(cx), jnp.ones_like(cx)
    Rx = jnp.stack([ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], -1).reshape(B, 3, 3)
    Ry = jnp.stack([cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], -1).reshape(B, 3, 3)
    Rz = jnp.stack([cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], -1).reshape(B, 3, 3)
    R = jnp.einsum("bij,bjk,bkl->bil", Rz, Ry, Rx)
    return jnp.einsum("bnc,bcd->bnd", pc, R)


def jitter(
    key: jax.Array, pc: jax.Array, sigma: float = 0.01, clip: float = 0.05
) -> jax.Array:
    noise = jnp.clip(sigma * jax.random.normal(key, pc.shape), -clip, clip)
    return pc + noise


def random_scale(
    key: jax.Array, pc: jax.Array, lo: float = 0.8, hi: float = 1.25
) -> jax.Array:
    B = pc.shape[0]
    s = jax.random.uniform(key, (B, 1, 1), minval=lo, maxval=hi)
    return pc * s


def shift(key: jax.Array, pc: jax.Array, rng: float = 0.1) -> jax.Array:
    B = pc.shape[0]
    t = jax.random.uniform(key, (B, 1, 3), minval=-rng, maxval=rng)
    return pc + t


def random_point_dropout(
    key: jax.Array, pc: jax.Array, max_dropout_ratio: float = 0.875
) -> jax.Array:
    B, N, _ = pc.shape
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, (B, 1))  # per-cloud dropout ratio
    u = jax.random.uniform(k2, (B, N))
    drop = u <= ratio * max_dropout_ratio
    first = pc[:, :1, :]
    return jnp.where(drop[..., None], first, pc)


def shuffle_points(key: jax.Array, pc: jax.Array) -> jax.Array:
    B, N, _ = pc.shape
    keys = jax.random.split(key, B)
    perm = jax.vmap(lambda k: jax.random.permutation(k, N))(keys)
    return jnp.take_along_axis(pc, perm[..., None], axis=1)


def append_height(pc: jax.Array, gravity_dim: int = 1) -> jax.Array:
    """Append ``y - min(y)`` as a 4th channel (PointNeXt's use_height,
    ``data/dataset_3d.py:415-419``)."""
    h = pc[..., gravity_dim : gravity_dim + 1]
    h = h - jnp.min(h, axis=-2, keepdims=True)
    return jnp.concatenate([pc, h], axis=-1)


@functools.partial(jax.jit, static_argnames=("use_height",))
def train_augment(
    key: jax.Array, pc: jax.Array, use_height: bool = False
) -> jax.Array:
    """The PPT drivers' train-time pipeline: anisotropic scale+shift, then
    point shuffle (loader parity), then optional height channel — one
    fused on-device kernel."""
    k1, k2 = jax.random.split(key)
    out = translate_pointcloud(k1, pc)
    out = shuffle_points(k2, out)
    if use_height:
        out = append_height(out)
    return out
