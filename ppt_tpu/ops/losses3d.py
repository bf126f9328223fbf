"""3D reconstruction losses: Chamfer distance and Earth Mover's Distance.

TPU-native equivalents of the reference CUDA extensions
``openpoints/cpp/chamfer_dist`` (fwd/bwd kernels + L1/L2 module variants)
and ``openpoints/cpp/emd`` (auction-algorithm approximation,
``emd_kernel.cu:1-403``). On TPU both reduce to batched distance-matrix
compute on the MXU plus reductions — XLA fuses them; the backward passes
come from autodiff (min/softassign have well-defined VJPs), so no custom
gradient kernels are needed.

Chamfer variants mirror the reference module surface
(``chamfer_dist/__init__.py:13-100``): L2 (mean of squared minima), L1
(mean of sqrt minima), and the ``_split`` forms returning both
directions separately.

EMD follows the reference's approximation contract: an assignment-based
transport cost between equal-size clouds, here computed with Sinkhorn
iterations (entropy-regularized OT) — compiler-friendly fixed-iteration
dense linear algebra instead of the data-dependent auction loop, with
``eps``/``iters`` controlling the accuracy/speed trade-off.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ppt_tpu.ops.geometry import square_distance


def chamfer_distance_split(
    xyz1: jax.Array, xyz2: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-direction squared nearest-neighbor distances.

    Returns (d1 [B, N], d2 [B, M]): d1[i] = min_j ||x1_i - x2_j||^2.
    """
    d = jnp.maximum(square_distance(xyz1, xyz2), 0.0)
    return jnp.min(d, axis=2), jnp.min(d, axis=1)


def chamfer_l2(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """ChamferDistanceL2: mean squared minima, both directions summed."""
    d1, d2 = chamfer_distance_split(xyz1, xyz2)
    return jnp.mean(d1) + jnp.mean(d2)


def chamfer_l2_split(xyz1, xyz2) -> Tuple[jax.Array, jax.Array]:
    d1, d2 = chamfer_distance_split(xyz1, xyz2)
    return jnp.mean(d1), jnp.mean(d2)


def chamfer_l1(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """ChamferDistanceL1: mean of euclidean (sqrt) minima."""
    d1, d2 = chamfer_distance_split(xyz1, xyz2)
    eps = 1e-12
    return jnp.mean(jnp.sqrt(d1 + eps)) + jnp.mean(jnp.sqrt(d2 + eps))


def chamfer_l1_split(xyz1, xyz2) -> Tuple[jax.Array, jax.Array]:
    d1, d2 = chamfer_distance_split(xyz1, xyz2)
    eps = 1e-12
    return jnp.mean(jnp.sqrt(d1 + eps)), jnp.mean(jnp.sqrt(d2 + eps))


@functools.partial(jax.jit, static_argnames=("iters",))
def emd_distance(
    xyz1: jax.Array,
    xyz2: jax.Array,
    eps: float = 0.02,
    iters: int = 50,
) -> jax.Array:
    """Approximate Earth Mover's Distance per batch element.

    Entropy-regularized optimal transport between two equal-size clouds
    with uniform marginals, solved by ``iters`` Sinkhorn iterations in
    log space (numerically stable). Returns [B] mean per-point transport
    cost (euclidean), matching the reference's ``emd(x1, x2, eps, iters)``
    contract (``emd.py``).
    """
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    cost = jnp.sqrt(jnp.maximum(square_distance(xyz1, xyz2), 0.0) + 1e-12)
    logK = -cost / eps  # [B, N, M]
    log_mu = -jnp.log(N)
    log_nu = -jnp.log(M)

    def body(carry, _):
        f, g = carry
        # row/col updates in log space
        f = eps * (
            log_mu - jax.nn.logsumexp((g[:, None, :] + logK * eps) / eps, axis=2)
        )
        g = eps * (
            log_nu - jax.nn.logsumexp((f[:, :, None] + logK * eps) / eps, axis=1)
        )
        return (f, g), None

    f0 = jnp.zeros((B, N))
    g0 = jnp.zeros((B, M))
    (f, g), _ = jax.lax.scan(body, (f0, g0), None, length=iters)
    log_pi = (f[:, :, None] + g[:, None, :]) / eps + logK
    pi = jnp.exp(log_pi)  # transport plan, rows ~ 1/N
    return jnp.sum(pi * cost, axis=(1, 2))
