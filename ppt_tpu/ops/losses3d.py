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

EMD ships in two forms:

- :func:`emd_matchcost` / :func:`earth_mover_distance` — the reference
  contract: Fan's ``approxmatch`` multi-scale soft assignment
  (``emd_kernel.cu:29-161``) with its exact annealing schedule, squared-
  distance cost, and match-is-constant gradients. Use this wherever the
  reference uses ``emd_cuda``; dVAE/reconstruction numbers compare.
- :func:`emd_distance` — entropy-regularized OT via Sinkhorn, kept as an
  alternative with *euclidean* (not squared) cost and fully
  differentiable transport plan. DIVERGENCE vs the reference: different
  approximation (entropic blur vs annealed capacity auction), different
  cost exponent, and gradients also flow through the plan — values and
  gradients are NOT comparable with reference EMD numbers.
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


def approx_match(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Fan's multi-scale soft-assignment matching — the reference EMD's
    ``approxmatch`` kernel (``openpoints/cpp/emd/cuda/emd_kernel.cu:29-161``)
    as ten rounds of batched MXU matmuls.

    Ten annealing levels ``-4^j`` for j = 7..-1 plus a final 0 level; at
    each level every left point bids its remaining supply proportionally
    to ``exp(level * d^2)`` against the remaining right capacities, right
    points cap consumption at their capacity, and the resulting flow
    accumulates into the match. Exact transcription of the CUDA update
    order (ratioL from remainL/suml; sumr scaled by remainR; consumption
    clamp; remainders floored at 0).

    Returns the transport plan ``match [B, N, M]`` (the reference stores
    the transpose ``[B, M, N]``). Supplies are ``multiL = max(M // N, 1)``
    per left point and ``multiR = max(N // M, 1)`` per right point
    (integer ratios, as in the kernel).
    """
    N, M = xyz1.shape[1], xyz2.shape[1]
    multi_l = 1.0 if N >= M else float(M // N)
    multi_r = float(N // M) if N >= M else 1.0
    d2 = jnp.maximum(square_distance(xyz1, xyz2), 0.0)  # [B, N, M]
    levels = jnp.asarray(
        [-(4.0**j) for j in range(7, -2, -1)] + [0.0], jnp.float32
    )

    B = xyz1.shape[0]
    init = (
        jnp.full((B, N), multi_l, jnp.float32),  # remainL
        jnp.full((B, M), multi_r, jnp.float32),  # remainR
        jnp.zeros((B, N, M), jnp.float32),  # match
    )

    def level_step(carry, level):
        remain_l, remain_r, match = carry
        w = jnp.exp(level * d2)  # [B, N, M]
        suml = 1e-9 + jnp.einsum("bnm,bm->bn", w, remain_r)
        ratio_l = remain_l / suml
        sumr = jnp.einsum("bnm,bn->bm", w, ratio_l) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        flow = w * ratio_l[:, :, None] * ratio_r[:, None, :]
        match = match + flow
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(flow, axis=2))
        return (remain_l, remain_r, match), None

    (_, _, match), _ = jax.lax.scan(level_step, init, levels)
    return match


@jax.jit
def emd_matchcost(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Reference-contract EMD: ``matchcost(approxmatch(x1, x2))`` — the
    total *squared*-distance transport cost per batch element, [B].

    Gradients match the reference's custom backward
    (``matchcostgrad{1,2}``, ``emd_kernel.cu:287-358``): the match is a
    constant (stop_gradient) and only the distance term differentiates —
    grad1 = 2 Σ_l match (x1-x2), identical to autodiff of
    ``sum(d2 * const_match)``.
    """
    match = jax.lax.stop_gradient(approx_match(xyz1, xyz2))
    d2 = jnp.maximum(square_distance(xyz1, xyz2), 0.0)
    return jnp.sum(d2 * match, axis=(1, 2))


def earth_mover_distance(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """The reference's module-level wrapper (``emd.py:32-48``):
    ``matchcost / N1``, averaged over the batch. Scalar.

    On TPU the ten-level auction runs as the fused Pallas kernel
    (``kernels/emd.py`` — d2 read once, match written once, no per-level
    HBM intermediates) when the shape fits its VMEM bound; the XLA scan
    above is the fallback and semantic spec. ``PPT_FORCE_XLA_EMD=1``
    disables the kernel (A/B escape hatch, same convention as the other
    fused kernels)."""
    import os

    from ppt_tpu.kernels.emd import emd_fits_pallas, emd_matchcost_pallas

    use_pallas = (
        jax.devices()[0].platform == "tpu"
        and not os.environ.get("PPT_FORCE_XLA_EMD")
        and emd_fits_pallas(xyz1.shape[1], xyz2.shape[1])
    )
    cost_fn = emd_matchcost_pallas if use_pallas else emd_matchcost
    return jnp.mean(cost_fn(xyz1, xyz2) / xyz1.shape[1])


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
