"""Pallas TPU kernel for the auction-EMD soft matching (approxmatch).

Native-parity equivalent of the reference CUDA auction kernel
(``openpoints/cpp/emd/cuda/emd_kernel.cu:29-161`` — ``approxmatch``) and
its cost/grad pair (``matchcost`` :163-192, ``matchcostgrad{1,2}``
:287-358). The pure-XLA formulation (``ppt_tpu.ops.losses3d.approx_match``)
scans ten annealing levels, each materializing the ``[B, N, M]`` bid
matrix ``w = exp(level * d2)`` in HBM; this kernel keeps the whole
ten-level auction resident in VMEM per (row-block of) batch element —
``d2`` is read once, ``match`` written once, and the ~10x intermediate
HBM traffic disappears.

Semantics are an exact transcription of the CUDA update order (ratioL
from remainL/suml; sumr scaled by remainR; consumption clamp at 1;
remainders floored at 0) — identical math to the XLA version, which the
golden tests compare against (``tests/test_emd_kernel.py``); the XLA
version is itself parity-tested against a literal numpy transcription of
the CUDA kernel (``tests/test_losses3d.py``).

Gradients: ``emd_matchcost_pallas`` carries a ``custom_vjp`` implementing
the reference's closed-form backward — the match is a constant and only
the squared-distance term differentiates (grad1 = 2 Σ_m match (x1-x2),
``matchcostgrad1``) — as two cheap batched matmuls against the saved
match, no auction replay in the backward.

VMEM bound: the unrolled auction holds ~4 f32 buffers of
``[rows, n_pad, m_pad]``; :func:`emd_fits_pallas` reports whether a shape
fits the scoped limit so callers (``ops.losses3d.earth_mover_distance``)
can fall back to XLA for oversize clouds instead of OOMing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppt_tpu.ops.geometry import square_distance

# -4^j for j = 7..-1, then a final exact level 0 — the CUDA kernel's
# annealing schedule (emd_kernel.cu:63: factorl = -4^(7-i) loop)
_LEVELS = tuple(-(4.0**j) for j in range(7, -2, -1)) + (0.0,)

# ~4 live [rows, n_pad, m_pad] f32 buffers (d2, w, flow, match) under a
# ~16 MB scoped VMEM limit -> cap rows*n_pad*m_pad
_VMEM_ELEMS = 786_432  # 12 MB / (4 buffers * 4 B)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def emd_fits_pallas(n: int, m: int) -> bool:
    """True if one batch element's auction fits VMEM (rows=1 floor)."""
    return _round_up(n, 8) * _round_up(m, 128) <= _VMEM_ELEMS


def _approx_match_kernel(n_valid, m_valid, multi_l, multi_r, d2_ref, out_ref):
    """d2_ref: [R, Np, Mp] f32 squared distances (padded entries are 0 —
    masked below via zero remain supplies); out_ref: [R, Np, Mp] match."""
    rows, n_p, m_p = d2_ref.shape
    d2 = d2_ref[:, :, :]
    row = lax.broadcasted_iota(jnp.int32, (rows, n_p, 1), 1)
    col = lax.broadcasted_iota(jnp.int32, (rows, 1, m_p), 2)
    # padded rows carry zero supply / padded cols zero capacity, so no
    # flow ever lands there (ratio_l = 0 / ratio_r = 0 kill every term)
    remain_l = jnp.where(row < n_valid, jnp.float32(multi_l), 0.0)
    remain_r = jnp.where(col < m_valid, jnp.float32(multi_r), 0.0)
    match = jnp.zeros((rows, n_p, m_p), jnp.float32)
    for level in _LEVELS:  # static 10-level unroll
        w = jnp.exp(jnp.float32(level) * d2)
        suml = 1e-9 + jnp.sum(w * remain_r, axis=2, keepdims=True)
        ratio_l = remain_l / suml
        sumr = jnp.sum(w * ratio_l, axis=1, keepdims=True) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        flow = w * ratio_l * ratio_r
        match = match + flow
        remain_l = jnp.maximum(
            0.0, remain_l - jnp.sum(flow, axis=2, keepdims=True)
        )
    out_ref[:, :, :] = match


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def approx_match_pallas(
    xyz1: jax.Array, xyz2: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """Transport plan ``match [B, N, M]`` — Pallas auction, one VMEM pass.

    Same contract as ``ops.losses3d.approx_match`` (supplies
    ``multiL = max(M // N, 1)`` / ``multiR = max(N // M, 1)``, ten
    annealing levels). Raises if the shape exceeds the VMEM bound —
    gate with :func:`emd_fits_pallas`.
    """
    if interpret is None:  # hardware lowering only exists on TPU
        interpret = not _is_tpu()
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    if not emd_fits_pallas(N, M):
        raise ValueError(
            f"approx_match_pallas: N={N}, M={M} exceeds the VMEM bound; "
            "use ops.losses3d.approx_match"
        )
    multi_l = 1.0 if N >= M else float(M // N)
    multi_r = float(N // M) if N >= M else 1.0
    d2 = jnp.maximum(square_distance(xyz1, xyz2), 0.0).astype(jnp.float32)

    n_pad = _round_up(N, 8)
    m_pad = _round_up(M, 128)
    # batch small auctions 8 batch-rows per grid instance (dVAE runs
    # B*G=2048 tiny per-group clouds — 1 row/instance would be pure grid
    # overhead); large clouds take 1 row under the VMEM cap
    rows = next(
        r for r in (8, 4, 2, 1) if r * n_pad * m_pad <= _VMEM_ELEMS
    )
    b_pad = _round_up(B, rows)
    if (b_pad, n_pad, m_pad) != d2.shape:
        d2 = jnp.pad(
            d2,
            ((0, b_pad - B), (0, n_pad - N), (0, m_pad - M)),
        )

    out = pl.pallas_call(
        functools.partial(_approx_match_kernel, N, M, multi_l, multi_r),
        grid=(b_pad // rows,),
        in_specs=[
            pl.BlockSpec(
                (rows, n_pad, m_pad),
                lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (rows, n_pad, m_pad), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(d2)
    return out[:B, :N, :M]


@jax.custom_vjp
def emd_matchcost_pallas(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Reference-contract EMD matchcost [B] via the Pallas auction."""
    match = approx_match_pallas(xyz1, xyz2)
    d2 = jnp.maximum(square_distance(xyz1, xyz2), 0.0)
    return jnp.sum(d2 * match, axis=(1, 2))


def _cost_fwd(xyz1, xyz2):
    match = approx_match_pallas(xyz1, xyz2)
    d2 = jnp.maximum(square_distance(xyz1, xyz2), 0.0)
    cost = jnp.sum(d2 * match, axis=(1, 2))
    return cost, (xyz1, xyz2, match)


def _cost_bwd(res, g):
    # matchcostgrad1/2 (emd_kernel.cu:287-358): match is constant;
    # d cost / d x1_n = 2 Σ_m match[n,m] (x1_n - x2_m)
    xyz1, xyz2, match = res
    row_mass = jnp.sum(match, axis=2)[..., None]  # [B, N, 1]
    col_mass = jnp.sum(match, axis=1)[..., None]  # [B, M, 1]
    g1 = 2.0 * (xyz1 * row_mass - jnp.einsum("bnm,bmc->bnc", match, xyz2))
    g2 = 2.0 * (xyz2 * col_mass - jnp.einsum("bnm,bnc->bmc", match, xyz1))
    s = g[:, None, None]
    return (s * g1).astype(xyz1.dtype), (s * g2).astype(xyz2.dtype)


emd_matchcost_pallas.defvjp(_cost_fwd, _cost_bwd)
