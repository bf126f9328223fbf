"""GPipe-style pipeline parallelism for the PointBERT ViT trunk.

The reference scales with DDP only (``utils/utils.py:104-143``); this
framework's mesh already adds tensor parallelism on top
(``parallel/sharding.py``). This module adds the third axis — pipeline
parallelism over the trunk depth — the TPU-native way: a ``pp`` mesh
axis, per-stage block slices held in each rank's HBM, and microbatches
streamed stage-to-stage with ``lax.ppermute`` over ICI inside one jitted
``shard_map``. No send/recv runtime, no schedule thread: the whole
GPipe schedule (fill, steady state, drain) is a single ``lax.scan``
that XLA overlaps with the per-stage compute.

Scope: the deterministic trunk forward (eval-mode BatchNorm in the
per-group encoder, drop-path off — the frozen-tower regime every PPT
head_type trains in). The pipeline is fully differentiable —
``ppermute``/``psum`` have transposes — so a train step that unfreezes
late-block leaves (head_type 1–3, ``ULIP_models.py:461-470``)
backpropagates through the stages; equivalence vs the single-device
trunk is asserted in ``tests/test_pipeline.py`` and exercised by
``__graft_entry__.dryrun_multichip``.

Layout notes (why this maps well to TPU):
  - Each stage's ``depth/pp`` blocks stay resident in that rank's HBM;
    a pp=4 slice quarters per-chip weight memory for the trunk.
  - The inter-stage payload is one microbatch of activations
    ([mb, 65, 384] ≈ 100 KB at PPT-Base) — a single ICI hop per stage
    per tick via ``ppermute``; the position embedding rides along
    because PointBERT re-adds it at EVERY block (point_encoder.py:98).
  - Bubbles compute on zeros and their outputs are masked out; with
    ``n_micro`` microbatches the bubble fraction is the usual
    (pp-1)/(n_micro+pp-1).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = [
    "stack_vit_blocks",
    "pipeline_blocks",
    "pipelined_trunk_features",
]


def stack_vit_blocks(trunk_params: dict, depth: int) -> Any:
    """Stack ``block_0..block_{depth-1}`` param subtrees along a new
    leading axis so the per-stage slice can be sharded over the ``pp``
    mesh axis (leaves: [depth, ...])."""
    blocks = [trunk_params[f"block_{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _apply_block(bp, x, pos, num_heads: int, dtype) -> jax.Array:
    """One ViT block, deterministic: delegates to the module so the
    pipelined math is the module's math (incl. the fused Pallas block
    on TPU), never a twin that can drift."""
    from ppt_tpu.nn.pointbert import VitBlock

    blk = VitBlock(num_heads, drop_path=0.0, dtype=dtype)
    return blk.apply({"params": bp}, x, deterministic=True, pos=pos)


def pipeline_blocks(
    local_blocks: Any,
    x_loc: jax.Array,
    pos_loc: jax.Array,
    *,
    n_micro: int,
    pp_size: int,
    num_heads: int,
    dtype,
    pp_axis: str = "pipe",
) -> jax.Array:
    """GPipe schedule body. Must run inside ``shard_map`` with
    ``pp_axis`` mapped; ``local_blocks`` leaves are this rank's
    [depth/pp, ...] slice, ``x_loc``/``pos_loc`` are the LOCAL batch
    shard [B_loc, T, C] (replicated over ``pp_axis``, already split
    over any dp axis by shard_map) — microbatching happens here, per
    dp shard, so dp and n_micro compose independently.

    Returns [B_loc, T, C], replicated over ``pp_axis`` (the last
    stage's results are broadcast with a masked ``psum``)."""
    B_loc = x_loc.shape[0]
    mb = B_loc // n_micro
    x_mb = x_loc.reshape(n_micro, mb, *x_loc.shape[1:])
    pos_mb = pos_loc.reshape(n_micro, mb, *pos_loc.shape[1:])
    idx = jax.lax.axis_index(pp_axis)
    perm = [(i, (i + 1) % pp_size) for i in range(pp_size)]

    def tick(carry, t):
        state, spos, out = carry
        # stage 0 ingests microbatch t during the fill/steady phase
        src = jnp.minimum(t, n_micro - 1)
        xin = jax.lax.dynamic_index_in_dim(x_mb, src, 0, keepdims=False)
        pin = jax.lax.dynamic_index_in_dim(pos_mb, src, 0, keepdims=False)
        take = (idx == 0) & (t < n_micro)
        state = jnp.where(take, xin, state)
        spos = jnp.where(take, pin, spos)

        def body(s, bp):
            return _apply_block(bp, s, spos, num_heads, dtype), None

        state, _ = jax.lax.scan(body, state, local_blocks)

        # the last stage emits microbatch t-(pp-1) during drain/steady
        done = t - (pp_size - 1)
        valid = (idx == pp_size - 1) & (done >= 0)
        di = jnp.maximum(done, 0)
        cur = jax.lax.dynamic_index_in_dim(out, di, 0, keepdims=False)
        out = jax.lax.dynamic_update_index_in_dim(
            out, jnp.where(valid, state, cur), di, 0
        )

        # rotate activations (and their riding pos) one stage forward
        state = jax.lax.ppermute(state, pp_axis, perm)
        spos = jax.lax.ppermute(spos, pp_axis, perm)
        return (state, spos, out), None

    carry = (
        jnp.zeros_like(x_mb[0]),
        jnp.zeros_like(pos_mb[0]),
        jnp.zeros_like(x_mb),
    )
    (_, _, out), _ = jax.lax.scan(
        tick, carry, jnp.arange(n_micro + pp_size - 1)
    )
    # broadcast the last stage's buffer to every pp rank
    out = jax.lax.psum(
        jnp.where(idx == pp_size - 1, out, jnp.zeros_like(out)), pp_axis
    )
    return out.reshape(B_loc, *x_loc.shape[1:])


def pipelined_trunk_features(
    variables: dict,
    pts: jax.Array,
    cfg,
    mesh,
    *,
    n_micro: Optional[int] = None,
    dtype=jnp.float32,
    dp_axis: Optional[str] = "data",
    pp_axis: str = "pipe",
) -> jax.Array:
    """Deterministic PointBERT trunk forward with the block stack
    pipelined over ``mesh``'s ``pp_axis`` — the pp twin of
    ``PointBert.apply(variables, pts, train=False)`` (same [B, 2C]
    feature; equality asserted in tests/test_pipeline.py).

    The pre-trunk embedding (grouping + MiniPointNet + reduce/pos
    Denses, point_encoder.py:90-110) and the final readout
    (fp32 LN + concat[cls, max-pool], :251) run as plain GSPMD ops —
    batch-sharded over ``dp_axis`` if the caller shards ``pts`` — and
    reuse the module's own submodules so there is no twin math.
    """
    from flax import linen as nn

    from ppt_tpu.nn.pointbert import MiniPointNet, group_points

    p = variables["params"]
    pp_size = mesh.shape[pp_axis]
    depth = cfg.depth
    if depth % pp_size:
        raise ValueError(f"depth {depth} not divisible by pp={pp_size}")
    if n_micro is None:
        n_micro = pp_size

    # --- embedding (module-reusing functional twin of PointBert's
    # preamble, nn/pointbert.py:396-421) ---
    neighborhood, center = group_points(pts, cfg.num_group, cfg.group_size)
    enc_vars = {"params": p["encoder"]}
    if "batch_stats" in variables:
        enc_vars["batch_stats"] = variables["batch_stats"]["encoder"]
    tokens = MiniPointNet(cfg.encoder_dims, dtype=dtype).apply(
        enc_vars, neighborhood, False
    )
    tokens = nn.Dense(cfg.trans_dim, dtype=dtype).apply(
        {"params": p["reduce_dim"]}, tokens
    )
    B = tokens.shape[0]
    pos = nn.Dense(128, dtype=dtype).apply({"params": p["pos_embed1"]}, center)
    pos = nn.gelu(pos)
    pos = nn.Dense(cfg.trans_dim, dtype=dtype).apply(
        {"params": p["pos_embed2"]}, pos
    )
    x = jnp.concatenate(
        [
            jnp.broadcast_to(
                p["cls_token"].astype(dtype), (B, 1, cfg.trans_dim)
            ),
            tokens,
        ],
        axis=1,
    )
    pos = jnp.concatenate(
        [
            jnp.broadcast_to(
                p["cls_pos"].astype(dtype), (B, 1, cfg.trans_dim)
            ),
            pos,
        ],
        axis=1,
    )

    # --- pipelined block stack ---
    dp_size = mesh.shape[dp_axis] if dp_axis else 1
    if B % (dp_size * n_micro):
        raise ValueError(
            f"batch {B} not divisible by n_micro={n_micro} per dp shard "
            f"(dp={dp_size})"
        )

    stacked = stack_vit_blocks(p, depth)
    body = functools.partial(
        pipeline_blocks,
        n_micro=n_micro,
        pp_size=pp_size,
        num_heads=cfg.num_heads,
        dtype=dtype,
        pp_axis=pp_axis,
    )
    batch_spec = P(dp_axis) if dp_axis else P()
    x = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(pp_axis), batch_spec, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )(stacked, x, pos)

    # --- readout (point_encoder.py:251) ---
    x = nn.LayerNorm(dtype=jnp.float32).apply({"params": p["norm"]}, x)
    return jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)
