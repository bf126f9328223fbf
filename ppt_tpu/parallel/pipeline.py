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
    "pipelined_partseg_features",
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
    tap_layers: Optional[tuple] = None,
):
    """GPipe schedule body. Must run inside ``shard_map`` with
    ``pp_axis`` mapped; ``local_blocks`` leaves are this rank's
    [depth/pp, ...] slice, ``x_loc``/``pos_loc`` are the LOCAL batch
    shard [B_loc, T, C] (replicated over ``pp_axis``, already split
    over any dp axis by shard_map) — microbatching happens here, per
    dp shard, so dp and n_micro compose independently.

    ``tap_layers`` (static GLOBAL block indices, e.g. the partseg
    trunk's {3, 7, 11} taps, point_encoder.py:300-320): also capture
    the post-block activations of those layers. Each tap's owner stage
    and local position are static, so capture costs one masked write
    per tap per tick; the buffers are psum-broadcast at the end like
    the main output.

    Returns [B_loc, T, C] (replicated over ``pp_axis`` — the last
    stage's results are broadcast with a masked ``psum``); with
    ``tap_layers``, returns ``(out, taps)`` where ``taps`` is a tuple
    of [B_loc, T, C] in ``tap_layers`` order."""
    B_loc = x_loc.shape[0]
    mb = B_loc // n_micro
    x_mb = x_loc.reshape(n_micro, mb, *x_loc.shape[1:])
    pos_mb = pos_loc.reshape(n_micro, mb, *pos_loc.shape[1:])
    idx = jax.lax.axis_index(pp_axis)
    perm = [(i, (i + 1) % pp_size) for i in range(pp_size)]
    taps = tuple(tap_layers or ())
    L_loc = jax.tree_util.tree_leaves(local_blocks)[0].shape[0]

    def tick(carry, t):
        state, spos, out, tap_bufs = carry
        # stage 0 ingests microbatch t during the fill/steady phase
        src = jnp.minimum(t, n_micro - 1)
        xin = jax.lax.dynamic_index_in_dim(x_mb, src, 0, keepdims=False)
        pin = jax.lax.dynamic_index_in_dim(pos_mb, src, 0, keepdims=False)
        take = (idx == 0) & (t < n_micro)
        state = jnp.where(take, xin, state)
        spos = jnp.where(take, pin, spos)

        def body(s, bp):
            s2 = _apply_block(bp, s, spos, num_heads, dtype)
            return s2, s2

        state, ys = jax.lax.scan(body, state, local_blocks)

        # the microbatch on stage `idx` at tick t is m = t - idx
        m = t - idx
        mi = jnp.clip(m, 0, n_micro - 1)
        new_bufs = []
        for g, buf in zip(taps, tap_bufs):
            owner, j = divmod(g, L_loc)  # static owner stage + local pos
            ok = (idx == owner) & (m >= 0) & (m < n_micro)
            cur = jax.lax.dynamic_index_in_dim(buf, mi, 0, keepdims=False)
            new_bufs.append(
                jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(ok, ys[j], cur), mi, 0
                )
            )

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
        return (state, spos, out, tuple(new_bufs)), None

    carry = (
        jnp.zeros_like(x_mb[0]),
        jnp.zeros_like(pos_mb[0]),
        jnp.zeros_like(x_mb),
        tuple(jnp.zeros_like(x_mb) for _ in taps),
    )
    (_, _, out, tap_bufs), _ = jax.lax.scan(
        tick, carry, jnp.arange(n_micro + pp_size - 1)
    )
    # broadcast the last stage's buffer to every pp rank
    out = jax.lax.psum(
        jnp.where(idx == pp_size - 1, out, jnp.zeros_like(out)), pp_axis
    )
    out = out.reshape(B_loc, *x_loc.shape[1:])
    if not taps:
        return out
    tap_out = tuple(
        jax.lax.psum(
            jnp.where(idx == g // L_loc, buf, jnp.zeros_like(buf)), pp_axis
        ).reshape(B_loc, *x_loc.shape[1:])
        for g, buf in zip(taps, tap_bufs)
    )
    return out, tap_out


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

    p = variables["params"]
    x, pos, _ = _embed_tokens(variables, pts, cfg, dtype)
    x = _run_pipelined(
        p, x, pos, cfg, mesh,
        n_micro=n_micro, dtype=dtype, dp_axis=dp_axis, pp_axis=pp_axis,
    )

    # --- readout (point_encoder.py:251) ---
    x = nn.LayerNorm(dtype=jnp.float32).apply({"params": p["norm"]}, x)
    return jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)


def _embed_tokens(variables, pts, cfg, dtype):
    """Module-reusing functional twin of the trunk preamble shared by
    PointBert and PointBertPartSeg (nn/pointbert.py:396-421 / :603-625):
    grouping + MiniPointNet + reduce/pos Denses + cls concat. Applies
    the SAME submodules with their own param subtrees — no twin math."""
    from flax import linen as nn

    from ppt_tpu.nn.pointbert import MiniPointNet, group_points

    p = variables["params"]
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
    return x, pos, center


def _run_pipelined(
    p, x, pos, cfg, mesh, *, n_micro, dtype, dp_axis, pp_axis,
    tap_layers=None,
):
    """Validate, stack the blocks, and run the shard_mapped schedule."""
    if pp_axis not in mesh.shape:
        raise ValueError(
            f"mesh has no '{pp_axis}' axis (axes: {tuple(mesh.shape)})"
        )
    if dp_axis and dp_axis not in mesh.shape:
        raise ValueError(
            f"mesh has no '{dp_axis}' axis (axes: {tuple(mesh.shape)}); "
            "pass dp_axis=None for a pp-only mesh"
        )
    pp_size = mesh.shape[pp_axis]
    if cfg.depth % pp_size:
        raise ValueError(f"depth {cfg.depth} not divisible by pp={pp_size}")
    if n_micro is None:
        n_micro = pp_size
    B = x.shape[0]
    dp_size = mesh.shape[dp_axis] if dp_axis else 1
    if B % (dp_size * n_micro):
        raise ValueError(
            f"batch {B} not divisible by n_micro={n_micro} per dp shard "
            f"(dp={dp_size})"
        )

    stacked = stack_vit_blocks(p, cfg.depth)
    body = functools.partial(
        pipeline_blocks,
        n_micro=n_micro,
        pp_size=pp_size,
        num_heads=cfg.num_heads,
        dtype=dtype,
        pp_axis=pp_axis,
        tap_layers=tap_layers,
    )
    batch_spec = P(dp_axis) if dp_axis else P()
    out_specs = (
        (batch_spec, tuple(batch_spec for _ in tap_layers))
        if tap_layers
        else batch_spec
    )
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(pp_axis), batch_spec, batch_spec),
        out_specs=out_specs,
        check_vma=False,
    )(stacked, x, pos)


def pipelined_partseg_features(
    variables: dict,
    pts: jax.Array,
    cls_onehot: jax.Array,
    cfg,
    mesh,
    *,
    num_categories: int = 16,
    n_micro: Optional[int] = None,
    dtype=jnp.float32,
    dp_axis: Optional[str] = "data",
    pp_axis: str = "pipe",
) -> jax.Array:
    """Deterministic partseg trunk forward with the ViT stack pipelined
    — the pp twin of ``PointBertPartSeg.apply(variables, pts,
    cls_onehot, train=False)`` ([B, N, 128] per-point features;
    equality asserted in tests/test_pipeline.py).

    The trunk taps blocks {3, 7, 11} (point_encoder.py:300-320) —
    captured in-pipeline by their owning stages and psum-broadcast —
    then the hierarchical propagation head (FP x3 + DGCNN x2 + conv/BN,
    :320-420) runs as plain GSPMD ops reusing the module's own
    submodules."""
    from flax import linen as nn

    from ppt_tpu import ops
    from ppt_tpu.nn.pointbert import DgcnnPropagation, FeaturePropagation

    p = variables["params"]
    bs = variables.get("batch_stats", {})

    def sub(name):
        v = {"params": p[name]}
        if bs and name in bs:
            v["batch_stats"] = bs[name]
        return v

    B, N, _ = pts.shape
    x, pos, center = _embed_tokens(variables, pts, cfg, dtype)
    _, taps = _run_pipelined(
        p, x, pos, cfg, mesh,
        n_micro=n_micro, dtype=dtype, dp_axis=dp_axis, pp_axis=pp_axis,
        tap_layers=(3, 7, 11),
    )
    norm = lambda t: nn.LayerNorm(dtype=jnp.float32).apply(
        {"params": p["norm"]}, t
    )
    feats = [norm(t)[:, 1:] for t in taps]  # drop cls token: [B, G, D]

    # hierarchical coordinates + head (twin of nn/pointbert.py:641-675)
    idx_512 = ops.farthest_point_sample(pts, 512)
    xyz_512 = ops.index_points(pts, idx_512)
    idx_256 = ops.farthest_point_sample(pts, 256)
    xyz_256 = ops.index_points(pts, idx_256)

    onehot = jnp.broadcast_to(
        cls_onehot[:, None, :].astype(dtype), (B, N, num_categories)
    )
    f_level_0 = jnp.concatenate([onehot, pts.astype(dtype)], axis=-1)

    fp = FeaturePropagation((cfg.trans_dim * 4, cfg.trans_dim), dtype=dtype)
    f_256 = fp.apply(sub("propagation_2"), xyz_256, center, xyz_256, feats[1])
    f_512 = fp.apply(sub("propagation_1"), xyz_512, center, xyz_512, feats[0])
    dg = DgcnnPropagation(k=4, out_dim=cfg.trans_dim, dtype=dtype)
    f_256 = dg.apply(sub("dgcnn_pro_2"), center, feats[2], xyz_256, f_256)
    f_512 = dg.apply(sub("dgcnn_pro_1"), xyz_256, f_256, xyz_512, f_512)
    f_all = fp.apply(sub("propagation_0"), pts, xyz_512, f_level_0, f_512)

    h = nn.Dense(128, dtype=dtype).apply({"params": p["conv1"]}, f_all)
    h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32).apply(
        sub("bn1"), h
    )
    return nn.relu(h)  # dropout is identity in eval mode
