"""Quantify the fused-ViT-block residual: 8.0 ms measured vs ~3.5 ms MXU
floor (VERDICT r3 weak #2 / next #1b).

Runs the production kernel plus ablated variants at the exact flagship
shape (B32, L513, C384, 6 heads, 12 blocks) and prints net ms/step for
each, so every remaining millisecond is attributed to a component:

  full        — the production kernel (baseline)
  mm_only     — matmuls + residuals only (no LN, no softmax, no gelu):
                the achievable MXU envelope incl. the hd=64 half-rate
                QK/PV penalty and grid overhead
  no_softmax  — full minus the softmax chain (max/exp/sum/divide):
                difference to `full` = softmax VPU cost
  no_gelu     — full with gelu replaced by identity: gelu VPU cost
  pv_ones     — softmax denominator folded into the PV matmul (V
                augmented with a ones lane): candidate optimization
  rows2       — 2 clouds per grid instance (16 instances of 2x work):
                bounds the per-instance overhead
  qk_packed2  — two hd=64 heads per 128-lane contraction (VERDICT r4
                next #6): block-diagonal K/V pack the QK contraction to
                depth 128 and the PV output to 128 lanes — attacks the
                +0.8 ms "half-MXU" penalty priced into the 5.2 ms
                envelope. Exact math (the off-diagonal blocks are
                zeros); costs 2x the FLOPs, so it wins only if hd=64
                runs the MXU at materially WORSE than 50%

Timing: K-iteration lax.scan chain with scalar value fetch (CLAUDE.md
timing-truth), net of measured dispatch overhead. One TPU process at a
time — do not run concurrently with bench.
"""

from __future__ import annotations

import argparse
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppt_tpu.kernels.vitblock import _block_pallas, _gelu_tanh, _ln_f32

B, L, C, HEADS, DEPTH = 32, 513, 384, 6, 12
D = C // HEADS
HID = 4 * C


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _variant_kernel(
    mode: str, l_valid: int, heads: int, d: int, dtype,
    x_ref, pos_ref, dp_ref,
    ln1s_ref, ln1b_ref, wqkv_ref,
    wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref,
    wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    o_ref,
):
    """The production kernel with one component ablated/substituted.
    ``rows`` clouds per instance: refs are [R, Lp, C]."""
    rows = x_ref.shape[0]
    c = heads * d
    scale = 1.0 / math.sqrt(d)
    b = pl.program_id(0)

    for r in range(rows):
        x0 = x_ref[r] + pos_ref[r]
        if mode == "mm_only":
            xn = x0
        else:
            xn = _ln_f32(
                x0.astype(jnp.float32), ln1s_ref[0], ln1b_ref[0]
            ).astype(dtype)
        qkv = lax.dot_general(
            xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        outs = []
        if mode == "qk_packed2":
            lp = qkv.shape[0]
            z = jnp.zeros((lp, d), dtype)
            lane2 = lax.broadcasted_iota(jnp.int32, (lp, 2 * lp), 1)
            lane_mod = jnp.where(lane2 < lp, lane2, lane2 - lp)
            valid2 = lane_mod < l_valid
            row1 = lax.broadcasted_iota(jnp.int32, (lp, d), 0)
            for hp in range(heads // 2):
                h1, h2 = 2 * hp, 2 * hp + 1
                q12 = qkv[:, h1 * d : (h2 + 1) * d]  # [Lp, 2d] contiguous
                k1 = qkv[:, c + h1 * d : c + (h1 + 1) * d]
                k2 = qkv[:, c + h2 * d : c + (h2 + 1) * d]
                v1 = qkv[:, 2 * c + h1 * d : 2 * c + (h1 + 1) * d]
                v2 = qkv[:, 2 * c + h2 * d : 2 * c + (h2 + 1) * d]
                v1 = jnp.where(row1 < l_valid, v1, 0)
                v2 = jnp.where(row1 < l_valid, v2, 0)
                # block-diagonal pack: [2Lp, 2d]; contraction depth 2d=128
                k_bd = jnp.concatenate(
                    [jnp.concatenate([k1, z], 1),
                     jnp.concatenate([z, k2], 1)], axis=0
                )
                s2 = lax.dot_general(
                    q12, k_bd, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # [Lp, 2Lp] = [s_h1 | s_h2]
                s2 = jnp.where(valid2, s2, -jnp.inf)
                sA, sB = s2[:, :lp], s2[:, lp:]
                pA = jnp.exp(sA - jnp.max(sA, axis=1, keepdims=True))
                pB = jnp.exp(sB - jnp.max(sB, axis=1, keepdims=True))
                dA = jnp.sum(pA, axis=1, keepdims=True)
                dB = jnp.sum(pB, axis=1, keepdims=True)
                p2 = jnp.concatenate([pA, pB], axis=1).astype(dtype)
                v_bd = jnp.concatenate(
                    [jnp.concatenate([v1, z], 1),
                     jnp.concatenate([z, v2], 1)], axis=0
                )  # [2Lp, 2d]; PV output fills 128 lanes
                acc2 = lax.dot_general(
                    p2, v_bd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [Lp, 2d] = [o_h1 | o_h2]
                outs.append((acc2[:, :d] / dA).astype(dtype))
                outs.append((acc2[:, d:] / dB).astype(dtype))
        for h in range(heads if mode != "qk_packed2" else 0):
            q = qkv[:, h * d : (h + 1) * d]
            k = qkv[:, c + h * d : c + (h + 1) * d]
            v = qkv[:, 2 * c + h * d : 2 * c + (h + 1) * d]
            row = lax.broadcasted_iota(jnp.int32, v.shape, 0)
            v = jnp.where(row < l_valid, v, 0)
            s = lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            lane = lax.broadcasted_iota(jnp.int32, s.shape, 1)
            if mode in ("mm_only", "no_softmax"):
                # bound the softmax cost: use the raw (masked-to-0)
                # scores as "probabilities" — same matmul shapes, no
                # max/exp/sum/divide chain. NOT numerically meaningful.
                p = jnp.where(lane < l_valid, s, 0.0)
                acc = lax.dot_general(
                    p.astype(dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append(acc.astype(dtype))
            elif mode == "pv_ones":
                s = jnp.where(lane < l_valid, s, -jnp.inf)
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m).astype(dtype)
                # denominator via the MXU: append a ones lane to V —
                # acc_ext[:, :d] = P V, acc_ext[:, d] = sum(P).
                # (mask the whole extended tile: a [Lp, 1] bool vector
                # hits a Mosaic relayout bug — full-width masks don't)
                v_ext = jnp.concatenate(
                    [v, jnp.ones((v.shape[0], 1), dtype)], axis=1
                )  # [Lp, d+1]
                row_e = lax.broadcasted_iota(jnp.int32, v_ext.shape, 0)
                v_ext = jnp.where(row_e < l_valid, v_ext, 0)
                acc = lax.dot_general(
                    p, v_ext, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append(
                    (acc[:, :d] / acc[:, d:]).astype(dtype)
                )
            else:  # full / no_gelu / rows variants
                s = jnp.where(lane < l_valid, s, -jnp.inf)
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                denom = jnp.sum(p, axis=1, keepdims=True)
                acc = lax.dot_general(
                    p.astype(dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append((acc / denom).astype(dtype))
        attn = jnp.concatenate(outs, axis=1)
        y = lax.dot_general(
            attn, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + bproj_ref[0].astype(dtype)
        x1 = x0 + y * dp_ref[b * rows + r, 0].astype(dtype)

        if mode == "mm_only":
            xn2 = x1
        else:
            xn2 = _ln_f32(
                x1.astype(jnp.float32), ln2s_ref[0], ln2b_ref[0]
            ).astype(dtype)
        h1 = lax.dot_general(
            xn2, wfc1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc1_ref[0]
        if mode in ("mm_only", "no_gelu"):
            h1 = h1.astype(dtype)
        else:
            h1 = _gelu_tanh(h1).astype(dtype)
        y2 = lax.dot_general(
            h1, wfc2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + bfc2_ref[0].astype(dtype)
        o_ref[r] = x1 + y2 * dp_ref[b * rows + r, 1].astype(dtype)


@functools.partial(jax.jit, static_argnames=("mode", "rows", "interpret"))
def _variant_pallas(
    x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
    wfc1, bfc1, wfc2, bfc2, *, mode: str, rows: int = 1,
    interpret: bool = False,
):
    Bx, Lx, Cx = x.shape
    d = Cx // HEADS
    Lp = _round_up(Lx, 16)
    hid = wfc1.shape[1]

    def rowspec(n_lanes):
        return pl.BlockSpec(
            (rows, Lp, n_lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )

    def wspec(r, c_):
        return pl.BlockSpec((r, c_), lambda b: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_variant_kernel, mode, Lx, HEADS, d, x.dtype),
        grid=(Bx // rows,),
        in_specs=[
            rowspec(Cx), rowspec(Cx),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            wspec(1, Cx), wspec(1, Cx),
            wspec(Cx, 3 * Cx),
            wspec(Cx, Cx), wspec(1, Cx),
            wspec(1, Cx), wspec(1, Cx),
            wspec(Cx, hid), wspec(1, hid),
            wspec(hid, Cx), wspec(1, Cx),
        ],
        out_specs=rowspec(Cx),
        out_shape=jax.ShapeDtypeStruct((Bx, Lx, Cx), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, pos, dp,
        ln1s[None], ln1b[None], wqkv, wproj, bproj[None],
        ln2s[None], ln2b[None], wfc1, bfc1[None], wfc2, bfc2[None],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--modes", default="full,mm_only,no_softmax,no_gelu,pv_ones,rows2"
    )
    flags = ap.parse_args()

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    def mk(*shape, scale=0.02):
        return jnp.asarray(
            (rng.randn(*shape) * scale).astype(np.float32)
        ).astype(dt)

    x = mk(B, L, C, scale=1.0)
    pos = mk(B, L, C, scale=1.0)
    dp = jnp.ones((B, 2), jnp.float32)
    weights = [
        (
            jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),  # ln1
            mk(C, 3 * C), mk(C, C),
            jnp.zeros((C,), jnp.float32),
            jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),  # ln2
            mk(C, HID), jnp.zeros((HID,), jnp.float32),
            mk(HID, C), jnp.zeros((C,), jnp.float32),
        )
        for _ in range(DEPTH)
    ]
    # stack so the scan threads one blocks' weights per iteration
    stacked = [jnp.stack(w) for w in zip(*weights)]

    def run_mode(mode: str):
        rows = 2 if mode == "rows2" else 1
        kmode = "full" if mode == "rows2" else mode

        def depth_body(xc, w):
            if kmode == "prod":
                out = _block_pallas(xc, pos, dp, *w, heads=HEADS)
            else:
                out = _variant_pallas(
                    xc, pos, dp, *w, mode=kmode, rows=rows
                )
            return out, None

        def chain(xc):
            def it(c, _):
                y, _ = lax.scan(depth_body, c, stacked)
                # renormalize so the chain doesn't overflow bf16
                y = (y / jnp.maximum(
                    jnp.max(jnp.abs(y.astype(jnp.float32))), 1.0
                )).astype(dt)
                return y, None
            y, _ = lax.scan(it, xc, None, length=flags.iters)
            return jnp.sum(y.astype(jnp.float32))

        f = jax.jit(chain)
        float(f(x))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3  # total ms, overhead subtracted by caller

    # dispatch+fetch overhead: an empty chain of the same structure
    def nil(xc):
        def it(c, _):
            return c, None
        y, _ = lax.scan(it, xc, None, length=flags.iters)
        return jnp.sum(y.astype(jnp.float32))

    fnil = jax.jit(nil)
    float(fnil(x))
    nil_ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fnil(x))
        nil_ms = min(nil_ms, (time.perf_counter() - t0) * 1e3)

    print(f"# B{B} L{L} C{C} h{HEADS} depth{DEPTH}, bf16, "
          f"iters={flags.iters}, dispatch+fetch overhead {nil_ms:.2f} ms "
          f"(subtracted)", flush=True)
    results = {}
    base = None
    for mode in flags.modes.split(","):
        try:
            ms = (run_mode(mode) - nil_ms) / flags.iters
        except Exception as e:
            print(f"{mode:>11}: FAILED — {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        results[mode] = ms
        if mode == "full":
            base = ms
        delta = f"  ({ms - base:+.2f} vs full)" if base and mode != "full" else ""
        print(f"{mode:>11}: {ms:7.3f} ms / 12-block step{delta}", flush=True)
    return results


if __name__ == "__main__":
    main()
