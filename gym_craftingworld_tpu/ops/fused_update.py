"""Fused Pallas kernel for the fast-PPO minibatch gradient.

The PPO update is the fast trainer's dominant cost, and per-op profiling
(tools/fast_ppo_prof.py + xprof) shows why: under stock XLA every layer's
activations and cotangents — [131072, 512] tensors — round-trip HBM between
the forward, loss, and backward fusions, ~32 GB per update at ~80% bandwidth
utilization while the MXU idles at ~35%. The arithmetic intensity of a
hidden-512 MLP (~170 FLOP/byte at bf16) sits *below* the v5e ridge point, so
no amount of fusion-local tuning makes the layer-by-layer schedule
compute-bound.

This kernel breaks the traffic floor structurally: one `pallas_call` computes
the complete clipped-surrogate gradient — forward, PPO loss, backward, and
weight-gradient accumulation — tile by tile over the minibatch rows, with
every activation and cotangent resident in VMEM for its whole life. HBM
traffic per minibatch drops from ~2 GB to ~25 MB (the feature rows, the five
per-row vectors, and the parameter gradients), turning the update MXU-bound.

Numerics mirror `train/fast_ppo._loss_bm` + `jax.value_and_grad` exactly in
structure: bf16 matmul operands with f32 accumulation, bf16 pre-activation
residuals, bf16 hidden cotangents, f32 weight gradients and loss terms. The
only deviations are float-associativity (tile-local accumulation order) and
tie-breaking of `min`/`max` on measure-zero sets; gradient parity vs autodiff
is pinned by tests/test_fused_update.py (CPU, interpret mode) and
tests_tpu/test_fused_update_tpu.py (compiled Mosaic).

The reference has no trainer at all (SURVEY §2); this kernel serves the
throughput path that trains policies on the reference's environment.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_craftingworld_tpu.train.fast_ppo import FastPPOConfig, MLPParams

bf16 = jnp.bfloat16
f32 = jnp.float32

TILE = 2048  # default rows per grid step; peak VMEM ~24 MB at hidden=512
# (measured on v5e at H=512, N=131072: tile 1024 → 1.40 ms/call, 2048 →
# 1.35 ms/call = 89% of useful-FLOP bf16 peak, 4096 regresses)


def _mm(a, b, dims):
    """bf16 x bf16 -> f32 dot_general (MXU with f32 accumulation)."""
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=f32)


def _kernel(fppo: FastPPOConfig, n_total: int, n_actions: int,
            tile: int,
            feat_ref, action_ref, old_lp_ref, old_v_ref, advn_ref, ret_ref,
            valid_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, wlv_ref, blv_ref,
            gw1_ref, gb1_ref, gw2_ref, gb2_ref, gwlv_ref, gblv_ref,
            pg_row_ref, v_row_ref, ent_row_ref):
    """One [TILE, F] row-tile: fwd + loss + bwd + wgrad accumulation.

    The value head rides as row ``A`` of the logits head (``wlv`` =
    ``concat([wl, wv])``): Mosaic cannot lower a matmul with a
    size-1 output dimension, and fusing the heads saves a matmul anyway.
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw1_ref[:] = jnp.zeros_like(gw1_ref)
        gb1_ref[:] = jnp.zeros_like(gb1_ref)
        gw2_ref[:] = jnp.zeros_like(gw2_ref)
        gb2_ref[:] = jnp.zeros_like(gb2_ref)
        gwlv_ref[:] = jnp.zeros_like(gwlv_ref)
        gblv_ref[:] = jnp.zeros_like(gblv_ref)

    A = n_actions
    x = feat_ref[:]  # bf16[TILE, F] (or [1, TILE, F] from the indexed path)
    if x.ndim == 3:
        x = x.reshape(x.shape[-2], x.shape[-1])
    w1 = w1_ref[:]  # bf16[H, F]
    w2 = w2_ref[:]  # bf16[H, H]
    wlv = wlv_ref[:]  # bf16[A+1, H]

    # ---- forward (same rounding points as apply_policy_bm; relu runs in
    # f32 before the bf16 cast — identical since rounding commutes with
    # max(.,0) — because v5e Mosaic has no bf16 vector compare) ----
    z1 = _mm(x, w1, (((1,), (1,)))) + b1_ref[:][None, :]  # f32[TILE, H]
    h1 = jnp.maximum(z1, 0).astype(bf16)
    z2 = _mm(h1, w2, (((1,), (1,)))) + b2_ref[:][None, :]
    h2 = jnp.maximum(z2, 0).astype(bf16)
    # Heads come out TRANSPOSED — [A+1, TILE], actions on sublanes, rows on
    # lanes — straight from the MXU (contraction dims (1, 1); no relayout).
    # The whole loss section then runs on fully-packed VPU tiles: in the
    # batch-major [TILE, A+1] layout every elementwise op wasted 15/16 of
    # each (8, 128) vector tile (8 used lanes of 128), which made the loss
    # chain ~25% of the kernel's wall time.
    heads = _mm(wlv, h2, (((1,), (1,)))) + blv_ref[:][:, None]  # [A+1, TILE]
    # Mosaic cannot lane-slice at offset A ("Offset change"), so the loss
    # runs on the padded [A+1, TILE] array with row masks — the value
    # row is excluded from the softmax by a large-negative fill (finite,
    # so 0 * fill stays 0 rather than NaN).
    rows = jax.lax.broadcasted_iota(jnp.int32, heads.shape, 0)
    is_logit = rows < A
    logits = jnp.where(is_logit, heads, f32(-1e30))
    value = jnp.sum(jnp.where(rows == A, heads, 0.0), axis=0)

    action = action_ref[:]  # i32[TILE]
    old_lp = old_lp_ref[:]
    old_v = old_v_ref[:]
    advn = advn_ref[:]  # pre-normalized advantage
    ret = ret_ref[:]

    # ---- PPO clipped-surrogate loss (per-row terms) ----
    m = jnp.max(logits, axis=0, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=0, keepdims=True))
    logsm = logits - lse  # f32[A+1, TILE]; value row ~ -1e30
    p = jnp.exp(logsm)  # value row exactly 0
    onehot = rows == action[None, :]  # actions < A, so row A never selected
    log_prob = jnp.sum(jnp.where(onehot, logsm, 0.0), axis=0)
    ratio = jnp.exp(log_prob - old_lp)
    clipped = jnp.clip(ratio, 1 - fppo.clip_eps, 1 + fppo.clip_eps)
    un = ratio * advn
    cl = clipped * advn
    pg_i = -jnp.minimum(un, cl)
    e = value - ret
    vclip = old_v + jnp.clip(value - old_v, -fppo.clip_eps, fppo.clip_eps)
    ec = vclip - ret
    v_i = 0.5 * jnp.maximum(e * e, ec * ec)
    ent_i = -jnp.sum(jnp.where(is_logit, p * logsm, 0.0), axis=0)

    # ---- backward (mirrors autodiff of _loss_bm; 1/N from the means) ----
    inv_n = f32(1.0 / n_total)
    # policy-gradient: d pg_i / d log_prob = -advn * ratio on the unclipped
    # branch (jnp.minimum takes the first argument on ties)
    take_un = un <= cl
    dlogp = jnp.where(take_un, -advn * ratio, 0.0) * inv_n
    dent = -fppo.ent_coef * inv_n  # coefficient on d ent_i / d logits
    dlogits = jnp.where(
        is_logit,
        dlogp[None, :] * (onehot.astype(f32) - p)
        + dent * (-p * (logsm + ent_i[None, :])),
        0.0,
    )  # [A+1, TILE], value row zeroed
    # value loss: d v_i / d value (maximum takes first argument on ties)
    take_e = e * e >= ec * ec
    in_band = jnp.abs(value - old_v) < fppo.clip_eps
    dvalue = (
        fppo.vf_coef * inv_n
        * jnp.where(take_e, e, jnp.where(in_band, ec, 0.0))
    )

    # rows past the true minibatch length (tile padding) contribute nothing:
    # the validity mask zeroes their head cotangents (and with them every
    # weight gradient) and their per-row loss terms
    valid = valid_ref[:]  # f32[TILE], 1.0 real row / 0.0 pad
    dheads = jnp.where(rows == A, dvalue[None, :], dlogits) * valid[None, :]
    dheads_b = dheads.astype(bf16)  # [A+1, TILE]
    dh2 = _mm(dheads_b, wlv, (((0,), (0,)))).astype(bf16)  # [TILE, H]
    dz2 = jnp.where(z2 > 0, dh2, 0).astype(bf16)  # f32 compare (see above)
    dh1 = _mm(dz2, w2, (((1,), (0,)))).astype(bf16)
    dz1 = jnp.where(z1 > 0, dh1, 0).astype(bf16)

    # ---- accumulate parameter gradients (f32, contract over rows) ----
    gw1_ref[:] += _mm(dz1, x, (((0,), (0,))))  # [H, F]
    gb1_ref[:] += jnp.sum(dz1.astype(f32), axis=0)
    gw2_ref[:] += _mm(dz2, h1, (((0,), (0,))))  # [H, H]
    gb2_ref[:] += jnp.sum(dz2.astype(f32), axis=0)
    gwlv_ref[:] += _mm(dheads_b, h2, (((1,), (0,))))  # [A+1, H]
    gblv_ref[:] += jnp.sum(dheads, axis=1)
    # per-row loss terms (summed outside; scalar stores don't lower well)
    pg_row_ref[:] = pg_i * valid
    v_row_ref[:] = v_i * valid
    ent_row_ref[:] = ent_i * valid


@partial(jax.jit, static_argnums=(0, 3), static_argnames=("interpret", "tile"))
def fused_minibatch_grads(fppo: FastPPOConfig, params: MLPParams, batch,
                          interpret: bool = False, *, tile: int = TILE):
    """Gradient of `_loss_bm` over one minibatch, fused in one kernel pass.

    ``batch`` = (feat bf16[N, F], action i32[N], old_log_prob f32[N],
    old_value f32[N], adv f32[N] (unnormalized), ret f32[N]).
    Returns ``(grads: MLPParams, aux: dict)`` with the same loss terms
    train_step_fast reports.

    ``N`` need not be TILE-aligned: rows are zero-padded to the next tile and
    excluded from every gradient and loss term by an in-kernel validity mask,
    so arbitrary production minibatch shapes take the fused path (means stay
    over the true N).
    """
    feat, action, old_lp, old_v, adv, ret = batch
    N, F = feat.shape
    H = params.w1.shape[0]
    A = params.wl.shape[0]
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)

    Np = -(-N // tile) * tile  # pad rows to the tile size
    valid = (jnp.arange(Np) < N).astype(f32)
    if Np != N:
        pad = [(0, Np - N)]
        feat = jnp.pad(feat, pad + [(0, 0)])
        action = jnp.pad(action, pad)
        old_lp, old_v, adv_n, ret = (
            jnp.pad(x, pad) for x in (old_lp, old_v, adv_n, ret)
        )

    grid = (Np // tile,)
    row = lambda: pl.BlockSpec((tile,), lambda i: (i,))
    whole = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    out_shapes = [
        jax.ShapeDtypeStruct((H, F), f32),
        jax.ShapeDtypeStruct((H,), f32),
        jax.ShapeDtypeStruct((H, H), f32),
        jax.ShapeDtypeStruct((H,), f32),
        jax.ShapeDtypeStruct((A + 1, H), f32),
        jax.ShapeDtypeStruct((A + 1,), f32),
        jax.ShapeDtypeStruct((Np,), f32),
        jax.ShapeDtypeStruct((Np,), f32),
        jax.ShapeDtypeStruct((Np,), f32),
    ]
    out_specs = [
        whole(H, F), whole(H), whole(H, H), whole(H),
        whole(A + 1, H), whole(A + 1), row(), row(), row(),
    ]
    in_specs = [
        pl.BlockSpec((tile, F), lambda i: (i, 0)),
        row(), row(), row(), row(), row(), row(),
        whole(H, F), whole(H), whole(H, H), whole(H),
        whole(A + 1, H), whole(A + 1),
    ]
    wlv = jnp.concatenate(
        [params.wl.astype(bf16), params.wv.astype(bf16)], axis=0
    )
    blv = jnp.concatenate(
        [params.bl.astype(f32), params.bv.astype(f32)], axis=0
    )
    outs = pl.pallas_call(
        partial(_kernel, fppo, N, A, tile),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        feat.astype(bf16), action.astype(jnp.int32), old_lp, old_v,
        adv_n, ret, valid,
        params.w1.astype(bf16), params.b1.astype(f32),
        params.w2.astype(bf16), params.b2.astype(f32),
        wlv, blv,
    )
    gw1, gb1, gw2, gb2, gwlv, gblv, pg_row, v_row, ent_row = outs
    grads = MLPParams(w1=gw1, b1=gb1, w2=gw2, b2=gb2,
                      wl=gwlv[:A], bl=gblv[:A],
                      wv=gwlv[A:], bv=gblv[A:])
    pg = pg_row.sum() / N  # pad rows contribute exact zeros
    v_loss = v_row.sum() / N
    entropy = ent_row.sum() / N
    loss = pg + fppo.vf_coef * v_loss - fppo.ent_coef * entropy
    return grads, {"loss": loss, "pg_loss": pg, "v_loss": v_loss,
                   "entropy": entropy}


def _kernel_prefetched(fppo, n_total, n_actions, tile, ids_ref, *refs):
    """_kernel behind a PrefetchScalarGridSpec: drop the ids scalar ref
    (it is consumed by the feature BlockSpec's index map, not the body)."""
    return _kernel(fppo, n_total, n_actions, tile, *refs)


@partial(jax.jit, static_argnums=(0,), static_argnames=("interpret",))
def fused_minibatch_grads_indexed(fppo: FastPPOConfig, params: MLPParams,
                                  featb, ids, rest, interpret: bool = False):
    """`fused_minibatch_grads` over PERMUTED feature blocks, gather-free.

    The epoch shuffle used to materialize a gathered copy of the whole
    [N_rollout, F] feature slab per epoch plus a sliced+reshaped copy per
    minibatch (~2 ms/epoch of pure HBM copies at 16k envs). Here the kernel
    itself pulls each minibatch block straight from the un-shuffled slab:
    ``ids`` (this minibatch's permuted block indices) ride in as scalar
    prefetch, and the feature BlockSpec's index map reads ``ids[i]`` — the
    block DMA sequence IS the shuffle.

    featb: bf16[NB, BLK, F] block-major rollout features (one transpose per
    update, shared by every epoch); ids: int32[nbm]; rest: the five per-row
    vectors (action, old_log_prob, old_value, adv unnormalized, ret) already
    gathered into minibatch order, each [nbm * BLK] (they are ~1% of the
    bytes — gathering them in XLA is cheap and keeps adv normalization
    outside the kernel, identical to `fused_minibatch_grads`).

    Returns exactly what ``fused_minibatch_grads(fppo, params,
    (featb[ids].reshape(-1, F),) + rest)`` returns (same math; same tile
    accumulation order when BLK == tile).
    """
    action, old_lp, old_v, adv, ret = rest
    NB, BLK, F = featb.shape
    nbm = ids.shape[0]
    N = nbm * BLK
    H = params.w1.shape[0]
    A = params.wl.shape[0]
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    valid = jnp.ones((N,), f32)  # blocks are whole by construction

    grid = (nbm,)
    row = lambda: pl.BlockSpec((BLK,), lambda i, ids_ref: (i,))
    whole = lambda *shape: pl.BlockSpec(
        shape, lambda i, ids_ref: (0,) * len(shape))
    feat_spec = pl.BlockSpec((1, BLK, F), lambda i, ids_ref: (ids_ref[i], 0, 0))

    out_shapes = [
        jax.ShapeDtypeStruct((H, F), f32),
        jax.ShapeDtypeStruct((H,), f32),
        jax.ShapeDtypeStruct((H, H), f32),
        jax.ShapeDtypeStruct((H,), f32),
        jax.ShapeDtypeStruct((A + 1, H), f32),
        jax.ShapeDtypeStruct((A + 1,), f32),
        jax.ShapeDtypeStruct((N,), f32),
        jax.ShapeDtypeStruct((N,), f32),
        jax.ShapeDtypeStruct((N,), f32),
    ]
    out_specs = [
        whole(H, F), whole(H), whole(H, H), whole(H),
        whole(A + 1, H), whole(A + 1), row(), row(), row(),
    ]
    in_specs = [
        feat_spec,
        row(), row(), row(), row(), row(), row(),
        whole(H, F), whole(H), whole(H, H), whole(H),
        whole(A + 1, H), whole(A + 1),
    ]
    wlv = jnp.concatenate(
        [params.wl.astype(bf16), params.wv.astype(bf16)], axis=0
    )
    blv = jnp.concatenate(
        [params.bl.astype(f32), params.bv.astype(f32)], axis=0
    )
    outs = pl.pallas_call(
        partial(_kernel_prefetched, fppo, N, A, BLK),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(
        ids.astype(jnp.int32),
        featb.astype(bf16), action.astype(jnp.int32), old_lp, old_v,
        adv_n, ret, valid,
        params.w1.astype(bf16), params.b1.astype(f32),
        params.w2.astype(bf16), params.b2.astype(f32),
        wlv, blv,
    )
    gw1, gb1, gw2, gb2, gwlv, gblv, pg_row, v_row, ent_row = outs
    grads = MLPParams(w1=gw1, b1=gb1, w2=gw2, b2=gb2,
                      wl=gwlv[:A], bl=gblv[:A],
                      wv=gwlv[A:], bv=gblv[A:])
    pg = pg_row.sum() / N
    v_loss = v_row.sum() / N
    entropy = ent_row.sum() / N
    loss = pg + fppo.vf_coef * v_loss - fppo.ent_coef * entropy
    return grads, {"loss": loss, "pg_loss": pg, "v_loss": v_loss,
                   "entropy": entropy}
