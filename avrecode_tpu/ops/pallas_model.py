"""Pallas TPU kernel for the EMA-profile model pass.

Keeps the whole estimator state in VMEM and walks the pair stream with an
in-kernel sequential loop applying exact per-bin staged-EMA updates (model
profile 1 is division-free by design — shift/add only), avoiding the argsort
the batched formulation pays per batch.

Mosaic supports neither scalar loads nor scalar stores on VMEM, so all
per-element access is 128-lane vector work:
  - the (bitkind, key, prior) streams and the probs output are laid out
    [groups, 128]; the current element is extracted/updated with a lane mask;
  - estimator tables are planes [rows, 128]; a key (row, lane) update is a
    one-hot row read-modify-write.
The grid iterates stream blocks sequentially on one core, so the VMEM scratch
tables persist across steps.

Semantics = C++ PriorModel profile 1 exactly; differential tests in
tests/test_device_model.py (interpreter on CPU, compiled on TPU when free).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PROB_BITS = 15
PROB_SCALE = 1 << PROB_BITS
LANES = 128
GROUPS_PER_STEP = 256  # 128-lane groups per grid step (32k elements)


def _ema_kernel(bk_ref, ky_ref, pr_ref, dfp_in, dsp_in, dvis_in, sema_in, svis_in,
                probs_ref, dfp, dsp, dvis, sema, svis):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dfp[:, :] = dfp_in[:, :]
        dsp[:, :] = dsp_in[:, :]
        dvis[:, :] = dvis_in[:, :]
        sema[:, :] = sema_in[:, :]
        svis[:, :] = svis_in[:, :]

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def pick(row, mask):
        return jnp.sum(jnp.where(mask, row, 0))

    def elem(g, i, probs_vec):
        emask = lane_iota == i
        bk = pick(bk_ref[pl.ds(g, 1), :], emask)
        key = pick(ky_ref[pl.ds(g, 1), :], emask)
        prior = pick(pr_ref[pl.ds(g, 1), :], emask)
        bit = bk & 1
        kind = bk >> 1
        is_sig = kind == 2
        is_ext = kind == 3  # prior passthrough (CABAC-parity EOB): no tables
        valid = bk != 255
        trow = key // LANES
        lane = key % LANES
        onehot = lane_iota == lane

        def blend(row, value, enable):
            return jnp.where(jnp.logical_and(onehot, enable), value, row)

        # ---- dual branch ----
        dual_en = jnp.logical_and(valid,
                                  jnp.logical_not(jnp.logical_or(is_sig, is_ext)))
        row_fp = dfp[pl.ds(trow, 1), :]
        row_sp = dsp[pl.ds(trow, 1), :]
        row_dv = dvis[pl.ds(trow, 1), :]
        fp = pick(row_fp, onehot)
        sp = pick(row_sp, onehot)
        dvisits = pick(row_dv, onehot)
        p_slow = jnp.clip(sp, 1, PROB_SCALE - 1)
        p_mix = jnp.clip(jnp.where(prior > 0, (fp + sp + 2 * prior) >> 2,
                                   (fp + sp) >> 1), 1, PROB_SCALE - 1)
        p_dual = jnp.where(kind == 1, p_slow, p_mix)
        gf = jnp.where(dvisits < 8, 2, jnp.where(dvisits < 32, 3, 5))
        gs = jnp.where(dvisits < 32, 4, jnp.where(dvisits < 128, 6, 8))
        fp2 = jnp.where(bit == 1, fp + ((PROB_SCALE - fp) >> gf), fp - (fp >> gf))
        sp2 = jnp.where(bit == 1, sp + ((PROB_SCALE - sp) >> gs), sp - (sp >> gs))
        dfp[pl.ds(trow, 1), :] = blend(row_fp, jnp.clip(fp2, 1, PROB_SCALE - 1), dual_en)
        dsp[pl.ds(trow, 1), :] = blend(row_sp, jnp.clip(sp2, 1, PROB_SCALE - 1), dual_en)
        dvis[pl.ds(trow, 1), :] = blend(row_dv, jnp.minimum(dvisits + 1, 255), dual_en)

        # ---- sig branch ----
        sig_en = jnp.logical_and(valid, is_sig)
        row_se = sema[pl.ds(trow, 1), :]
        row_sv = svis[pl.ds(trow, 1), :]
        ema0 = pick(row_se, onehot)
        svisits = pick(row_sv, onehot)
        ema = jnp.where(svisits == 0, PROB_SCALE // 2, ema0)
        w = jnp.minimum(svisits, 8)
        p_sig = jnp.clip(prior + (((ema - prior) * w) >> 3), 1, PROB_SCALE - 1)
        g2 = jnp.where(svisits < 4, 2, jnp.where(svisits < 16, 4, 6))
        ema2 = jnp.where(bit == 1, ema + ((PROB_SCALE - ema) >> g2), ema - (ema >> g2))
        sema[pl.ds(trow, 1), :] = blend(row_se, jnp.clip(ema2, 1, PROB_SCALE - 1), sig_en)
        svis[pl.ds(trow, 1), :] = blend(row_sv, jnp.minimum(svisits + 1, 255), sig_en)

        p = jnp.where(is_sig, p_sig, p_dual)
        p = jnp.where(is_ext, jnp.clip(prior, 1, PROB_SCALE - 1), p)
        p = jnp.where(valid, p, PROB_SCALE // 2)
        return jnp.where(emask, p, probs_vec)

    def group_body(g, _):
        vec = jax.lax.fori_loop(0, LANES, lambda i, v: elem(g, i, v),
                                jnp.zeros((1, LANES), jnp.int32))
        probs_ref[pl.ds(g, 1), :] = vec
        return 0

    jax.lax.fori_loop(0, GROUPS_PER_STEP, group_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ema_model_pass(bitkind, keys, priors, dual0, sig0, interpret: bool = False):
    """bitkind int32[n] = bit | kind<<1 (255 = padding); keys int32[n] with
    sig keys already offset past the padded dual space; dual0 int32[nd, 3];
    sig0 int32[ns, 2]; n % (GROUPS_PER_STEP*128) == 0. Returns probs int32[n]."""
    n = bitkind.shape[0]
    step_elems = GROUPS_PER_STEP * LANES
    assert n % step_elems == 0
    n_steps = n // step_elems
    n_groups = n // LANES
    n_dual = dual0.shape[0]
    n_sig = sig0.shape[0]
    assert n_dual % LANES == 0 and n_sig % LANES == 0
    bk = bitkind.astype(jnp.int32).reshape(n_groups, LANES)
    ky = keys.astype(jnp.int32).reshape(n_groups, LANES)
    pr = priors.astype(jnp.int32).reshape(n_groups, LANES)

    total_rows = (n_dual + n_sig) // LANES
    dual_rows = n_dual // LANES
    zeros = jnp.zeros((total_rows, LANES), jnp.int32)
    dfp0 = zeros.at[:dual_rows].set(dual0[:, 0].reshape(-1, LANES))
    dsp0 = zeros.at[:dual_rows].set(dual0[:, 1].reshape(-1, LANES))
    dvis0 = zeros.at[:dual_rows].set(dual0[:, 2].reshape(-1, LANES))
    sema0 = zeros.at[dual_rows:].set(sig0[:, 0].reshape(-1, LANES))
    svis0 = zeros.at[dual_rows:].set(sig0[:, 1].reshape(-1, LANES))

    table_spec = pl.BlockSpec((total_rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stream_spec = pl.BlockSpec((GROUPS_PER_STEP, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[stream_spec, stream_spec, stream_spec,
                  table_spec, table_spec, table_spec, table_spec, table_spec],
        out_specs=stream_spec,
        scratch_shapes=[pltpu.VMEM((total_rows, LANES), jnp.int32) for _ in range(5)],
    )

    probs = pl.pallas_call(
        _ema_kernel,
        out_shape=jax.ShapeDtypeStruct((n_groups, LANES), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bk, ky, pr, dfp0, dsp0, dvis0, sema0, svis0)
    return probs.reshape(-1)


def run_chunk_ema(bit, kind, key, prior, dual0_ema, n_sig, batch=None, interpret=False):
    """numpy wrapper. dual0_ema: int32[n_dual, 4] as exported by analyze with
    model profile 1 (fp=fast prob, fn=visits, sp=slow prob)."""
    del batch  # kept for API symmetry; the kernel is batch-free (exact EMA)
    n = len(bit)
    step_elems = GROUPS_PER_STEP * LANES
    pad = (-n) % step_elems
    n_dual = dual0_ema.shape[0]
    n_dual_pad = -(-n_dual // LANES) * LANES
    n_sig_pad = -(-n_sig // LANES) * LANES
    bitkind = (bit.astype(np.uint8) | (kind.astype(np.uint8) << 1)).astype(np.int32)
    key_adj = np.where(kind == 2, key.astype(np.int64) + n_dual_pad,
                       key.astype(np.int64)).astype(np.int32)
    bk = np.concatenate([bitkind, np.full(pad, 255, np.int32)])
    ky = np.concatenate([key_adj, np.zeros(pad, np.int32)])
    # Strip the off-mode mix-weight tag (bit 15): the EMA profile blends by
    # visit confidence, not by the counting model's alpha weights.
    pr = np.concatenate([(prior.astype(np.int32) & 0x7FFF), np.zeros(pad, np.int32)])
    dual3 = np.zeros((n_dual_pad, 3), np.int32)
    dual3[:n_dual, 0] = dual0_ema[:, 0]
    dual3[:n_dual, 1] = dual0_ema[:, 2]
    dual3[:n_dual, 2] = dual0_ema[:, 1]
    sig0 = np.zeros((n_sig_pad, 2), np.int32)
    probs = ema_model_pass(jnp.asarray(bk), jnp.asarray(ky), jnp.asarray(pr),
                           jnp.asarray(dual3), jnp.asarray(sig0), interpret=bool(interpret))
    return np.asarray(probs)[:n].astype(np.uint16)
