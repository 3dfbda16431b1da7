"""Pallas TPU kernel for the EMA-profile model pass.

The batched-update formulation in ops/model_pass.py pays for an argsort per
batch (TPU sorts are slow). This kernel takes the opposite route: the whole
estimator state lives in VMEM (dual ~0.9 MB + sig ~1 MB), the grid iterates
batches sequentially (TPU grid steps run in order on one core, so VMEM scratch
persists), and within a batch a scalar loop applies exact per-bin EMA updates
— possible on the scalar core because the EMA profile (model profile 1,
native/model.h) was designed division-free: probabilities and updates are
shift/add only.

Semantics = C++ PriorModel profile 1 exactly (same staged shift schedule,
same clamps); differentially tested against the host in
tests/test_device_model.py.
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


def _ema_kernel(bitkind_ref, key_ref, prior_ref, dual_in_ref, sig_in_ref, probs_ref,
                dual_ref, sig_ref):
    """Grid over batches. Scratch: dual[n_dual, 3] (fp, sp, visits),
    sig[n_sig, 2] (ema, visits). Block inputs: one batch per step."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dual_ref[:, :] = dual_in_ref[:, :]
        sig_ref[:, :] = sig_in_ref[:, :]

    batch = bitkind_ref.shape[0]

    def body(i, _):
        bk = bitkind_ref[i]
        key = key_ref[i]
        bit = bk & 1
        kind = bk >> 1
        is_sig = kind == 2
        valid = bk != 255

        def do_sig(_):
            ema0 = sig_ref[key, 0]
            visits = sig_ref[key, 1]
            ema = jnp.where(visits == 0, PROB_SCALE // 2, ema0)
            prior = prior_ref[i]
            w = jnp.minimum(visits, 8)
            p = prior + (((ema - prior) * w) >> 3)
            p = jnp.clip(p, 1, PROB_SCALE - 1)
            g = jnp.where(visits < 4, 2, jnp.where(visits < 16, 4, 6))
            ema2 = jnp.where(bit == 1, ema + ((PROB_SCALE - ema) >> g), ema - (ema >> g))
            ema2 = jnp.clip(ema2, 1, PROB_SCALE - 1)
            sig_ref[key, 0] = ema2
            sig_ref[key, 1] = jnp.minimum(visits + 1, 255)
            return p

        def do_dual(_):
            fp = dual_ref[key, 0]
            sp = dual_ref[key, 1]
            visits = dual_ref[key, 2]
            p_slow = jnp.clip(sp, 1, PROB_SCALE - 1)
            p_mix = jnp.clip((fp + sp) >> 1, 1, PROB_SCALE - 1)
            p = jnp.where(kind == 1, p_slow, p_mix)
            gf = jnp.where(visits < 8, 2, jnp.where(visits < 32, 3, 5))
            gs = jnp.where(visits < 32, 4, jnp.where(visits < 128, 6, 8))
            fp2 = jnp.where(bit == 1, fp + ((PROB_SCALE - fp) >> gf), fp - (fp >> gf))
            sp2 = jnp.where(bit == 1, sp + ((PROB_SCALE - sp) >> gs), sp - (sp >> gs))
            dual_ref[key, 0] = jnp.clip(fp2, 1, PROB_SCALE - 1)
            dual_ref[key, 1] = jnp.clip(sp2, 1, PROB_SCALE - 1)
            dual_ref[key, 2] = jnp.minimum(visits + 1, 255)
            return p

        def skip(_):
            return jnp.int32(PROB_SCALE // 2)

        p = jax.lax.cond(valid,
                         lambda _: jax.lax.cond(is_sig, do_sig, do_dual, 0),
                         skip, 0)
        probs_ref[i] = p
        return 0

    jax.lax.fori_loop(0, batch, body, 0)


@functools.partial(jax.jit, static_argnames=("batch", "interpret"))
def ema_model_pass(bitkind, keys, priors, dual0, sig0, batch: int, interpret: bool = False):
    """bitkind uint8/int32[n] = bit | kind<<1 (255 = padding); keys int32[n];
    priors int32[n]; dual0 int32[n_dual, 3] (fp, sp, visits);
    sig0 int32[n_sig, 2] (ema, visits). Returns probs int32[n]."""
    n = bitkind.shape[0]
    assert n % batch == 0
    n_batches = n // batch
    n_dual = dual0.shape[0]
    n_sig = sig0.shape[0]
    bk = bitkind.astype(jnp.int32).reshape(n_batches, batch)
    ky = keys.astype(jnp.int32).reshape(n_batches, batch)
    pr = priors.astype(jnp.int32).reshape(n_batches, batch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_batches,),
        in_specs=[
            pl.BlockSpec((1, batch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_dual, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sig, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, batch), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_dual, 3), jnp.int32),
            pltpu.VMEM((n_sig, 2), jnp.int32),
        ],
    )

    def kernel(bk_ref, ky_ref, pr_ref, d_in, s_in, out_ref, dual_s, sig_s):
        _ema_kernel(bk_ref.at[0], ky_ref.at[0], pr_ref.at[0], d_in, s_in, out_ref.at[0], dual_s, sig_s)

    probs = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_batches, batch), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bk, ky, pr, dual0.astype(jnp.int32), sig0.astype(jnp.int32))
    return probs.reshape(-1)


def run_chunk_ema(bit, kind, key, prior, dual0_ema, n_sig, batch=4096, interpret=False):
    """numpy wrapper. dual0_ema: int32[n_dual, 4] as exported by analyze with
    model profile 1 (fp=fast prob, fn=visits, sp=slow prob, sn unused) —
    converted here to the kernel's [n_dual, 3] (fp, sp, visits) layout."""
    n = len(bit)
    pad = (-n) % batch
    bitkind = (bit.astype(np.uint8) | (kind.astype(np.uint8) << 1)).astype(np.int32)
    bk = np.concatenate([bitkind, np.full(pad, 255, np.int32)])
    ky = np.concatenate([key.astype(np.int32), np.zeros(pad, np.int32)])
    pr = np.concatenate([prior.astype(np.int32), np.zeros(pad, np.int32)])
    dual3 = np.stack([dual0_ema[:, 0], dual0_ema[:, 2], dual0_ema[:, 1]], axis=1).astype(np.int32)
    sig0 = np.zeros((n_sig, 2), np.int32)
    probs = ema_model_pass(jnp.asarray(bk), jnp.asarray(ky), jnp.asarray(pr),
                           jnp.asarray(dual3), jnp.asarray(sig0), batch=int(batch),
                           interpret=bool(interpret))
    return np.asarray(probs)[:n].astype(np.uint16)
