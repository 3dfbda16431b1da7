"""Batched adaptive-model probability pass on device (JAX).

Computes the per-bin 15-bit probabilities for a chunk's coded-bin stream,
bit-exactly matching the host C++ ModelEncoder (avrecode_tpu/native/recode.h)
under the batched-update semantics (avrecode_tpu/native/model.h note_coded /
flush_updates):

  - count increments are visible immediately -> within a batch this is a
    per-key *segmented prefix sum* (sort by key, cumsum, unsort): fully
    parallel on the VPU;
  - window halving happens only at batch boundaries -> a masked elementwise
    pass over the estimator tables;
  - probabilities are pure integer gathers + arithmetic.

The whole chunk is a `lax.scan` over batches with the estimator tables as
carry. All arithmetic is int32 with floor division, matching the C++ unsigned
math exactly (all operands positive and < 2^31).

This is the TPU-native answer to the reference's strictly serial per-bin
model loop (reference recode.cpp:1057-1058, 1175-1179): the serial dependency
is reduced to one cheap table update per 16k bins.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PROB_BITS = 15
PROB_SCALE = 1 << PROB_BITS


def _clamp_prob(p):
    return jnp.clip(p, 1, PROB_SCALE - 1)


def _halve_while(x_pos, x_neg, window, iters=16):
    # Replicates: while (pos+neg > window) { pos=(pos+1)>>1; neg=(neg+1)>>1; }
    for _ in range(iters):
        mask = (x_pos + x_neg) > window
        x_pos = jnp.where(mask, (x_pos + 1) >> 1, x_pos)
        x_neg = jnp.where(mask, (x_neg + 1) >> 1, x_neg)
    return x_pos, x_neg


@functools.partial(jax.jit,
                   static_argnames=("batch", "fast_w", "slow_w", "sig_w", "sig_alpha", "impl"))
def model_pass(bits, kinds, keys, priors, dual0, sig0, batch: int, fast_w: int, slow_w: int,
               sig_w: int, sig_alpha: int, impl: str = "sort"):
    """Returns probs (uint16[n_pairs_padded]) for the padded pair stream.

    bits/kinds/keys/priors: int32[n_batches * batch] (padded; padding must use
    the scratch dual key = dual0.shape[0] - 1 with bit 0).
    dual0: int32[n_dual + 1, 4] seeded (fp, fn, sp, sn); last row is scratch.
    sig0: int32[n_sig, 2] (pos, neg) start state (zeros).
    impl: "sort" = stable-argsort segmented prefix sums (VPU sort network);
          "mm" = tril-masked key-equality matmul (exclusive per-key prefix
          counts as an fp32 MXU contraction — exact for batch <= 2^20, no
          sort). Bit-identical outputs; pick by measured speed.
    """
    if impl not in ("sort", "mm"):
        raise ValueError(f"model_pass impl must be 'sort' or 'mm', got {impl!r}")
    n = bits.shape[0]
    assert n % batch == 0
    n_batches = n // batch
    n_dual = dual0.shape[0]  # includes scratch row

    shape_b = (n_batches, batch)
    bits_b = bits.reshape(shape_b)
    kinds_b = kinds.reshape(shape_b)
    keys_b = keys.reshape(shape_b)
    priors_b = priors.reshape(shape_b)

    def step(tables, xs):
        dual, sig = tables
        bit, kind, key, prior = xs
        is_sig = kind == 2
        # kind 3 = prior passthrough (CABAC-parity EOB bins): no table read or
        # update — retarget them at the scratch row so the prefix machinery
        # never mixes them into a live key's segment.
        is_ext = kind == 3
        key = jnp.where(is_ext, n_dual - 1, key)
        # Unified key space for the within-batch prefix machinery.
        ukey = jnp.where(is_sig, key + n_dual, key)

        if impl == "mm":
            # pre_ones[i] = #{j < i : ukey_j == ukey_i, bit_j = 1} as a
            # masked matmul: M[i,j] = (ukey_i == ukey_j) & (j < i), then
            # (pre_ones, pre_tot) = M @ [bit, 1]. Counts < 2^20 are exact in
            # fp32; the contraction runs on the MXU instead of a sort network.
            pos_idx = jnp.arange(batch, dtype=jnp.int32)
            m = ((ukey[:, None] == ukey[None, :]) &
                 (pos_idx[None, :] < pos_idx[:, None]))
            rhs = jnp.stack([bit, jnp.ones_like(bit)], axis=1)
            pre = jax.lax.dot(m.astype(jnp.float32), rhs.astype(jnp.float32),
                              precision=jax.lax.Precision.HIGHEST)
            pre = pre.astype(jnp.int32)
            pre_ones = pre[:, 0]
            pre_tot = pre[:, 1]
            pre_zeros = pre_tot - pre_ones
        else:
            order = jnp.argsort(ukey, stable=True)
            ukey_s = ukey[order]
            ones_s = bit[order]
            start = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), ukey_s[1:] != ukey_s[:-1]])
            ex_ones = jnp.cumsum(ones_s) - ones_s  # exclusive cumsum
            pos_idx = jnp.arange(batch, dtype=jnp.int32)
            # Segment-start baselines via running max (cumsums nondecreasing).
            seg_ex_ones = jax.lax.cummax(jnp.where(start, ex_ones, -1))
            seg_first = jax.lax.cummax(jnp.where(start, pos_idx, -1))
            pre_ones_s = ex_ones - seg_ex_ones
            pre_tot_s = pos_idx - seg_first
            # Unsort.
            inv = jnp.zeros_like(order).at[order].set(pos_idx)
            pre_ones = pre_ones_s[inv]
            pre_tot = pre_tot_s[inv]
            pre_zeros = pre_tot - pre_ones

        # Effective estimator state for each pair. Sig keys index a different
        # table; route each gather/scatter to its own space (the other side
        # reads/writes the scratch row so indices stay in bounds).
        dkey = jnp.where(is_sig, n_dual - 1, key)  # scratch row for sig pairs
        skey = jnp.where(is_sig, key, 0)
        dfp = dual[dkey, 0] + pre_ones
        dfn = dual[dkey, 1] + pre_zeros
        dsp = dual[dkey, 2] + pre_ones
        dsn = dual[dkey, 3] + pre_zeros
        spos = sig[skey, 0] + pre_ones
        sneg = sig[skey, 1] + pre_zeros

        ps = (dsp << PROB_BITS) // (dsp + dsn)
        pf = (dfp << PROB_BITS) // (dfp + dfn)
        # Three-voice mix when a mirrored-CABAC prior rides along (mb-layer
        # ctx bins); plain fast+slow otherwise (prior == 0 sentinel).
        p_dual = _clamp_prob(jnp.where(prior > 0,
                                       (pf + ps + 2 * prior) >> 2,
                                       (pf + ps) >> 1))
        p_slow = _clamp_prob(ps)
        p_sig = _clamp_prob(((spos << PROB_BITS) + sig_alpha * prior) //
                            (spos + sneg + sig_alpha))
        prob = jnp.where(kind == 0, p_dual, jnp.where(kind == 1, p_slow, p_sig))
        prob = jnp.where(is_ext, _clamp_prob(prior), prob)

        # Batch-boundary update: scatter-add totals, then masked halving.
        d_ones = jnp.where(is_sig | is_ext, 0, bit)
        d_zero = jnp.where(is_sig | is_ext, 0, 1 - bit)
        s_ones = jnp.where(is_sig, bit, 0)
        s_zero = jnp.where(is_sig, 1 - bit, 0)
        dual = dual.at[dkey, 0].add(d_ones)
        dual = dual.at[dkey, 1].add(d_zero)
        dual = dual.at[dkey, 2].add(d_ones)
        dual = dual.at[dkey, 3].add(d_zero)
        sig = sig.at[skey, 0].add(s_ones)
        sig = sig.at[skey, 1].add(s_zero)
        fp, fn = _halve_while(dual[:, 0], dual[:, 1], fast_w)
        sp, sn = _halve_while(dual[:, 2], dual[:, 3], slow_w)
        dual = jnp.stack([fp, fn, sp, sn], axis=1)
        sp2, sn2 = _halve_while(sig[:, 0], sig[:, 1], sig_w)
        sig = jnp.stack([sp2, sn2], axis=1)
        return (dual, sig), prob.astype(jnp.uint16)

    (_, _), probs = jax.lax.scan(step, (dual0, sig0), (bits_b, kinds_b, keys_b, priors_b))
    return probs.reshape(-1)


def _bucket(n_batches: int) -> int:
    # Pad the batch count to a power of two so XLA programs are reused across
    # chunks of different sizes (padding batches only touch the scratch row).
    b = 1
    while b < n_batches:
        b *= 2
    return b


def default_impl() -> str:
    import os
    return os.environ.get("ARTC_MODEL_IMPL", "sort")


def run_chunk(bit, kind, key, prior, dual0, batch, fast_w, slow_w, sig_w, sig_alpha, n_sig,
              impl=None):
    """numpy in/out convenience wrapper: pads, runs the jitted pass, trims."""
    n = len(bit)
    if n == 0:
        return np.zeros(0, np.uint16)
    n_dual = dual0.shape[0]
    m = _bucket(-(-n // batch)) * batch
    pad = m - n
    scratch = n_dual  # extra scratch row index
    bit_p = np.concatenate([bit.astype(np.int32), np.zeros(pad, np.int32)])
    kind_p = np.concatenate([kind.astype(np.int32), np.zeros(pad, np.int32)])
    key_p = np.concatenate([key.astype(np.int32), np.full(pad, scratch, np.int32)])
    prior_p = np.concatenate([prior.astype(np.int32), np.zeros(pad, np.int32)])
    dual_ext = np.concatenate([dual0.astype(np.int32), np.ones((1, 4), np.int32)], axis=0)
    sig0 = np.zeros((n_sig, 2), np.int32)
    probs = model_pass(
        jnp.asarray(bit_p), jnp.asarray(kind_p), jnp.asarray(key_p), jnp.asarray(prior_p),
        jnp.asarray(dual_ext), jnp.asarray(sig0), batch=int(batch), fast_w=int(fast_w),
        slow_w=int(slow_w), sig_w=int(sig_w), sig_alpha=int(sig_alpha),
        impl=impl or default_impl())
    return np.asarray(probs)[:n]
