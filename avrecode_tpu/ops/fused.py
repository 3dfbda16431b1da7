"""Fused device kernel: model pass + rANS lane encode in one XLA program.

Probabilities never leave the device; inputs travel once in narrow dtypes
(bit+kind packed in one uint8, key uint32, prior uint16). Outputs are the lane
scan products (final states, emitted words + masks) which the host compacts
into the wire blob.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import model_pass as mp
from . import lanes as lx


@functools.partial(jax.jit, static_argnames=("batch", "K", "fast_w", "slow_w", "sig_w",
                                             "sig_alpha"))
def fused_compress(bitkind, keys, priors, dual0, sig0, batch: int, K: int, fast_w: int,
                   slow_w: int, sig_w: int, sig_alpha: int):
    """bitkind: uint8[n] = bit | (kind << 1); keys uint32[n]; priors uint16[n].
    n must be a multiple of both batch and K. Returns (x_final[K], words[T,K],
    emits[T,K], probs_u16[n])."""
    bit = (bitkind & 1).astype(jnp.int32)
    kind = (bitkind >> 1).astype(jnp.int32)
    key = keys.astype(jnp.int32)
    prior = priors.astype(jnp.int32)
    probs = mp.model_pass(bit, kind, key, prior, dual0, sig0, batch=batch, fast_w=fast_w,
                          slow_w=slow_w, sig_w=sig_w, sig_alpha=sig_alpha)
    n = bit.shape[0]
    T = n // K
    bits_tk = bit.reshape(T, K).astype(jnp.uint32)
    probs_tk = probs.reshape(T, K).astype(jnp.uint32)
    valid = bitkind.reshape(T, K) != 255  # padding sentinel
    x_final, words, emits = lx._lane_scan(bits_tk, probs_tk, valid)
    return x_final, words, emits, probs


def _lcm_pad(n, batch, K):
    m = n
    # round up to a multiple of batch, then keep the batch-count a power of two
    # (compile reuse), then to a multiple of K.
    nb = mp._bucket(-(-m // batch))
    m = nb * batch
    if m % K:
        m += K - (m % K)
        # keep multiple of batch too: batch and K are both powers of two here
    return m


def compress_chunk(bit, kind, key, prior, dual0, batch, K, fast_w, slow_w, sig_w, sig_alpha,
                   n_sig, want_probs=False):
    """numpy in/out: full fused chunk encode. Returns (blob_bytes, probs|None)."""
    n = len(bit)
    n_dual = dual0.shape[0]
    m = _lcm_pad(n, batch, K)
    pad = m - n
    bitkind = (bit.astype(np.uint8) | (kind.astype(np.uint8) << 1))
    # padding sentinel 255: decoded as bit=1,kind=127 -> route via masks below;
    # instead keep semantics safe: pad with kind=0 scratch-key pairs but mark
    # invalid for the lane scan via the sentinel check on a separate array.
    bk = np.concatenate([bitkind, np.full(pad, 255, np.uint8)])
    key_p = np.concatenate([key.astype(np.uint32), np.full(pad, n_dual, np.uint32)])
    prior_p = np.concatenate([prior.astype(np.uint16), np.zeros(pad, np.uint16)])
    dual_ext = np.concatenate([dual0.astype(np.int32), np.ones((1, 4), np.int32)], axis=0)
    sig0 = np.zeros((n_sig, 2), np.int32)
    x_final, words, emits, probs = fused_compress(
        jnp.asarray(bk), jnp.asarray(key_p), jnp.asarray(prior_p), jnp.asarray(dual_ext),
        jnp.asarray(sig0), batch=int(batch), K=int(K), fast_w=int(fast_w), slow_w=int(slow_w),
        sig_w=int(sig_w), sig_alpha=int(sig_alpha))
    x_final = np.asarray(x_final)
    words = np.asarray(words)
    emits = np.asarray(emits)

    out = bytearray()
    out += np.uint32(K).tobytes()
    out += np.uint32(n).tobytes()
    lane_words = []
    for l in range(K):
        tail = words[:, l][emits[:, l]]
        stream = np.concatenate([
            np.array([x_final[l] >> 16, x_final[l] & 0xFFFF], np.uint16),
            tail.astype(np.uint16)])
        lane_words.append(stream)
    for l in range(K):
        out += np.uint32(len(lane_words[l])).tobytes()
    for l in range(K):
        out += lane_words[l].astype("<u2").tobytes()
    if want_probs:
        return bytes(out), np.asarray(probs)[:n]
    return bytes(out), None
