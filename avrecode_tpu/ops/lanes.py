"""K-lane interleaved binary rANS encoding on device (JAX).

Byte-identical to the host codec (avrecode_tpu/native/rans.h
RansInterleaved::encode). Each lane encodes its strided subsequence in
reverse; because rANS is carry-free and the probabilities are precomputed by
the model pass, all K lanes advance in lockstep as one vectorized
`lax.scan` over time — the structure the reference's carry-propagating serial
range coder cannot offer (reference arithmetic_code.h:147-180; SURVEY.md §2.1
TPU note).

The scan emits at most one u16 word per (step, lane); the final per-lane
streams are a mask-compaction done on host (O(output bytes))."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PROB_BITS = 15
PROB_SCALE = 1 << PROB_BITS
RANS_L = 1 << 16


@functools.partial(jax.jit, static_argnames=())
def _lane_scan(bits_tk, probs_tk, valid_tk):
    """bits/probs/valid: [T, K]. Returns (x_final[K], words[T, K], emit[T, K]).

    Processes t = T-1 .. 0 (reverse scan); emissions stacked at their t index,
    so reading words[t] for ascending t with the emit mask yields the lane
    stream tail in final order (see rans.h stream layout)."""
    K = bits_tk.shape[1]
    x0 = jnp.full((K,), RANS_L, jnp.uint32)

    def step(x, xs):
        bit, p, valid = xs
        p = p.astype(jnp.uint32)
        f = jnp.where(bit == 1, p, PROB_SCALE - p)
        c = jnp.where(bit == 1, PROB_SCALE - p, jnp.zeros_like(p))
        x_max = f << 17
        emit = (x >= x_max) & valid
        word = (x & 0xFFFF).astype(jnp.uint16)
        x1 = jnp.where(emit, x >> 16, x)
        x2 = ((x1 // f) << PROB_BITS) + (x1 % f) + c
        x = jnp.where(valid, x2, x)
        return x, (word, emit)

    x_final, (words, emits) = jax.lax.scan(step, x0, (bits_tk, probs_tk, valid_tk),
                                           reverse=True)
    return x_final, words, emits


def _bucket(t: int) -> int:
    b = 1
    while b < t:
        b *= 2
    return b


def encode_interleaved(bits: np.ndarray, probs: np.ndarray, K: int) -> bytes:
    """Full chunk encode; returns the wire-format blob (see rans.h)."""
    n = len(bits)
    T = _bucket(-(-n // K)) if n else 0
    pad = T * K - n
    bits_p = np.concatenate([bits.astype(np.uint32), np.zeros(pad, np.uint32)])
    probs_p = np.concatenate([probs.astype(np.uint32), np.ones(pad, np.uint32)])
    valid_p = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    # lane l owns indices l, l+K, ... -> reshape to [T, K]
    bits_tk = bits_p.reshape(T, K) if T else np.zeros((0, K), np.uint32)
    probs_tk = probs_p.reshape(T, K) if T else np.zeros((0, K), np.uint32)
    valid_tk = valid_p.reshape(T, K) if T else np.zeros((0, K), bool)

    if T:
        x_final, words, emits = _lane_scan(jnp.asarray(bits_tk), jnp.asarray(probs_tk),
                                           jnp.asarray(valid_tk))
        x_final = np.asarray(x_final)
        words = np.asarray(words)
        emits = np.asarray(emits)
    else:
        x_final = np.full((K,), RANS_L, np.uint32)
        words = np.zeros((0, K), np.uint16)
        emits = np.zeros((0, K), bool)

    out = bytearray()
    out += np.uint32(K).tobytes()
    out += np.uint32(n).tobytes()
    lane_words = []
    for l in range(K):
        tail = words[:, l][emits[:, l]]
        stream = np.concatenate([
            np.array([x_final[l] >> 16, x_final[l] & 0xFFFF], np.uint16), tail.astype(np.uint16)])
        lane_words.append(stream)
    for l in range(K):
        out += np.uint32(len(lane_words[l])).tobytes()
    for l in range(K):
        out += lane_words[l].astype("<u2").tobytes()
    return bytes(out)
