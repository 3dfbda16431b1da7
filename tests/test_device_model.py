"""Differential tests: device model implementations vs the host C++ model.

Runs on the CPU backend (conftest forces it); the Pallas kernel runs in
interpreter mode — semantics only, not performance."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_clip(corpus_dir):
    with open(os.path.join(corpus_dir, "i_main.264"), "rb") as f:
        return f.read()


def test_jax_model_pass_bit_exact(small_clip):
    from avrecode_tpu import device
    an = device.analyze(small_clip, batch_size=2048)
    for c in an.chunks:
        probs = device.device_probs(an, c)
        assert np.array_equal(probs, c.host_probs)


def test_jax_lanes_byte_identical(small_clip):
    from avrecode_tpu import device, pipeline
    comp_dev, _ = device.compress(small_clip, batch_size=2048)
    dec, _ = pipeline.decompress(comp_dev)
    assert dec == small_clip


def test_pallas_ema_kernel_bit_exact(small_clip):
    from avrecode_tpu import device
    from avrecode_tpu.ops import pallas_model as pm
    an = device.analyze(small_clip, batch_size=1024, model_profile=1)
    c = an.chunks[0]
    probs = pm.run_chunk_ema(c.bit, c.kind, c.key, c.prior, c.dual0, an.n_sig,
                             batch=1024, interpret=True)
    assert np.array_equal(probs, c.host_probs)


def test_ema_profile_roundtrip(small_clip):
    from avrecode_tpu import pipeline
    rep = pipeline.roundtrip(small_clip, model_profile=1)
    assert rep.ok


def test_model_pass_mm_impl_bit_exact(small_clip):
    """The sort-free (masked-matmul) prefix formulation must match the
    sort-based one bit-for-bit on real traces."""
    from avrecode_tpu import device
    from avrecode_tpu.ops import model_pass as mp
    an = device.analyze(small_clip, batch_size=1024)
    c = an.chunks[0]
    a = mp.run_chunk(c.bit, c.kind, c.key, c.prior, c.dual0, 1024,
                     an.fast_w, an.slow_w, an.sig_w, an.sig_alpha, an.n_sig,
                     impl="sort")
    b = mp.run_chunk(c.bit, c.kind, c.key, c.prior, c.dual0, 1024,
                     an.fast_w, an.slow_w, an.sig_w, an.sig_alpha, an.n_sig,
                     impl="mm")
    import numpy as np
    assert np.array_equal(a, b)
    assert np.array_equal(a, c.host_probs)
