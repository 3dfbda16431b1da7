#!/usr/bin/env python3
"""Benchmark: H.264 recompression on the attached TPU chip.

Runs the device compression path (host syntax analysis -> JAX model pass +
rANS lane encode on TPU -> container pack) over benchdata/bench.mp4, verifies
the bit-exact roundtrip gate, and prints ONE JSON line.

Primary metric: end-to-end device-path recompression MB/s on this machine.
NOTE on this dev environment: the TPU is attached through a network tunnel
(~25 MB/s); transfers dominate the e2e number. The steady-state on-device
model-pass rate (bins/s with inputs resident) is reported in
`device_model_mbins_s` — that is the chip-capability number a PCIe-attached
deployment would approach.

vs_baseline: speedup vs this repo's own single-threaded host C++ path
(the reference publishes no numbers — BASELINE.md).
"""
import json
import multiprocessing as mp_proc
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CLIP = os.path.join(REPO, "benchdata", "bench.mp4")
BATCH = 4096


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _device_worker(q, data, batch):
    """Runs the device path in a subprocess so a wedged TPU can't hang the
    benchmark — results come back through a queue."""
    try:
        import numpy as np
        import jax
        import jax.numpy as jnp
        from avrecode_tpu import device

        device.compress(data, batch_size=batch)  # warm
        times = []
        comp_dev = None
        for _ in range(3):
            t0 = time.time()
            comp_dev, _ = device.compress(data, batch_size=batch)
            times.append(time.time() - t0)
        dev_s = sorted(times)[1]

        # Chip-capability number: stage the slim-wire inputs once, then time
        # the jitted frozen-batch pass alone (host analysis and tunnel
        # transfers are reported separately — see device_wire_mb).
        an = device.analyze(data, batch_size=batch, model_profile=2)
        # Chip rate on the largest chunk (chunk 0 is the short warm seed
        # since container v16 — too small to amortize dispatch overheads).
        c = max(an.chunks, key=lambda cc: cc.n)
        from avrecode_tpu.ops import model_pass as mp
        n, m = c.n, c.m
        pad = m - n
        pad_val = (3 << 13) | (c.ud - 1)
        packed = np.concatenate([c.packed, np.full(pad, pad_val, np.uint16)])
        pidx = np.concatenate([c.prior_idx, np.full(pad, 255, np.uint8)])
        pdict = np.ones(256, np.uint16)
        pdict[:len(c.pdict)] = c.pdict
        ne = device._bucket_pow2(len(c.esc_idx))
        esc_idx = np.full(ne, m, np.uint32)
        esc_idx[:len(c.esc_idx)] = c.esc_idx
        esc_val = np.ones(ne, np.uint16)
        esc_val[:len(c.esc_val)] = c.esc_val
        nc = device._bucket_lin(len(c.coo_slot))
        coo_slot = np.zeros(nc, np.uint16)
        coo_slot[:len(c.coo_slot)] = c.coo_slot
        coo_vals = np.zeros((nc, 2), np.uint8)
        coo_vals[:len(c.coo_ones), 0] = c.coo_ones
        coo_vals[:len(c.coo_tot), 1] = c.coo_tot
        ncc = device._bucket_pow2(max(1, 0 if c.cesc_idx is None else len(c.cesc_idx)))
        cesc_idx = np.full(ncc, nc, np.uint32)
        cesc_val = np.zeros((ncc, 2), np.uint16)
        if c.cesc_idx is not None and len(c.cesc_idx):
            cesc_idx[:len(c.cesc_idx)] = c.cesc_idx
            cesc_val[:len(c.cesc_idx)] = c.cesc_val
        host_arrays = (packed, pidx, pdict, esc_idx, esc_val, c.dk_d, c.dk_s,
                       c.coo_cnt, coo_slot, coo_vals, cesc_idx, cesc_val)
        # Total wire = every chunk's upload bytes (the staged/timed arrays
        # below cover chunk 0 only; sections split the stream across chunks).
        wire_mb = sum(
            cc.m * 3 + cc.dk_d.nbytes + cc.dk_s.nbytes + cc.dual0.nbytes +
            cc.coo_cnt.nbytes + device._bucket_lin(len(cc.coo_slot)) * 4 +
            device._bucket_pow2(len(cc.esc_idx)) * 6 + 512 +
            (0 if cc.cesc_idx is None else
             device._bucket_pow2(max(1, len(cc.cesc_idx))) * 8) +
            (0 if cc.sig0_idx is None else cc.sig0_idx.nbytes + cc.sig0_val.nbytes)
            for cc in an.chunks) / 1e6
        # Measured wire time: repeat upload of the exact production arrays.
        t0 = time.time()
        args = [jax.device_put(jnp.asarray(x)) for x in host_arrays]
        for a in args:
            a.block_until_ready()
        int(jnp.sum(args[0].astype(jnp.int32)))  # axon: force real sync
        wire_s = time.time() - t0
        dual0_dev = jax.device_put(jnp.asarray(c.dual0))
        deltas, prior_full = mp.wire_expand(
            args[7], args[8], args[9], np.int32(len(c.coo_slot)),
            args[1], args[2], args[3], args[4],
            nsub=int(c.ns * an.sup), U=int(c.ud + c.us),
            cesc_idx=args[10], cesc_val=args[11])
        s_idx, s_val = device._sig0_sparse_padded(c, an.n_sig)
        kw = dict(batch=batch, sup=an.sup, fast_w=an.fast_w, slow_w=an.slow_w,
                  sig_w=an.sig_w, sig_alpha=an.sig_alpha, ud=c.ud, us=c.us,
                  n_sig=an.n_sig,
                  sig0_idx=None if s_idx is None else jnp.asarray(s_idx),
                  sig0_val=None if s_val is None else jnp.asarray(s_val))
        probs, bits = mp.model_pass_v3(args[0], prior_full, args[5], args[6],
                                       deltas, dual0_dev, **kw)
        int(jnp.sum(probs.astype(jnp.int32)))  # warm + sync
        exact = bool(np.array_equal(np.asarray(probs)[:n], c.host_probs))
        # One scalar readback AFTER all reps: a per-rep readback pays the
        # tunnel RTT each time and understates the chip rate by ~30%.
        reps = 4
        t0 = time.time()
        p2 = None
        for _ in range(reps):
            p2, _ = mp.model_pass_v3(args[0], prior_full, args[5], args[6],
                                     deltas, dual0_dev, **kw)
        int(jnp.sum(p2.astype(jnp.int32)))
        mbins_s = m * reps / (time.time() - t0) / 1e6
        if not exact:
            mbins_s = 0.0
        q.put(("ok", dev_s, mbins_s, bytes(comp_dev), wire_mb, wire_s))
    except Exception as e:  # pragma: no cover
        q.put(("err", str(e), 0.0, b"", 0.0, 0.0))


def main():
    from avrecode_tpu import pipeline

    with open(CLIP, "rb") as f:
        data = f.read()
    mb = len(data) / 1e6

    # ---- correctness gate + host baseline (best-of-5: the shared VM's
    # timing noise exceeds 2x; min is the standard noise-floor estimator) ----
    host_s = float("inf")
    for _ in range(5):
        t0 = time.time()
        comp_host, st = pipeline.compress(data, batch_size=BATCH)
        host_s = min(host_s, time.time() - t0)
    dec_s = float("inf")
    for _ in range(5):
        t0 = time.time()
        dec, _ = pipeline.decompress(comp_host)
        dec_s = min(dec_s, time.time() - t0)
    host_ok = dec == data
    log(f"bench: host path done ({host_s:.1f}s best-of-5, ok={host_ok})")

    # ---- device path in a watchdogged subprocess (a wedged TPU must not
    # hang the benchmark; fall back to the host number, flagged) ----
    # The tunnel's throughput varies ~10x on this shared rig; first-run
    # compiles + the ~80 MB wire can exceed 7 minutes on a bad day. The
    # watchdog guards against a WEDGED chip, not a slow tunnel — keep it
    # generous so a degraded link still produces device numbers.
    timeout_s = int(os.environ.get("ARTC_BENCH_DEVICE_TIMEOUT", "1200"))
    ctx = mp_proc.get_context("spawn")
    q = ctx.Queue()
    proc = ctx.Process(target=_device_worker, args=(q, data, BATCH))
    proc.start()
    device_ok = False
    dev_s = float("inf")
    mbins_s = 0.0
    comp_dev = b""
    wire_mb = wire_s = 0.0
    try:
        status, a, b, c, wmb, ws = q.get(timeout=timeout_s)
        if status == "ok":
            device_ok = True
            dev_s, mbins_s, comp_dev, wire_mb, wire_s = a, b, c, wmb, ws
        else:
            log(f"bench: device worker error: {a}")
    except Exception:
        log("bench: device path timed out (TPU unavailable?) — host fallback")
    finally:
        if proc.is_alive():
            proc.terminate()
        proc.join(10)
    log(f"bench: device phase done ok={device_ok}")
    if device_ok:
        # the hard gate: the device-encoded container must decode bit-exactly
        # with the host serial decoder
        dec2, _ = pipeline.decompress(comp_dev)
        dev_ok = dec2 == data
    else:
        dev_ok = False

    # Headline: the better of the two verified paths on this machine. (On
    # this dev attach the TPU sits behind a ~25 MB/s tunnel, so the e2e
    # device number is transfer-bound; device_model_mbins_s is the chip
    # number a PCIe/co-located deployment would see.)
    if device_ok and dev_ok and dev_s < host_s:
        value = mb / dev_s
        ok = host_ok
        comp_used = comp_dev
    else:
        value = mb / host_s
        ok = host_ok
        comp_used = comp_host
    # Physics note for the tunnel attach: the slim device wire is ~3 bytes/bin
    # while the input stream holds ~11 bins/byte, so the device path must move
    # ~35x the input size through the ~38 MB/s tunnel — feeding the chip costs
    # more wall-clock than the 2-core host path's entire job. The colocated
    # projection (dev_e2e minus measured wire time) is what a PCIe-attached
    # deployment of the identical code would see.
    print(json.dumps({
        "metric": "recompress_throughput",
        "value": round(value, 3) if ok else 0.0,
        "unit": "MB/s/chip",
        "vs_baseline": round(max(host_s / dev_s, 1.0), 3) if (ok and device_ok) else 1.0,
        "roundtrip_bit_exact": ok,
        "device_path_used": bool(device_ok and dev_ok),
        "compression_ratio": round(len(comp_used) / len(data), 5),
        "input_mb": round(mb, 3),
        "host_path_mb_s": round(mb / host_s, 3),
        "host_decompress_mb_s": round(mb / dec_s, 3),
        "device_e2e_s": round(dev_s, 3) if device_ok else None,
        "device_wire_mb": round(wire_mb, 1),
        "device_wire_s": round(wire_s, 3),
        "device_model_mbins_s": round(mbins_s, 1),
        "bins": st.total_bins,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
