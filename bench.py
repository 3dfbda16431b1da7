#!/usr/bin/env python3
"""Benchmark: H.264 recompression on the attached TPU chip.

Runs the PRODUCTION device compression path (host syntax analysis -> fused
ANL5 blob upload -> JAX wire expand + model pass + rANS lane encode on TPU ->
container pack) over benchdata/bench.mp4, verifies the bit-exact roundtrip
gate, and prints ONE JSON line.

Primary metric: end-to-end device-path recompression MB/s on this machine.
NOTE on this dev environment: the TPU is attached through a network tunnel
(~25 MB/s); transfers dominate the e2e number. Three decomposed numbers tell
the truth the headline can't:
  device_wire_mb      — actual bytes uploaded by the production path
                        (measured by the compress loop, not an analytic model)
  device_wire_s       — measured wall time to stage those bytes
  device_model_mbins_s— steady-state chip rate of the production programs
                        (wire_expand4_blob + model_pass_v4 + lane scan) with
                        inputs resident; what a PCIe attach would approach
  device_colocated_s  — device_e2e_s minus the measured wire time: the e2e a
                        co-located deployment of the identical code would see

The device model pass is verified bin-exactly against the host C++ model on
every chunk; ANY mismatch fails the benchmark (exit 1) — a miscoding device
path must read as broken, not slow.

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
        import jax.numpy as jnp
        from avrecode_tpu import device
        from avrecode_tpu.ops import lanes as lx

        device.compress(data, batch_size=batch)  # warm (compiles all programs)
        times = []
        comp_dev = None
        info = {}
        for _ in range(3):
            info = {}
            t0 = time.time()
            comp_dev, _ = device.compress(data, batch_size=batch, info=info)
            times.append(time.time() - t0)
        dev_s = sorted(times)[1]
        wire_mb = info["wire_bytes"] / 1e6

        # ---- measured wire time + per-chunk differential on the production
        # staging path. analyze() re-runs the host walk with probs exported.
        an = device.analyze(data, batch_size=batch, model_profile=2)

        def stage_all():
            cache = {}
            staged = [device._stage_v4(an, c, cache=cache) for c in an.chunks]
            # axon: block_until_ready does not block; force scalar readbacks
            int(sum(int(jnp.sum(st.blob[:1].astype(jnp.int32)))
                    for st in staged))
            return staged

        stage_all()  # warm the transfers AND the tiny sync programs
        t0 = time.time()
        staged = stage_all()
        wire_s = time.time() - t0

        # Bin-exact differential: production programs vs the host C++ model,
        # every chunk. A mismatch is a hard failure.
        for ci, (c, st) in enumerate(zip(an.chunks, staged)):
            probs, _ = device._exec_v4(st)
            if not np.array_equal(np.asarray(probs)[:c.n], c.host_probs):
                q.put(("err", f"device/host probs mismatch on chunk {ci}",
                       0.0, b"", 0.0, 0.0, 0.0))
                return

        # Chip-capability number: steady-state rate of the production program
        # chain (expand + model pass + lane scan) on the largest chunk with
        # inputs device-resident. One scalar readback AFTER all reps: a
        # per-rep readback pays the tunnel RTT each time and understates the
        # chip rate by ~30%.
        big = max(range(len(staged)), key=lambda i: staged[i].n)
        st = staged[big]
        K = device.pick_lanes(st.n)
        probs, bits = device._exec_v4(st)  # warm this (T, K) lane bucket
        h = lx.encode_interleaved_start(bits, probs, st.n, K)
        int(jnp.sum(h[3]))  # sync counts
        reps = 4
        t0 = time.time()
        last = None
        for _ in range(reps):
            probs, bits = device._exec_v4(st)
            last = lx.encode_interleaved_start(bits, probs, st.n, K)
        int(jnp.sum(last[3]) + jnp.sum(probs[:8].astype(jnp.int32)))
        mbins_s = st.m * reps / (time.time() - t0) / 1e6

        # Colocated chip rate: model + lane scan on the DENSE planes resident
        # (a PCIe/same-host attach ships ~11 B/bin trivially and skips the
        # wire expand — the expand only exists to survive the tunnel).
        from avrecode_tpu.ops import model_pass as mpx
        ex = mpx.wire_expand4_blob(st.blob, st.sc, **st.statics["expand"])
        dense = [jnp.asarray(np.asarray(x)) for x in ex[:7]]
        int(jnp.sum(dense[0][:4].astype(jnp.int32)))

        def dense_chain():
            p, b = mpx.model_pass_v4(*dense[:4], dense[5], dense[6], dense[4],
                                     st.dual0, sig0_idx=st.s_idx,
                                     sig0_val=st.s_val, **st.statics["model"])
            return lx.encode_interleaved_start(b, p, st.n, K)[3]
        int(jnp.sum(dense_chain()))  # warm
        t0 = time.time()
        for _ in range(reps):
            out = dense_chain()
        int(jnp.sum(out))
        dense_mbins_s = st.m * reps / (time.time() - t0) / 1e6
        q.put(("ok", dev_s, mbins_s, bytes(comp_dev), wire_mb, wire_s,
               sum(s.n for s in staged), dense_mbins_s))
    except Exception as e:  # pragma: no cover
        q.put(("err", str(e), 0.0, b"", 0.0, 0.0, 0.0, 0.0))


def _cpu_calibration():
    """Fixed integer+memory workload, best-of-3 — an absolute load reference.
    A uniformly busy VM slows every rep the same amount, which the
    spread-based vm_loaded flag cannot see; the ratio of cpu_calib_s across
    runs normalizes host numbers. Best observed during round 5: 0.84 s (the
    VM was co-tenant-loaded whenever sampled, so treat that as an upper
    bound on the quiet number)."""
    import numpy as np
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        x = np.arange(20_000_000, dtype=np.uint64)
        for _ in range(3):
            x ^= x << 13
            x ^= x >> 7
            x ^= x << 17
        int(x[::4096].sum())
        best = min(best, time.time() - t0)
    return best


def main():
    from avrecode_tpu import pipeline

    with open(CLIP, "rb") as f:
        data = f.read()
    mb = len(data) / 1e6
    calib_s = _cpu_calibration()

    # ---- correctness gate + host baseline (best-of-9: the shared VM's
    # timing noise exceeds 2x; min is the standard noise-floor estimator,
    # and the full spread is reported so a noisy capture is visible in the
    # JSON instead of silently deflating the scored number) ----
    pipeline.compress(data[:200_000], batch_size=BATCH)  # build + warm caches
    host_times = []
    for _ in range(9):
        t0 = time.time()
        comp_host, st = pipeline.compress(data, batch_size=BATCH)
        host_times.append(time.time() - t0)
    host_s = min(host_times)
    host_med = sorted(host_times)[len(host_times) // 2]
    # Ambient-load flag: if the spread of the runs exceeds 60%, the VM is
    # busy and every number below carries that caveat.
    vm_loaded = (max(host_times) - host_s) / host_s > 0.6
    dec_s = float("inf")
    for _ in range(5):
        t0 = time.time()
        dec, _ = pipeline.decompress(comp_host)
        dec_s = min(dec_s, time.time() - t0)
    host_ok = dec == data
    log(f"bench: host path done ({host_s:.1f}s best-of-9, ok={host_ok}, "
        f"loaded={vm_loaded})")

    # ---- GOP-parallel scaling, driver-captured (BASELINE config 3): the
    # multi-GOP clip compressed with GOP chunking on 1 CPU vs all CPUs.
    # sched_setaffinity bounds the serial run; the parallel run uses the
    # box's full core set (2 here — the scaling axis the 'gop' mesh dim
    # extends across chips).
    gop_clip = os.path.join(REPO, "benchdata", "multigop720.mp4")
    with open(gop_clip, "rb") as f:
        gop_data = f.read()
    all_cpus = os.sched_getaffinity(0)
    gop_1cpu_s = gop_par_s = float("inf")
    for _ in range(3):
        os.sched_setaffinity(0, {min(all_cpus)})
        t0 = time.time()
        comp_gop, _ = pipeline.compress(gop_data, chunk_mode=1, batch_size=BATCH)
        gop_1cpu_s = min(gop_1cpu_s, time.time() - t0)
        os.sched_setaffinity(0, all_cpus)
        t0 = time.time()
        comp_gop, _ = pipeline.compress(gop_data, chunk_mode=1, batch_size=BATCH)
        gop_par_s = min(gop_par_s, time.time() - t0)
    gop_dec, _ = pipeline.decompress(comp_gop)
    host_ok = host_ok and gop_dec == gop_data
    log(f"bench: gop scaling {gop_1cpu_s:.2f}s/1cpu -> {gop_par_s:.2f}s/"
        f"{len(all_cpus)}cpu (x{gop_1cpu_s / gop_par_s:.2f})")

    # ---- device path in a watchdogged subprocess (a wedged TPU must not
    # hang the benchmark; fall back to the host number, flagged) ----
    # The tunnel's throughput varies ~10x on this shared rig and each fresh
    # XLA program compile costs 60-370 s on the axon backend (measured r4;
    # the warm pass compiles ~12 programs, so first runs take 15-25 min).
    # The watchdog guards against a WEDGED chip, not slow compiles — keep it
    # generous so a cold cache still produces device numbers.
    timeout_s = int(os.environ.get("ARTC_BENCH_DEVICE_TIMEOUT", "2400"))
    ctx = mp_proc.get_context("spawn")
    q = ctx.Queue()
    proc = ctx.Process(target=_device_worker, args=(q, data, BATCH))
    proc.start()
    device_ok = False
    device_err = ""
    dev_s = float("inf")
    mbins_s = dense_mbins_s = 0.0
    comp_dev = b""
    wire_mb = wire_s = 0.0
    bins_dev = 0
    try:
        status, a, b, c, wmb, ws, nb, dmb = q.get(timeout=timeout_s)
        if status == "ok":
            device_ok = True
            (dev_s, mbins_s, comp_dev, wire_mb, wire_s, bins_dev,
             dense_mbins_s) = a, b, c, wmb, ws, nb, dmb
        else:
            device_err = str(a)
            log(f"bench: device worker error: {a}")
    except Exception:
        device_err = "timeout"
        log("bench: device path timed out (TPU unavailable?) — host fallback")
    finally:
        if proc.is_alive():
            proc.terminate()
        proc.join(10)
    log(f"bench: device phase done ok={device_ok}")
    if device_err and device_err != "timeout":
        # A reachable device that MISCODES is a product failure, not a
        # fallback case: fail loudly.
        print(json.dumps({"metric": "recompress_throughput", "value": 0.0,
                          "unit": "MB/s/chip", "vs_baseline": 0.0,
                          "error": device_err}))
        return 1
    if device_ok:
        # the hard gate: the device-encoded container must decode bit-exactly
        # with the host serial decoder
        dec2, _ = pipeline.decompress(comp_dev)
        dev_ok = dec2 == data
        if not dev_ok:
            print(json.dumps({"metric": "recompress_throughput", "value": 0.0,
                              "unit": "MB/s/chip", "vs_baseline": 0.0,
                              "error": "device container failed roundtrip"}))
            return 1
    else:
        dev_ok = False

    # Headline: the better of the two verified paths on this machine. (On
    # this dev attach the TPU sits behind a ~25 MB/s tunnel, so the e2e
    # device number is transfer-bound; device_model_mbins_s is the chip
    # number a PCIe/co-located deployment would see.)
    if device_ok and dev_ok and dev_s < host_s:
        value = mb / dev_s
        comp_used = comp_dev
    else:
        value = mb / host_s
        comp_used = comp_host
    ok = host_ok
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
        "host_path_mb_s_median": round(mb / host_med, 3),
        "host_run_spread_s": [round(t, 3) for t in sorted(host_times)],
        "host_decompress_mb_s": round(mb / dec_s, 3),
        "gop_scaling_1cpu_s": round(gop_1cpu_s, 3),
        "gop_scaling_parallel_s": round(gop_par_s, 3),
        "gop_scaling_x": round(gop_1cpu_s / gop_par_s, 3),
        "gop_scaling_cpus": len(all_cpus),
        "vm_loaded": vm_loaded,
        "cpu_calib_s": round(calib_s, 3),
        "cpu_calib_best_seen_s": 0.84,
        "device_e2e_s": round(dev_s, 3) if device_ok else None,
        "device_colocated_s": round(max(dev_s - wire_s, 0.0), 3) if device_ok else None,
        "device_wire_mb": round(wire_mb, 1),
        "device_wire_s": round(wire_s, 3),
        "device_model_mbins_s": round(mbins_s, 1),
        "device_colocated_mbins_s": round(dense_mbins_s, 1),
        "device_bins": bins_dev,
        "bins": st.total_bins,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
