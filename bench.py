"""Headline benchmark: full-resolution stereo-pair LightGlue matching.

Protocol mirrors the reference's published notebook benchmark
(SURVEY.md §6: LightGlue full stereo pair, tiled, HIGH quality =
16.0 s end-to-end on the authors' CUDA box): one 6012x4008 stereo
pair, HIGH quality, 2x2 tile grid with overlap, 4096 keypoints/tile,
geometric verification included. We run EXHAUSTIVE tile pairing
(16 tile pairs — a strict superset of the reference's preselected
subset) and still report wall time per pair.

Honesty of the timed path (VERDICT.md round-1 weak #2): official
pretrained checkpoints are unavailable here (no network); weight-less
matchers default to the committed self-trained checkpoints
(weights/*.npz). The pair is the reference benchmark's OWN cam1/cam2
epoch-0 stereo pair (upscaled from the bundled downscaled assets back
to the 6012x4008 px protocol resolution — all device shapes are
static, so the compute is identical to true full-res), and the
matcher runs with filter_threshold=0 (a compare against a constant
inside the same fused program — identical compute to production).
This makes RANSAC geometric verification, inlier compaction, and host
match assembly all run for real inside the measurement, like the
reference's 16.0 s did. The run aborts rather than report a number if
putative matches or GV inliers are zero.

Prints the JSON result line {"metric", "value", "unit", "vs_baseline", ...}
IMMEDIATELY after the headline measurement, then RE-PRINTS an updated
line after every secondary section (the driver parses the LAST line).
vs_baseline > 1 means faster than the reference.

Budget discipline (VERDICT r3 weak #1: rc=124 destroyed all round-3
evidence): a global deadline (ICEPY4D_BENCH_DEADLINE_S, default 840 s),
a SIGALRM budget per section, a tunnel-liveness probe between sections,
a SIGTERM handler that emits the current JSON before dying, and a
watchdog thread that force-emits + exits if the main thread is stuck
in a C++ RPC past the deadline (SIGALRM cannot interrupt those).
"""

import json
import os
import signal
import sys
import threading
import time
from contextlib import contextmanager
from pathlib import Path

import numpy as np

REF_SECONDS = 16.0  # notebooks/matching.ipynb: "Function match took 16.0027"

_START = time.monotonic()
# 19 min: r02's full bench (comparable work) finished inside the
# driver's budget, r03's ~16+ min of COLD compiles did not — but every
# section now re-emits the JSON line incrementally, so even an external
# kill preserves the numbers measured so far
DEADLINE_S = float(os.environ.get("ICEPY4D_BENCH_DEADLINE_S", "1140"))

RESULT: dict = {
    "metric": "lightglue_fullres_pair_match",
    "value": None,
    "unit": "s/pair (6012x4008, 2x2 tiles exhaustive, 4096 kpts, GV)",
    "vs_baseline": None,
}


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _START)


def emit() -> None:
    sys.stdout.write(json.dumps(RESULT) + "\n")
    sys.stdout.flush()


class SectionTimeout(Exception):
    pass


@contextmanager
def _alarm(seconds: float):
    """Raise SectionTimeout in the main thread after `seconds`."""
    if seconds <= 0:
        raise SectionTimeout("no budget left")

    def handler(signum, frame):
        raise SectionTimeout()

    old = signal.signal(signal.SIGALRM, handler)
    signal.setitimer(signal.ITIMER_REAL, seconds)
    try:
        yield
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        signal.signal(signal.SIGALRM, old)


def _install_exit_guards() -> None:
    """SIGTERM/SIGINT emit the current JSON before dying, and a daemon
    watchdog force-exits (emitting) if the main thread is wedged in a
    C++ call that SIGALRM cannot interrupt."""

    def on_term(signum, frame):
        RESULT["terminated"] = f"signal {signum}"
        emit()
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    def watchdog():
        while True:
            time.sleep(5.0)
            if _remaining() < -45.0:
                RESULT["terminated"] = "watchdog: deadline + 45s"
                emit()
                os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()


def section(name: str, fn, budget_s: float, min_s: float = 25.0) -> None:
    """Run one fault-isolated section: skip when the remaining global
    budget or the tunnel is gone, bound it with SIGALRM, fold its
    fields (or <name>_error / <name>_skipped) into RESULT, re-emit."""
    t = min(budget_s, _remaining() - 20.0)
    if t < min_s:
        RESULT[f"{name}_skipped"] = f"deadline ({_remaining():.0f}s left)"
        emit()
        return
    if not _tpu_tunnel_alive():
        RESULT[f"{name}_skipped"] = "tunnel dead"
        emit()
        return
    t0 = time.monotonic()
    try:
        with _alarm(t):
            out = fn()
        RESULT.update(out)
    except SectionTimeout:
        RESULT[f"{name}_error"] = f"timeout after {t:.0f}s"
    except Exception as e:  # noqa: BLE001
        print(f"[bench] {name} failed: {e!r}", file=sys.stderr)
        RESULT[f"{name}_error"] = str(e)[:200]
    RESULT[f"{name}_s"] = round(time.monotonic() - t0, 1)
    emit()


def load_pair():
    """The reference benchmark's own stereo pair (cam1/cam2, epoch 0 —
    `notebooks/matching.ipynb` matched exactly these images in 16.0 s),
    restored to the full 6012x4008 px workload. The bundled assets are
    downscaled copies, so upscaling changes image content sharpness but
    not the benchmarked compute: every device shape (tiles, keypoint
    buckets, assignment matrices) is static in resolution, and the
    matcher finds thousands of real wide-baseline correspondences on
    the upscaled pair (the run aborts if it does not)."""
    import cv2

    root = Path("/root/reference/assets/img")
    imgs = []
    for cam in ("cam1", "cam2"):
        p = sorted((root / cam).glob("*"))[0]
        g = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        imgs.append(cv2.resize(g, (6012, 4008),
                               interpolation=cv2.INTER_CUBIC))
    return imgs[0], imgs[1]


_TUNNEL_VERIFIED = False


def _tpu_tunnel_alive() -> bool:
    """Fail fast instead of hanging: when the axon relay is dead
    (ports closed, /root/.tpu_init.py gone), jax.devices() blocks
    FOREVER. Probe the relay's loopback ports before importing any
    device code. Override with ICEPY4D_BENCH_SKIP_TUNNEL_CHECK=1.

    A port accepting TCP is NOT enough (r4 incident: relay process
    alive, all ports open, yet jax.devices() hung for the full 19-min
    budget — the remote end was unresponsive). The first call therefore
    also runs `jax.devices()` + a tiny round trip in a THROWAWAY
    SUBPROCESS under a hard timeout: if that child hangs it is killed
    and we report dead, having spent seconds instead of the budget.
    Later calls (between sections, same process) keep the cheap
    port-only probe — the main process by then holds the device, and a
    second device-holding child would itself block."""
    import os
    import socket
    import subprocess

    global _TUNNEL_VERIFIED
    if os.environ.get("ICEPY4D_BENCH_SKIP_TUNNEL_CHECK"):
        return True
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat not in ("", "axon"):
        return True  # explicitly not running through the tunnel
    # generous timeouts: a loaded 1-CPU host can take seconds to even
    # complete a loopback connect, and the throwaway device probe pays
    # a full backend init — r5 incident: a 2 s connect timeout under
    # CPU contention declared a LIVE tunnel dead and nulled a bench run
    port_open = False
    for port in (8082, 8083, 8087, 8092, 8093, 8097,
                 8102, 8103, 8107, 8112, 8113, 8117):
        try:
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=10):
                port_open = True
                break
        except OSError:
            continue
    if not port_open:
        return False
    if _TUNNEL_VERIFIED:
        return True
    # RETRY the device probe (r5 incident: right after container start
    # the relay accepts TCP but the first backend init can exceed even a
    # 300 s timeout; a minute later the same probe takes 6 s — a single
    # transient failure must not null the whole bench run)
    timeout_s = float(os.environ.get(
        "ICEPY4D_BENCH_PROBE_TIMEOUT_S", "300"))
    global DEADLINE_S
    for attempt in range(3):
        t0 = time.monotonic()
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, numpy as np; jax.devices(); "
                 "np.asarray(jax.device_put(np.ones(8, np.float32)))"],
                timeout=timeout_s, check=True, capture_output=True)
            _TUNNEL_VERIFIED = True
            return True
        except Exception as e:  # noqa: BLE001  (timeout, crash)
            print(f"[bench] tunnel probe attempt {attempt + 1} failed: "
                  f"{type(e).__name__}", file=sys.stderr)
            # credit the wasted wait back to the measurement budget
            # (capped): a fresh container's first relay transfer can
            # take >300 s; that warm-up must not starve the sections
            # (r5 incident: attempt 1 timed out, attempt 2 passed, and
            # real_geometry later got 66 s of its 420 s budget)
            waste = time.monotonic() - t0
            credit = min(waste, 900.0 - (DEADLINE_S - float(
                os.environ.get("ICEPY4D_BENCH_DEADLINE_S", "1140"))))
            if credit > 0:
                DEADLINE_S += credit
                RESULT["deadline_extended_s"] = round(
                    DEADLINE_S - float(os.environ.get(
                        "ICEPY4D_BENCH_DEADLINE_S", "1140")), 1)
            if _remaining() < timeout_s + 60.0:
                break
            time.sleep(10.0)
    return False


def main() -> None:
    _install_exit_guards()
    if not _tpu_tunnel_alive():
        RESULT["error"] = ("axon TPU tunnel dead (relay ports closed); "
                           "refusing to hang on jax.devices()")
        emit()
        sys.exit(1)
    try:
        # the headline is THE driver-visible number: give it the lion's
        # share (r4 lesson: a cold full-res compile through the tunnel
        # took ~270 s by itself and a 330 s alarm cut the timed runs)
        with _alarm(min(500.0, _remaining() - 90.0)):
            headline()
    except SectionTimeout:
        RESULT["error"] = "headline timeout"
    except Exception as e:  # noqa: BLE001
        print(f"[bench] headline failed: {e!r}", file=sys.stderr)
        RESULT["error"] = str(e)[:200]
    emit()  # the headline line exists from here on, whatever happens next

    # secondary sections, most-valuable first; each re-emits the full
    # (growing) JSON line so the driver's last-line parse always wins.
    #
    # Round-5 budget arithmetic fix (VERDICT r4 weak #1: section budgets
    # summed to ~1.5x the global deadline, so the epochs/min sections
    # were structurally starved): device/matcher reuse the headline's
    # compiled programs (seconds each); pipeline_fullres ALSO reuses
    # them (same matcher config) and, with the round-5 seeded-tracking
    # program reuse, epochs 1+ add no compiles — its warm epochs/min is
    # THE north-star number, so it runs before everything else;
    # real_geometry (parity evidence) pays the cold SIFT compiles;
    # dense_sweep (one compile) runs on what remains. Worst-case sum:
    # 500 + 60 + 60 + 240 + 420 + 90 = 1370 caps, but each section is
    # additionally clipped to the remaining global budget and typical
    # costs are ~150+7+7+150+350+60 = 730 s, inside the 1140 s deadline.
    # (The old downscaled pipeline_epochs section is gone: it re-paid
    # every compile at downscaled shapes to measure a workload the
    # full-res + real-season sections now cover.)
    section("device_step", bench_device_step, 60.0, min_s=15.0)
    section("matcher_step", bench_matcher_step, 60.0, min_s=15.0)
    section("pipeline_fullres", bench_pipeline_fullres, 240.0, min_s=100.0)
    # real_geometry is the parity-evidence section (epochs ok + BA RMSE
    # on the real season): epoch 0's cold SIFT compiles cost minutes
    # through the tunnel, so it gets the biggest budget
    section("real_geometry", bench_real_geometry, 420.0)
    section("dense_sweep", bench_dense_sweep, 90.0)


# headline() stashes its warm matcher + pair here so the MFU sections
# can time the ALREADY-COMPILED production programs instead of paying
# their own cold compiles (a single extra compile costs 1-4 min through
# the remote tunnel; r4 measurement: compile requests queue serially in
# the remote compile service, so there is no parallel-warm shortcut —
# one serial end-to-end cold run IS the cheapest full warmup)
_HL: dict = {}


def _probe_link() -> float:
    """Host<->device bandwidth of the tunnel, measured with a 2 MB
    round trip (device_put + full read back — no compiled program
    involved). Context for run-to-run variance: the tunnel link has
    been observed anywhere between ~0.1 and ~100 MB/s — the small
    buffer bounds the probe's own cost on a stalled link (r5 incident:
    a 16 MB probe at 0.1 MB/s ate ~320 s of the headline budget; the
    headline's own resident-vs-upload decomposition is the
    authoritative link number anyway). Returns MB/s (and emits it —
    the r4 field name said mbps; the unit always was megaBYTES/s)."""
    import jax

    buf = np.zeros((1 << 19,), np.float32)  # 2 MB
    t0 = time.perf_counter()
    dev = jax.device_put(buf)
    np.asarray(dev)
    dt = time.perf_counter() - t0
    mbps = 2 * 2.0 / dt
    RESULT["link_MBps_roundtrip"] = round(mbps, 1)
    return mbps


def headline() -> None:
    """Fills RESULT with the headline pair-match measurement."""
    from icepy4d_tpu.matching import (
        GeometricVerification,
        LightGlueMatcher,
        Quality,
        TileSelection,
    )

    link_mbps = 0.0
    try:
        link_mbps = _probe_link()
    except Exception:  # noqa: BLE001
        pass

    img0, img1 = load_pair()
    matcher = LightGlueMatcher(
        {"max_keypoints": 4096, "filter_threshold": 0.0})

    kwargs = dict(
        quality=Quality.HIGH,
        tile_selection=TileSelection.EXHAUSTIVE,
        grid=[2, 2],
        overlap=200,
        threshold=2.0,
        geometric_verification=GeometricVerification.JAX_RANSAC,
    )

    # end-to-end cold run = the full compile warmup — retry once:
    # remote-TPU compile services occasionally drop a connection
    # mid-stream
    t0 = time.perf_counter()
    for attempt in range(2):
        try:
            matcher.match(img0, img1, **kwargs)
            break
        except Exception:
            if attempt:
                raise
            time.sleep(5.0)
    RESULT["cold_s"] = round(time.perf_counter() - t0, 1)
    _HL.update(matcher=matcher, img0=img0, img1=img1, kwargs=kwargs)

    # adaptive timed loop: min-of-N, but NEVER let run k+1 start unless
    # there's headroom for it (a cold compile can eat most of the alarm
    # budget; one finished timed run beats an alarm mid-run-3) — and
    # commit a provisional result after every run so even an alarm
    # leaves the best-so-far in RESULT
    times, gv_times = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        matcher.match(img0, img1, **kwargs)
        times.append(time.perf_counter() - t0)
        gv_times.append(matcher.timer.times.get(
            "geometric_verification", 0.0))
        RESULT["value"] = round(min(times), 3)
        RESULT["vs_baseline"] = round(REF_SECONDS / min(times), 2)
        if _remaining() < 90.0 + 1.5 * times[-1]:
            break
    best = min(times)
    i_best = times.index(best)

    putative = int(len(matcher.inlier_mask))
    inliers = int(matcher.inlier_mask.sum())
    gv_s = float(gv_times[i_best])
    if putative == 0 or inliers == 0 or gv_s <= 0.0:
        raise RuntimeError(
            f"bench not end-to-end: putative={putative} "
            f"inliers={inliers} gv_s={gv_s}")

    RESULT.update({
        "value": round(best, 3),
        "vs_baseline": round(REF_SECONDS / best, 2),
        "putative_matches": putative,
        "inliers": inliers,
        "gv_s": round(gv_s, 4),
    })

    # host/link/device decomposition (VERDICT r4 next #4): every timed
    # run re-uploads both full-res frames; through the remote tunnel
    # that transfer is a hard floor on `value`. A resident-frame run
    # (frames device_put in advance — what a co-located host sees)
    # times the same compiled programs without the upload; the
    # difference is the measured link share of the headline.
    import jax

    dev0, dev1 = jax.device_put(img0), jax.device_put(img1)
    rts = []
    for _ in range(2):
        t0 = time.perf_counter()
        matcher.match(dev0, dev1, **kwargs)
        rts.append(time.perf_counter() - t0)
    resident = min(rts)
    up_mb = (img0.nbytes + img1.nbytes) / 1e6
    RESULT.update({
        "value_resident_frames_s": round(resident, 3),
        "headline_link_s": round(best - resident, 3),
        "frame_upload_MB": round(up_mb, 1),
        "frame_upload_s_at_link": (round(up_mb / link_mbps, 2)
                                   if link_mbps else None),
    })


def _lowered_flops(fn, *args, fallback: float = 0.0) -> float:
    """FLOPs from jax's LOCAL HLO cost analysis of a lowered (never
    compiled, never dispatched) program — the remote compile service is
    not involved, so this costs CPU-seconds, not tunnel-minutes.
    Falls back to the model's analytic count when the axon client can't
    analyse (r4 measurement: it can't) or when the program scans over
    stacked layers (XLA counts a lax.scan body ONCE, ignoring the trip
    count — probe-verified; the analytic formulas are pinned against
    the CPU cost analysis in tests/test_flops.py)."""
    import jax

    try:
        got = float(jax.jit(fn).lower(*args).cost_analysis()["flops"])
    except Exception:  # noqa: BLE001
        got = 0.0
    return max(got, fallback)


def _headline_state():
    if "matcher" not in _HL:
        raise RuntimeError("headline did not complete; no warm state")
    import jax.numpy as jnp

    from icepy4d_tpu.matching.matchers import _preprocess
    from icepy4d_tpu.matching.tiling import Tiler

    m = _HL["matcher"]
    img0 = _HL["img0"]
    g0 = _preprocess(jnp.asarray(img0), "high")
    tiler = Tiler(grid=[2, 2], overlap=200, origin=[0, 0])
    tiler.compute_limits_by_grid(np.empty(img0.shape[:2]))
    th, tw = tiler.tile_size
    return m, g0, tiler.tile_origins(), th, tw


def bench_device_step():
    """Extraction step time + MFU (VERDICT round-1 weak #3: wall-clock
    alone hides the host link). Times the HEADLINE's own already-
    compiled full-res extraction program (fused tile gather + SuperPoint
    over the 4-tile HIGH-quality batch — the production path, not a
    synthetic probe), synced by a small host read; FLOPs from the local
    HLO cost analysis of the same computation. MFU against v5e bf16
    peak (197 TFLOP/s)."""
    import jax
    import jax.numpy as jnp

    m, g0, origins, th, tw = _headline_state()

    def run_sync():
        out = m._extract_tiled(g0, origins, th, tw, 4096)
        # block_until_ready does not reliably block through the remote
        # tunnel; a small host read of the scores is a hard sync
        return float(np.asarray(out["scores"]).sum())

    run_sync()  # already compiled by the headline; warms caches only
    sp = m._superpoint(4096)
    t = len(origins)
    flops = _lowered_flops(
        lambda p, x: sp.extract(p, x), m._sp_params,
        jax.ShapeDtypeStruct((t, th, tw), jnp.float32),
        fallback=sp.extract_flops(th, tw, batch=t))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run_sync()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    out = {"device_extract_s_4tiles": round(dt, 4)}
    if flops:
        out["extract_tflops"] = round(flops / 1e12, 2)
        out["extract_mfu_pct"] = round(100.0 * flops / dt / 197e12, 2)
    return out


def bench_matcher_step():
    """LightGlue forward + MFU (VERDICT r2 weak #4 asked for matcher
    MFU, not just extraction): the HEADLINE's own already-compiled
    fused gather+match program over the EXHAUSTIVE 16-pair x 4096-kpt
    batch, timed via a small host read; FLOPs from the local HLO cost
    analysis of the matcher forward on the same shapes."""
    import jax
    import jax.numpy as jnp

    m, g0, origins, th, tw = _headline_state()
    feats = m._extract_tiled(g0, origins, th, tw, 4096)
    t = len(origins)
    pairs = [(a, b) for a in range(t) for b in range(t)]
    idx0 = np.asarray([a for a, _ in pairs], np.int32)
    idx1 = np.asarray([b for _, b in pairs], np.int32)
    pv = np.ones(len(pairs), bool)

    def run_sync():
        out = m._match_pair_batch(
            feats, feats, idx0, idx1, pv, (tw, th), (tw, th))
        return int(np.asarray(out["matches0"][:, :64]).sum())

    run_sync()
    p, k, d = len(pairs), 4096, m.descriptor_dim
    sd = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
    data = {
        "kpts0": sd(p, k, 2), "kpts1": sd(p, k, 2),
        "desc0": sd(p, k, d), "desc1": sd(p, k, d),
        "mask0": jax.ShapeDtypeStruct((p, k), jnp.bool_),
        "mask1": jax.ShapeDtypeStruct((p, k), jnp.bool_),
        "size0": sd(p, 2), "size1": sd(p, 2),
    }
    flops = _lowered_flops(
        lambda pr, x: m.matcher.match(pr, x), m._matcher_params, data,
        fallback=m.matcher.match_flops(p, k, k))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run_sync()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    out = {"matcher_fwd_s_16x4096": round(dt, 4)}
    if flops:
        out["matcher_fwd_tflops"] = round(flops / 1e12, 2)
        out["matcher_mfu_pct"] = round(100.0 * flops / dt / 197e12, 2)
    return out


def bench_dense_sweep():
    """Dense reconstruction core: rectified disparity sweep over
    2000x3008 px x 96 hypotheses (7x7 ZNCC, subpixel, uniqueness) —
    the Metashape buildDepthMaps replacement's hot loop, on the
    PRODUCTION path (the Pallas stripe kernel on TPU: the hypothesis
    loop runs VMEM-resident — ops/pallas_sweep.py).

    Roofline honesty (VERDICT r4 weak #4 + ADVICE r4): the r4 number
    divided the XLA cost model's pre-fusion 'bytes accessed' by wall
    time — not a measurement of anything. The kernel's true HBM
    traffic is just inputs-once + 4 output maps (the whole point of
    the stripe design), reported below from the ACTUAL array sizes as
    dense_sweep_hbm_MB. The op is VPU-compute-bound, not HBM-bound:
    wall time is the metric that matters, so it is the headline field,
    with the old fused-XLA loop timed alongside for the speedup claim.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from icepy4d_tpu.ops.dense import _disparity_sweep, disparity_sweep

    h, w, nd = 2000, 3008, 96
    rng = np.random.default_rng(0)
    I0 = jax.device_put(jnp.asarray(rng.uniform(size=(h, w)), jnp.float32))
    I1 = jax.device_put(jnp.asarray(rng.uniform(size=(h, w)), jnp.float32))
    # two dispatches: the sweep (jit boundary MATERIALIZES all four
    # output maps, like production consumers need) + an on-device
    # reduction whose scalar is the host sync. Reading a full map would
    # time the 50 MB/s link; an in-jit sum would let XLA dead-code the
    # unread outputs — both dishonest.
    fn = jax.jit(lambda a, b: disparity_sweep(a, b, -40.0, 40.0, nd, 7))
    fx = jax.jit(lambda a, b: _disparity_sweep(
        a, b, jnp.float32(-40.0), jnp.float32(40.0), 64, nd, 7))
    red = jax.jit(lambda d: d["cost"].sum() + d["disparity"].sum())

    def time_sync(f):
        float(np.asarray(red(f(I0, I1))))  # compile + warm
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(red(f(I0, I1))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = time_sync(fn)
    out = {"dense_sweep_ms_2000x3008x96": round(dt * 1000, 1)}
    out["dense_sweep_gdisp_px_per_s"] = round(h * w * nd / dt / 1e9, 2)
    # true HBM footprint of the stripe kernel: 2 padded inputs read
    # once + 4 f32 output maps (measured array sizes, not a cost model)
    hbm_bytes = (2 + 4) * h * w * 4.0
    out["dense_sweep_hbm_MB"] = round(hbm_bytes / 1e6, 1)
    out["dense_sweep_hbm_pct_of_wall"] = round(
        100.0 * hbm_bytes / dt / 819e9, 2)
    if _remaining() > 60.0:
        dt_x = time_sync(fx)
        out["dense_sweep_xla_ms"] = round(dt_x * 1000, 1)
        out["dense_sweep_kernel_speedup"] = round(dt_x / dt, 2)
    return out


def bench_real_geometry():
    """Capability metric (VERDICT r2 missing #1): the REAL 4-epoch
    Belvedere season with the parameter-free SIFT matcher — every epoch
    must yield >=100 putative matches, >=50 GV inliers and (where BA
    ran) a finite RMSE. No pretrained weights involved."""
    import shutil
    import tempfile

    import numpy as np

    from icepy4d_tpu import Pipeline
    from icepy4d_tpu.utils.config import DotDict

    assets = Path("/root/reference/assets")
    out = Path(tempfile.mkdtemp(prefix="bench_real_"))
    cfg = DotDict.wrap({
        "paths": {"image_dir": str(assets / "img"),
                  "calibration_dir": str(assets / "calib"),
                  "results_dir": str(out)},
        "proc": {"epoch_to_process": [0, 1, 2, 3], "do_tracking": True,
                 "do_ba": True, "save_checkpoints": False,
                 "load_existing_results": False},
        "georef": {
            "camera_centers_world": np.array(
                [[151.962, 99.065, 91.643],
                 [309.261, 301.051, 135.008]], np.float32),
            "target_dir": str(assets / "targets"),
            "target_file_ext": ".csv",
            "target_world_file": "target_world.csv",
            "targets_to_use": ["F2", "F12", "F13"],
        },
        "other": {"pydegensac_threshold": 2.0},
        "matching": {"matcher": "sift", "quality": "high",
                     "tile_selection": "none", "max_keypoints": 16384,
                     "options": {"dual_orientation": False}},
        # parity config (BASELINE.md <= 0.5 px): Metashape's default
        # free intrinsics + its gradual-selection analogue (trim toward
        # the target accuracy, ref metashape.py:164-196)
        "ba": {"camera_location_accuracy": 0.5, "fit_f": True,
               "free_intrinsics": "metashape",
               "trim_target_rmse_px": 0.5, "trim_frac": 0.1,
               "trim_rounds": 6,
               "max_iters": 60, "min_points": 8},
    })
    try:
        pipe = Pipeline(cfg)
        # stream per-epoch stats (run(on_epoch=...)) so a SIGALRM
        # timeout preserves everything measured so far (r4 incident:
        # epoch 0's 232 s cold compile ate the section budget and all
        # 4 epochs' stats were discarded). `partial_eps` is the
        # callback accumulator; the final stats derive from it alone
        # (ADVICE r4: the old code rebound one name twice).
        partial_eps = []
        t0 = time.perf_counter()
        marks = []

        def on_epoch(e):
            partial_eps.append(e)
            marks.append(time.perf_counter() - t0)
            print(f"[real-geometry] {e.date_str}: "
                  f"{e.quality['status']} {e.quality['flags']} "
                  f"{e.quality['stats']}", file=sys.stderr)
            done = [x.quality["stats"] for x in partial_eps]
            partial_rmses = [s["ba_rmse_px"] for s in done
                             if "ba_rmse_px" in s]
            RESULT.update({
                "real_epochs_done": len(partial_eps),
                "real_epochs_ok": sum(
                    x.quality["status"] != "failed" for x in partial_eps),
                "real_max_ba_rmse_px": (round(max(partial_rmses), 3)
                                        if partial_rmses else None),
            })
            if len(marks) > 1:
                # warm rate: epochs 1+ reuse every epoch-0 compile
                # (tracking included — the round-5 program-reuse fix),
                # so this IS the steady-state real-season throughput
                RESULT["real_epochs_per_min_warm"] = round(
                    (len(marks) - 1) * 60.0 / (marks[-1] - marks[0]), 2)
            emit()

        pipe.run(on_epoch=on_epoch)
        stats = [e.quality["stats"] for e in partial_eps]
        rmses = [s["ba_rmse_px"] for s in stats if "ba_rmse_px" in s]
        return {
            "real_min_putative": min(s.get("n_putative", 0)
                                     for s in stats),
            "real_min_gv_matches": min(s.get("n_matches", 0)
                                       for s in stats),
            "real_min_orientation_inliers": min(
                s.get("n_orientation_inliers", 0) for s in stats),
            "real_epochs_with_finite_ba": len(rmses),
            "real_max_ba_rmse_px": (round(max(rmses), 3)
                                    if rmses else None),
            "real_epochs_ok": sum(
                e.quality["status"] != "failed" for e in partial_eps),
            "real_epoch_s": [round(d, 1) for d in
                             np.diff(np.concatenate([[0.0], marks]))],
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def bench_pipeline_fullres():
    """The honest north-star workload (VERDICT r2 weak #3): a synthetic
    season of FULL-RES 6012x4008 epochs (roll-shifted, like the
    headline pair bench) through the complete per-epoch path.
    BASELINE.md north star: >= 20 epochs/min (set for v5e-8; this is
    the one-chip number).

    ONE run of 3 epochs (r5 restructure): the matcher config equals the
    headline's, so epoch 0 reuses its compiled extract/match/GV programs
    and pays only the small geometry/BA compiles; the seeded tracking
    at epoch 1+ reuses the pair-match programs (tracking.py). The warm
    rate therefore comes from epochs 1-2 of the same run — no second
    season run re-measuring what is already warm."""
    import shutil
    import tempfile

    import cv2
    import numpy as np

    from icepy4d_tpu import Pipeline
    from icepy4d_tpu.utils.config import DotDict

    img0, img1 = load_pair()
    root = Path(tempfile.mkdtemp(prefix="bench_fullres_"))
    out = root / "res"
    n_epochs = 3
    ts0 = 1_650_000_000
    import os

    for cam, img in (("cam1", img0), ("cam2", img1)):
        d = root / "img" / cam
        d.mkdir(parents=True)
        for e in range(n_epochs):
            p = d / f"IMG_{e:03d}.jpg"
            cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 92])
            os.utime(p, (ts0 + e * 3600, ts0 + e * 3600))
    (root / "calib").mkdir()
    for cam in ("cam1", "cam2"):
        shutil.copy(Path("/root/reference/assets/calib") / f"{cam}.txt",
                    root / "calib" / f"{cam}.txt")

    cfg = DotDict.wrap({
        "paths": {"image_dir": str(root / "img"),
                  "calibration_dir": str(root / "calib"),
                  "results_dir": str(out)},
        "proc": {"epoch_to_process": "all", "do_tracking": True,
                 "do_ba": True, "save_checkpoints": True,
                 "load_existing_results": False,
                 "use_mtime_fallback": True,
                 # throughput section (see bench_pipeline_epochs note)
                 "do_recovery": False},
        "georef": {
            "camera_centers_world": np.array(
                [[151.962, 99.065, 91.643],
                 [309.261, 301.051, 135.008]], np.float32),
        },
        "other": {"pydegensac_threshold": 2.0},
        # jax_ransac: the SAME GV program the headline section already
        # compiled and timed — the pipeline default (DEGENSAC) would pay
        # a fresh multi-minute tunnel compile at the full-res bucket
        # (r4 incident: a 7-min silent GV compile ate the 420 s budget)
        "matching": {"matcher": "lightglue", "quality": "high",
                     "tile_selection": "exhaustive", "grid": [2, 2],
                     "overlap": 200, "max_keypoints": 4096,
                     "geometric_verification": "jax_ransac",
                     "options": {"filter_threshold": 0.0}},
        "ba": {"camera_location_accuracy": 0.5, "fit_f": False,
               "max_iters": 30},
    })

    try:
        pipe = Pipeline(cfg)
        t0 = time.perf_counter()
        marks = []

        def on_epoch(_e):
            marks.append(time.perf_counter() - t0)
            RESULT["epochs_per_min_fullres_cold"] = round(
                len(marks) * 60.0 / marks[-1], 2)
            if len(marks) > 1:
                RESULT["epochs_per_min_fullres_warm"] = round(
                    (len(marks) - 1) * 60.0 / (marks[-1] - marks[0]), 2)
            emit()  # a timeout later still keeps this partial rate

        pipe.run(on_epoch=on_epoch)
        warm = ((len(marks) - 1) * 60.0 / (marks[-1] - marks[0])
                if len(marks) > 1 else None)
        return {"epochs_per_min_fullres_warm": (round(warm, 2)
                                                if warm else None),
                "fullres_epoch_s": [round(d, 1) for d in
                                    np.diff(np.concatenate([[0.0],
                                                            marks]))],
                # ADVICE r4: this section pins GV to jax_ransac (the
                # headline's already-compiled program) — say so in the
                # JSON so cross-round comparisons see the workload
                "fullres_gv": "jax_ransac"}
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).parent))
    main()
