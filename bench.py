"""Benchmark harness — BASELINE.json's five configs on the local device.

Headline metric (printed as the final JSON line, driver contract):
256x256 Stage-III sampling throughput, images/sec/chip. The reference
publishes no throughput (BASELINE.md), so round 1 of this harness
*established* the baseline (1187 img/s/chip, TPU v5e, batch 16);
``vs_baseline`` is measured against that number.

Usage: python bench.py [--quick] [--all]
  --quick : tiny dims, few iters (CI smoke)
  --all   : also run configs #1/#2/#3/#5 and report them in "extras"

Deadline contract (VERDICT r4 weak #1 — BENCH_r04.json was rc=124 with
no parseable line because a machine reset wiped the compile cache and the
cold run out-waited the driver's timeout): the headline is measured FIRST;
the moment it exists the JSON payload is registered and guaranteed to
print — on normal completion, on SIGTERM/SIGALRM/SIGINT, or when the
wall-clock budget (``OBJGAN_BENCH_BUDGET_S``, default 1200 s for the
driver's plain ``python bench.py``; 7200 s when any flag is passed)
expires via a watchdog thread that fires even if the main thread is
wedged in a C call. Every later phase is gated on the remaining budget
using cost estimates scaled by the OBSERVED headline compile time, so a
cold-cache run keeps the phases it can afford and defers the rest
(extras["deferred_phases"]).

Log contract (VERDICT r4 weak #2): full (non --quick) runs tee their
entire stdout+stderr at the fd level into docs/shakedown/bench_logs/
inside the repo (override path with OBJGAN_BENCH_LOG; "0" disables), so
the raw evidence behind BASELINE.md tables survives /tmp wipes and gets
committed with the round snapshot.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compile cache (same location as cli.py): repeat bench runs and
# A/B sweeps skip the minutes-per-program remote TPU compiles
if jax.config.jax_compilation_cache_dir is None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OBJGAN_COMPILE_CACHE", "/tmp/objgan_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _bench(fn, args_for, warmup=2, iters=10):
    """(fenced_median_s, pipelined_avg_s) with *distinct* inputs per call.

    Inputs MUST vary per iteration: the axon relay dedupes identical
    (executable, args) executions, which once produced a physically
    impossible 900 TFLOP/s reading. Fenced = per-call block_until_ready
    (true latency incl. host round trip); pipelined = enqueue all, fence
    once (steady-state training/sampling throughput).
    """
    for i in range(warmup):
        jax.block_until_ready(fn(*args_for(1000 + i)))
    fenced = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args_for(2000 + i)))
        fenced.append(time.perf_counter() - t0)
    fenced.sort()
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args_for(3000 + i))
    jax.block_until_ready(out)
    pipelined = (time.perf_counter() - t0) / iters
    return fenced[len(fenced) // 2], pipelined


# ---------------------------------------------------------------------------
# Deadline machinery (VERDICT r4 next #1): the one JSON line must print.
# ---------------------------------------------------------------------------

_EMIT_ONCE = [True]  # list.pop() is GIL-atomic: exactly-one-print guard
_PAYLOAD: dict = {}  # driver-contract payload; filled once headline exists


def _emit_payload(note=None):
    """Print the driver JSON line exactly once; safe from threads/handlers.

    Returns True iff THIS call printed. A no-op until the headline number
    has been registered in ``_PAYLOAD`` (an empty/fake payload would be
    worse than none). ``os.write`` to fd 1 survives ``os._exit`` and
    ignores any buffered sys.stdout state.
    """
    if not _PAYLOAD:
        return False
    try:
        _EMIT_ONCE.pop()
    except IndexError:
        return False
    payload = dict(_PAYLOAD)
    extras = payload.get("extras")
    if isinstance(extras, dict):
        snap = None
        for _ in range(4):  # snapshot may race an in-place mutation (GIL
            try:            # makes dict() near-atomic; retry the rare loss)
                snap = dict(extras)
                break
            except RuntimeError:
                continue
        extras = snap if snap is not None else {}
        if note:
            extras["partial"] = note
        payload["extras"] = extras
    os.write(1, (json.dumps(payload) + "\n").encode())
    return True


class _Deadline:
    """Wall-clock budget for the whole bench run.

    ``OBJGAN_BENCH_BUDGET_S`` overrides; the default is 1200 s for the
    driver's plain ``python bench.py`` (safely under its end-of-round
    timeout — r4's cold run was killed still compiling at >=16 min) and
    7200 s when any CLI flag is present (A/B probes and --breakdown runs
    manage their own shell timeouts and must not be truncated).
    """

    def __init__(self, default_budget_s):
        self.t0 = time.monotonic()
        self.budget = float(
            os.environ.get("OBJGAN_BENCH_BUDGET_S", str(default_budget_s)))
        self.margin = float(os.environ.get("OBJGAN_BENCH_MARGIN_S", "60"))
        self.compile_est = 20.0  # refined after the observed headline compile

    def remaining(self):
        return self.budget - (time.monotonic() - self.t0)

    def allows(self, est_s):
        return self.remaining() - self.margin > est_s


def _phase(deadline, extras, name, est_s, fn):
    """Run one optional bench phase under the budget.

    Skips (recording extras['deferred_phases']) when the remaining budget
    cannot cover the estimate; converts a phase crash into
    extras['<name>_error'] so the already-armed headline line still prints
    with rc=0 — a lost extra beats a lost round artifact.
    """
    if not deadline.allows(est_s):
        extras.setdefault("deferred_phases", []).append(name)
        print(f"bench: deferring phase {name} (est {est_s:.0f}s, "
              f"remaining {deadline.remaining():.0f}s of "
              f"{deadline.budget:.0f}s budget)", file=sys.stderr, flush=True)
        return False
    try:
        fn()
        return True
    except Exception as e:  # headline must survive a broken extra phase
        extras[name + "_error"] = repr(e)[:200]
        print(f"bench: phase {name} failed: {e!r}", file=sys.stderr,
              flush=True)
        return False


def _arm_deadline_printer(deadline):
    """Once the headline exists: guarantee the JSON line gets printed.

    Two independent paths:
    - signal handlers — SIGTERM (driver/shell timeout), SIGALRM, SIGINT
      print the partial payload, thaw any SIGSTOPped shakedown tree, and
      exit 0;
    - a daemon watchdog thread — fires when the budget expires even if
      the main thread is wedged inside a C call (the lost-relay-RPC hang,
      CLAUDE.md) where Python signal handlers cannot run.
    """
    import signal
    import threading

    def finish(note):
        _emit_payload(note)
        resume = getattr(_exclusive_chip, "_resume", None)
        if resume is not None:
            resume()  # os._exit skips atexit: thaw the shakedown ourselves
        os._exit(0)

    def handler(signum, frame):
        finish(f"signal {signum} with {deadline.remaining():.0f}s budget "
               "left")

    for sig in (signal.SIGTERM, signal.SIGALRM, signal.SIGINT):
        signal.signal(sig, handler)

    def watch():
        while True:
            rem = deadline.remaining()
            if rem <= 2.0:
                finish("budget exhausted")
            time.sleep(min(max(rem / 2.0, 0.5), 10.0))

    threading.Thread(target=watch, daemon=True,
                     name="bench-budget-watchdog").start()


def _tee_output(path):
    """Mirror ALL bench stdout+stderr (fd-level) into a repo log file.

    VERDICT r4 weak #2: the r4 headline table's raw logs lived in /tmp and
    a machine reset wiped them. Full runs now tee themselves into
    docs/shakedown/bench_logs/ so the end-of-round snapshot commit
    preserves the evidence. dup2 over fds 1/2 captures child processes
    and C-level writes too; the JSON contract line still reaches the real
    stdout through ``tee``.
    """
    import subprocess

    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tee = subprocess.Popen(["tee", path], stdin=subprocess.PIPE)
        os.dup2(tee.stdin.fileno(), 1)
        os.dup2(tee.stdin.fileno(), 2)
        return path
    except Exception as e:
        print(f"bench: log tee disabled ({e!r})", file=sys.stderr,
              flush=True)
        return None


def _exclusive_chip(pidfiles=None):
    """Single-chip timing integrity: pause any live shakedown for the bench.

    The quality-curve recipe (docs/shakedown/run_phases_r3b.sh under
    watchdog_r3.py) can hold the one TPU chip for hours; a bench that runs
    concurrently measures relay queueing, not the step. If the recipe's
    pid files point at live processes, SIGSTOP the whole tree — watchdog
    first, so it can neither stall-kill the frozen trainer nor relaunch —
    and SIGCONT it in reverse on exit: pause, never kill. A blocking flock
    additionally serializes concurrent bench processes (the driver's
    end-of-round bench vs docs/shakedown/post_r3b.sh) so two benches never
    interleave on the chip.
    """
    import atexit
    import fcntl
    import signal
    import subprocess

    _exclusive_chip._resume = lambda: None  # until a tree is actually paused

    if not hasattr(_exclusive_chip, "_lock"):  # idempotent within a process
        lock = open("/tmp/objgan_bench.lock", "w")
        try:
            fcntl.flock(lock, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            print("bench: waiting for /tmp/objgan_bench.lock (another "
                  "bench is mid-measurement)...", file=sys.stderr,
                  flush=True)
            fcntl.flock(lock, fcntl.LOCK_EX)
        _exclusive_chip._lock = lock  # held (and auto-dropped) until exit

    if pidfiles is None:
        pidfiles = os.environ.get(
            "OBJGAN_BENCH_PAUSE_PIDFILES", "/tmp/wd.pid:/tmp/shk3.pid"
        ).split(":")
    # Markers a genuine shakedown root's cmdline must contain: stale
    # pidfiles survive watchdog exits, and PID recycling could otherwise
    # make us SIGSTOP an unrelated process tree.
    markers = ("watchdog", "run_phases", "shakedown")
    roots = []
    for pf in pidfiles:
        try:
            pid = int(open(pf).read().strip())
            os.kill(pid, 0)
            cmdline = open(f"/proc/{pid}/cmdline", "rb").read() \
                .replace(b"\0", b" ").decode(errors="replace")
        except (OSError, ValueError):
            continue
        if not any(m in cmdline for m in markers):
            print(f"bench: ignoring stale pidfile {pf} (pid {pid} cmdline "
                  f"matches no shakedown marker)", file=sys.stderr,
                  flush=True)
            continue
        roots.append(pid)
    if not roots:
        return []

    me = os.getpid()

    def descendants(seeds):
        out = subprocess.run(["ps", "-eo", "pid,ppid"],
                             capture_output=True, text=True).stdout
        kids = {}
        for line in out.splitlines()[1:]:
            parts = line.split()
            if len(parts) == 2 and parts[0].isdigit():
                kids.setdefault(int(parts[1]), []).append(int(parts[0]))
        ordered, stack = [], list(seeds)
        while stack:
            pid = stack.pop(0)  # BFS: parents before their children
            if pid == me or pid in ordered:
                continue
            ordered.append(pid)
            stack.extend(kids.get(pid, []))
        return ordered

    stopped = []

    def stop(pids):
        n0 = len(stopped)
        for pid in pids:
            if pid in stopped:
                continue
            try:
                os.kill(pid, signal.SIGSTOP)
                stopped.append(pid)
            except OSError:
                pass
        return len(stopped) - n0

    def _resume():
        for pid in reversed(stopped):  # children first, watchdog last
            try:
                os.kill(pid, signal.SIGCONT)
            except OSError:
                pass

    _exclusive_chip._resume = _resume  # for the deadline printer's os._exit

    # Resume paths are armed BEFORE the first SIGSTOP so a signal landing
    # mid-freeze still thaws whatever was already stopped.
    atexit.register(_resume)
    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        signal.signal(sig, lambda s, f: sys.exit(128 + s))

    # Freeze to a fixed point: rescan until a pass stops no new pid.  A
    # fixed two-pass scheme leaves a race (a grandchild forked by a
    # not-yet-stopped child after the second snapshot escapes); once a
    # full rescan finds nothing new, every tree member is frozen and
    # frozen parents cannot fork.
    while stop(descendants(roots)):
        pass
    print(f"bench: paused shakedown pids {stopped} for chip exclusivity "
          f"(SIGCONT on exit)", file=sys.stderr, flush=True)

    # Deadman: atexit/signal handlers never run if this bench is
    # SIGKILLed, OOM-killed, or hangs forever on a lost relay RPC — the
    # frozen shakedown would then stay frozen permanently.  A detached
    # helper SIGCONTs the stopped pids when the bench pid disappears, or
    # after the hard deadline IF the bench's CPU clock is also frozen
    # (the repo's lost-RPC hang signature). A bench that is alive with
    # advancing CPU time is never thawed-under: a legitimately slow run
    # (cold remote-tunnel compiles are 3-8 min EACH) crossing the
    # deadline would otherwise silently lose chip exclusivity and print
    # contended numbers with no marker that anything went wrong.
    deadline_s = float(os.environ.get("OBJGAN_BENCH_DEADMAN_S", "7200"))
    poll_s = float(os.environ.get("OBJGAN_BENCH_DEADMAN_POLL_S", "10"))
    stall_s = float(os.environ.get("OBJGAN_BENCH_DEADMAN_STALL_S", "600"))
    helper = (
        "import os,signal,sys,time\n"
        "bench=int(sys.argv[1]); start=time.time()\n"
        "deadline=start+float(sys.argv[2]); poll=float(sys.argv[3])\n"
        "stall=float(sys.argv[4]); pids=[int(p) for p in sys.argv[5:]]\n"
        "def cpu():\n"
        "    f=open('/proc/%d/stat'%bench).read().rsplit(')',1)[1].split()\n"
        "    return int(f[11])+int(f[12])\n"  # utime+stime (fields 14,15)
        "last=-1; moved=time.time()\n"
        "while True:\n"
        "    try: c=cpu()\n"
        "    except OSError: break\n"  # bench exited/killed -> thaw
        "    now=time.time()\n"
        "    if c!=last: last=c; moved=now\n"
        "    if now>=deadline and now-moved>=stall: break\n"  # true hang\n"
        "    time.sleep(poll)\n"
        "for p in reversed(pids):\n"
        "    try: os.kill(p,signal.SIGCONT)\n"
        "    except OSError: pass\n"
    )
    subprocess.Popen(
        [sys.executable, "-c", helper, str(os.getpid()), str(deadline_s),
         str(poll_s), str(stall_s)] + [str(p) for p in stopped],
        start_new_session=True, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    return stopped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--analyze", action="store_true",
                    help="XLA cost analysis: achieved vs peak FLOP/s")
    ap.add_argument("--breakdown", action="store_true",
                    help="per-stage device-loop decomposition of the "
                         "sampling and train steps (utils/breakdown.py): "
                         "where the milliseconds go, stage by stage. "
                         "Compiles ~11 extra programs — minutes each on the "
                         "remote-compile TPU path the first time")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--k", type=int, default=0,
                    help="steps per execution for the sustained-train probe")
    ap.add_argument("--up_mode", default=None,
                    choices=["nearest", "subpixel"])
    ap.add_argument("--remat", default=None, choices=["none", "stages"],
                    help="GAN.REMAT override for the train-step remat A/B "
                         "(BASELINE.md round-3 roofline experiment)")
    ap.add_argument("--gf_dim", type=int, default=0,
                    help="GAN.GF_DIM override (remat-at-scale A/B: larger "
                         "models where activations exceed fusion-friendly "
                         "VMEM are remat's claimed regime)")
    ap.add_argument("--df_dim", type=int, default=0,
                    help="GAN.DF_DIM override (see --gf_dim)")
    ap.add_argument("--d_dtype", default=None,
                    choices=["float32", "compute"],
                    help="GAN.D_DTYPE override (bf16-discriminator A/B: "
                         "the train step is HBM-roofline-bound and fp32 D "
                         "trunks carry 2x the bytes)")
    ap.add_argument("--obj_paste_dtype", default=None,
                    choices=["float32", "compute"],
                    help="GAN.OBJ_PASTE_DTYPE override (256px attention-"
                         "stage A/B: paste/blend object context in compute "
                         "dtype while keeping the fp32 attention MAPS "
                         "invariant)")
    ap.add_argument("--feed", default=None,
                    help="dataset manifest: measure REAL-DATA sustained "
                         "training steps/s through the wire-format host "
                         "feed + prefetch pipeline (VERDICT r3 done-"
                         "criterion); extras get realdata_* keys")
    ap.add_argument("--no_feed", action="store_true",
                    help="skip the real-data feed measurement a full run "
                         "defaults to (A/B probes that only need the "
                         "synthetic train step)")
    ap.add_argument("--feed_classic", action="store_true",
                    help="with --feed: use the float32 classic feed instead "
                         "of the uint8 wire format (for the A/B row)")
    args = ap.parse_args()

    # The driver's end-of-round invocation is exactly `python bench.py`
    # (no flags) under a hard timeout — that run gets the tight default
    # budget. Flagged runs (A/B probes, --breakdown sweeps) manage their
    # own shell timeouts and get a loose one. Env always overrides.
    plain_run = len(sys.argv) == 1
    deadline = _Deadline(default_budget_s=1200 if plain_run else 7200)

    # Full (non-quick) runs default to the round-3 reporting surface: cost
    # analysis (roofline extras) and, when the checked-in procedural
    # manifest is present, the real-data wire-feed measurement — so the
    # driver's plain `python bench.py` records both in BENCH_r{N}.json.
    if not args.quick:
        args.analyze = True
        default_manifest = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "data_proc2k", "manifest.json")
        if args.feed is None and os.path.exists(default_manifest):
            args.feed = default_manifest
    if args.no_feed:  # wins over both the default and an explicit --feed
        args.feed = None

    # Tee full-run output into the repo (committed with the round snapshot).
    log_path = os.environ.get("OBJGAN_BENCH_LOG", "")
    if not log_path and not args.quick:
        log_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "docs", "shakedown",
            "bench_logs", time.strftime("bench_%Y%m%d_%H%M%S.log"))
    log_path = None if log_path in ("", "0") else _tee_output(log_path)

    _exclusive_chip()

    from objgan_tpu.core.config import Config, tiny_test_config
    from objgan_tpu.data.synthetic import synthetic_batch
    from objgan_tpu.train.gan import GanTrainer

    # NOTE: the headline sampling/train loops run on ONE device
    # (device_put on jax.devices()[0], no mesh) so their per-chip numbers
    # divide by 1; only the --feed path shards the batch over the mesh and
    # divides by the device count.
    n_chips = jax.device_count()
    if args.quick:
        cfg = tiny_test_config()
        batch_size = args.batch or 4
        iters = 3
    else:
        cfg = Config()
        batch_size = args.batch or 16
        iters = 10
    cfg = cfg.merged({"TRAIN": {"BATCH_SIZE": batch_size}})
    if args.up_mode:
        cfg = cfg.merged({"GAN": {"UP_MODE": args.up_mode}})
    if args.remat:
        cfg = cfg.merged({"GAN": {"REMAT": args.remat}})
    if args.gf_dim:
        cfg = cfg.merged({"GAN": {"GF_DIM": args.gf_dim}})
    if args.df_dim:
        cfg = cfg.merged({"GAN": {"DF_DIM": args.df_dim}})
    if args.d_dtype:
        cfg = cfg.merged({"GAN": {"D_DTYPE": args.d_dtype}})
    if args.obj_paste_dtype:
        cfg = cfg.merged({"GAN": {"OBJ_PASTE_DTYPE": args.obj_paste_dtype}})

    rng = jax.random.PRNGKey(0)
    trainer = GanTrainer(cfg)
    # init on CPU: dozens of small eager init programs compile in seconds
    # there, vs minutes each through a remote-compile TPU path; the only
    # on-device compiles left are the actual bench programs.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        batch = synthetic_batch(cfg, rng, batch_size)
        state = trainer.init_state(rng, batch)
    dev = jax.devices()[0]
    batch = jax.device_put(batch, dev)
    state = jax.device_put(state, dev)

    extras = {}
    if log_path:
        extras["log"] = os.path.relpath(
            log_path, os.path.dirname(os.path.abspath(__file__)))

    # distinct PRNG keys per call (see _bench docstring)
    import numpy as np

    keys = jax.device_put(
        np.stack([np.array([7, i], np.uint32) for i in range(8192)])
    )

    # ---- headline: config #4, Stage-III 256px full sampling ----
    # Measured FIRST (deadline contract). Authoritative timing: N chained
    # sampling steps inside ONE device execution (lax.fori_loop with a data
    # dependency between iterations). Per-call host timings through the
    # axon relay proved unreliable in both directions; a device-side loop
    # is immune to dispatch/dedup artifacts.
    n_loop = 4 if args.quick else 16

    @jax.jit
    def sample_loop(state, batch, key):
        def body(i, carry):
            acc, key = carry
            key, sub = jax.random.split(key)
            img = trainer.sample(state, batch, sub)["images"][-1]
            return acc + jnp.sum(img), key  # dependency chain

        acc, _ = jax.lax.fori_loop(0, n_loop, body,
                                   (jnp.float32(0.0), key))
        return acc

    t0c = time.perf_counter()
    jax.block_until_ready(sample_loop(state, batch, keys[0]))  # compile+warm
    t_first = time.perf_counter() - t0c
    cold = t_first > 60.0  # remote-tunnel compiles are 3-8 min; warm <~10s
    deadline.compile_est = max(30.0, min(t_first, 600.0)) if cold else 20.0
    extras["headline_compile_s"] = round(t_first, 1)
    extras["cold_cache"] = cold
    trials = []
    for t in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(sample_loop(state, batch, keys[1 + t]))
        trials.append((time.perf_counter() - t0) / n_loop)
    dt = min(trials)
    imgs_per_sec = batch_size / dt  # single-device loop: per-chip = /1
    extras["sampling_device_loop_ms"] = round(dt * 1e3, 3)
    extras["batch_size"] = batch_size
    extras["n_chips"] = n_chips
    extras["backend"] = jax.default_backend()

    # The headline exists: register the payload and guarantee it prints.
    # Round-1 established baseline on TPU v5e (BASELINE.md): no reference
    # throughput exists, so later rounds compare against our own r1 number.
    r1_baseline = 1187.0
    _PAYLOAD.update({
        "metric": "stage3_256px_sampling_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / r1_baseline, 4)
        if jax.default_backend() == "tpu" else 1.0,
        "extras": extras,
    })
    _arm_deadline_printer(deadline)

    # Test hook: simulate a wedged post-headline phase (hung remote compile)
    # so tests can prove the watchdog prints the partial line and exits 0.
    fake_slow = float(os.environ.get("OBJGAN_BENCH_FAKE_SLOW_S", "0"))
    if fake_slow > 0:
        print(f"bench: FAKE_SLOW sleeping {fake_slow}s (test hook)",
              file=sys.stderr, flush=True)
        time.sleep(fake_slow)

    c_est = deadline.compile_est

    def p_sampling_pipelined():
        sample = jax.jit(
            lambda s, b, r: trainer.sample(s, b, r)["images"][-1])
        lat, dt_p = _bench(sample, lambda i: (state, batch, keys[i]),
                           iters=iters)
        extras["sampling_pipelined_ms"] = round(dt_p * 1e3, 3)
        extras["sampling_latency_ms"] = round(lat * 1e3, 3)
        if args.analyze:
            # v5e peak: ~197 TFLOP/s bf16, ~819 GB/s HBM. The AOT compile
            # below hits the persistent cache (same program just ran).
            try:
                ca = sample.lower(state, batch, rng).compile() \
                    .cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                flops = float(ca.get("flops", 0.0))
                bytes_ = float(ca.get("bytes accessed", 0.0))
                extras["sampling_gflops"] = round(flops / 1e9, 2)
                extras["sampling_achieved_tflops"] = round(
                    flops / dt / 1e12, 2)
                extras["sampling_hbm_gbps"] = round(bytes_ / dt / 1e9, 1)
            except Exception as e:  # cost_analysis varies by backend
                extras["analyze_error"] = str(e)[:120]

    _phase(deadline, extras, "sampling_pipelined", c_est + 15,
           p_sampling_pipelined)

    # ---- config #5: full adversarial train step ----
    def p_train_single():
        # donated buffers (in-place state update) as in real training;
        # state is threaded through the loop since donation invalidates
        # the input, and every step gets a distinct rng (relay dedup).
        step = trainer.jitted_train_step(donate=True)
        t_state = jax.tree.map(jnp.copy, state)
        for i in range(2):  # warmup/compile
            t_state, m = step(t_state, batch, keys[100 + i])
        jax.block_until_ready(m)
        n_train = max(3, iters // 2)
        t0 = time.perf_counter()
        for i in range(n_train):
            t_state, m = step(t_state, batch, keys[200 + i])
        jax.block_until_ready(m)
        dt_train = (time.perf_counter() - t0) / n_train
        extras["train_step_ms"] = round(dt_train * 1e3, 3)
        extras["train_images_per_sec_per_chip"] = round(
            batch_size / dt_train, 3)

    _phase(deadline, extras, "train_single", 1.3 * c_est + 15,
           p_train_single)

    def p_train_sustained():
        # sustained training: K chained steps per device execution — the
        # real training configuration (TRAIN.STEPS_PER_EXECUTION=8, see
        # BASELINE.md), which amortizes host/relay dispatch out of the
        # per-step time.
        k_exec = args.k or (2 if args.quick else 8)
        multi = trainer.jitted_multi_step(donate=True)
        with jax.default_device(cpu):
            stacked = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[synthetic_batch(cfg, jax.random.fold_in(rng, 10 + i),
                                  batch_size) for i in range(k_exec)],
            )
        stacked = jax.device_put(stacked, dev)
        m_state = jax.tree.map(jnp.copy, state)
        for i in range(2):  # warmup/compile
            m_state, mm = multi(m_state, stacked, keys[300 + i])
        jax.block_until_ready(mm)
        n_multi = max(2, iters // 3)
        t0 = time.perf_counter()
        for i in range(n_multi):
            m_state, mm = multi(m_state, stacked, keys[400 + i])
        jax.block_until_ready(mm)
        dt_sust = (time.perf_counter() - t0) / (n_multi * k_exec)
        extras["train_sustained_ms"] = round(dt_sust * 1e3, 3)
        extras["train_sustained_images_per_sec_per_chip"] = round(
            batch_size / dt_sust, 3)

    _phase(deadline, extras, "train_sustained", 1.6 * c_est + 20,
           p_train_sustained)

    def p_train_analyze():
        # train-step roofline (VERDICT r2 weak #2): flops/bytes of the full
        # adversarial step vs the ~197 TFLOP/s bf16 / 819 GB/s v5e peaks —
        # the evidence for whether ~55 ms sustained is near the ceiling.
        # Runs AFTER the sustained probe: on a cold cache this no-donate
        # compile is the first phase to defer (VERDICT r4 next #1b).
        step_nodonate = trainer.jitted_train_step(donate=False)
        ca = step_nodonate.lower(state, batch, keys[0]).compile() \
            .cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
        extras["train_gflops"] = round(flops / 1e9, 2)
        extras["train_gbytes"] = round(bytes_ / 1e9, 3)
        extras["train_arith_intensity"] = round(flops / max(bytes_, 1.0), 1)
        if "train_step_ms" in extras:
            dt_train = extras["train_step_ms"] / 1e3
            extras["train_achieved_tflops"] = round(
                flops / dt_train / 1e12, 2)
            extras["train_hbm_gbps"] = round(bytes_ / dt_train / 1e9, 1)
        if "train_sustained_ms" in extras:  # sustained-roofline view
            dt_sust = extras["train_sustained_ms"] / 1e3
            extras["train_sustained_achieved_tflops"] = round(
                flops / dt_sust / 1e12, 2)
            extras["train_sustained_hbm_gbps"] = round(
                bytes_ / dt_sust / 1e9, 1)

    if args.analyze:
        _phase(deadline, extras, "train_analyze", 1.3 * c_est + 15,
               p_train_analyze)

    if args.all:
        def p_box_sample():
            from objgan_tpu.train.box import BoxTrainer

            # config #1: box LSTM sampling, single caption
            btr = BoxTrainer(cfg)
            bstate = btr.init_state(rng, synthetic_batch(cfg, rng, 2,
                                                         with_images=False))
            bs = btr.jitted_sample()
            one = synthetic_batch(cfg, rng, 1, with_images=False)
            _, dt_box = _bench(
                bs, lambda i: (bstate, one["captions"], one["cap_lens"],
                               keys[i]), iters=iters)
            extras["box_sample_ms"] = round(dt_box * 1e3, 3)

        _phase(deadline, extras, "box_sample", c_est + 10, p_box_sample)

        def p_shape_fwd():
            from objgan_tpu.train.shape import ShapeTrainer

            # config #2: shape generator forward
            strn = ShapeTrainer(cfg)
            sstate = strn.init_state(rng, batch)
            ss = strn.jitted_sample()
            _, dt_shape = _bench(
                ss, lambda i: (sstate, batch["boxes"], batch["labels"],
                               batch["obj_valid"], keys[i]), iters=iters)
            extras["shape_fwd_ms"] = round(dt_shape * 1e3, 3)
            extras["shape_masks_per_sec"] = round(
                batch_size * cfg.OBJ.MAX_OBJECTS / dt_shape, 1)

        _phase(deadline, extras, "shape_fwd", c_est + 10, p_shape_fwd)

        def p_stage1():
            # config #3: stage-I 64px sampling
            s64 = jax.jit(
                lambda s, b, r: trainer.sample(s, b, r)["images"][0])
            _, dt64 = _bench(s64, lambda i: (state, batch, keys[i]),
                             iters=iters)
            extras["stage1_64px_images_per_sec_per_chip"] = round(
                batch_size / dt64, 2)

        _phase(deadline, extras, "stage1_64px", c_est + 10, p_stage1)

        def p_pipeline():
            # composed caption -> layout -> mask -> image pipeline (all
            # three stages in ONE program; device-loop like the headline)
            from objgan_tpu.pipeline_e2e import ObjGanPipeline

            pipe = ObjGanPipeline(cfg)
            with jax.default_device(cpu):
                pstates = pipe.load_states(rng, batch)
            pstates = jax.device_put(pstates, dev)
            caps, lens = batch["captions"], batch["cap_lens"]

            @jax.jit
            def pipe_loop(pstates, caps, lens, key):
                def body(i, carry):
                    acc, key = carry
                    key, sub = jax.random.split(key)
                    img = pipe.generate(pstates, caps, lens,
                                        sub)["images"][-1]
                    return acc + jnp.sum(img), key

                acc, _ = jax.lax.fori_loop(0, n_loop, body,
                                           (jnp.float32(0.0), key))
                return acc

            jax.block_until_ready(pipe_loop(pstates, caps, lens, keys[500]))
            ptrials = []
            for t in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    pipe_loop(pstates, caps, lens, keys[501 + t]))
                ptrials.append((time.perf_counter() - t0) / n_loop)
            dt_pipe = min(ptrials)
            extras["pipeline_e2e_ms"] = round(dt_pipe * 1e3, 3)
            extras["pipeline_e2e_images_per_sec_per_chip"] = round(
                batch_size / dt_pipe, 2)

        _phase(deadline, extras, "pipeline_e2e", 2 * c_est + 20, p_pipeline)

    if args.breakdown:
        def p_breakdown():
            # per-stage decomposition (BASELINE.md round-3 "where the ms
            # go"): every stage timed as its own chained device loop at
            # production shapes with the real EMA params.
            from objgan_tpu.utils.breakdown import (
                sampling_breakdown, train_breakdown,
            )

            # higher trip counts than the headline loops: individual
            # stages are far cheaper than the full step, so the
            # per-execution dispatch overhead (also measured and
            # subtracted — breakdown._loop_overhead_s) must spread over
            # more iterations for sub-ms stages to resolve. Combined with
            # --analyze, each stage also reports flops/bytes and the
            # achieved GB/s implied (per-stage roofline; costs come from
            # the same compiled loop programs — no extra remote compiles)
            for k, v in sampling_breakdown(
                    cfg, trainer, state, batch, keys[900],
                    n_loop=8 if args.quick else 64,
                    analyze=args.analyze).items():
                extras[f"bd_sample_{k}"] = v
            for k, v in train_breakdown(
                    cfg, trainer, state, batch, keys[901],
                    n_loop=4 if args.quick else 16,
                    analyze=args.analyze).items():
                extras[f"bd_train_{k}"] = v

        _phase(deadline, extras, "breakdown", 11 * c_est + 60, p_breakdown)

    if args.feed:
        def p_feed():
            # real-data sustained training: wire-format CocoFeed + the
            # _PrefetchFeed host->device pipeline, exactly the production
            # train-loop path (cli._run_loop), measured as steps/s.
            from objgan_tpu import cli as _cli
            from objgan_tpu.data.pipeline import CocoFeed, load_records_json
            from objgan_tpu.data.tokenizer import Vocab
            from objgan_tpu.parallel.sharding import make_mesh, replicate

            records = load_records_json(args.feed)
            vocab = Vocab.build(c for r in records for c in r["captions"])
            feed_cfg = cfg.replace(DATA_DIR=os.path.dirname(args.feed)
                                   or ".")
            feed = CocoFeed(feed_cfg, records, vocab, seed=0,
                            wire=not args.feed_classic)
            if not args.feed_classic and feed._cache is not None:
                # pre-fill the whole wire cache: 2 warmup execs touch only
                # ~2*K*batch records of the manifest, so without this the
                # timed window still pays cache-cold decode+rasterize and
                # understates steady-state (cache-hot) wire throughput
                for rid, rec in enumerate(records):
                    feed._wire_base(rec, rid)
            k_feed = args.k or (2 if args.quick else 8)
            mesh = make_mesh()
            f_state = replicate(mesh, jax.tree.map(jnp.copy, state))
            multi = trainer.jitted_multi_step(donate=True)
            prefetch = _cli._PrefetchFeed(iter(feed), mesh, k_feed)
            it = iter(prefetch)
            for i in range(2):  # compile warm
                _, stacked = next(it)
                f_state, fm = multi(f_state, stacked, keys[600 + i])
            jax.block_until_ready(fm)
            n_execs = 2 if args.quick else 6
            t0 = time.perf_counter()
            for i in range(n_execs):
                _, stacked = next(it)
                f_state, fm = multi(f_state, stacked, keys[700 + i])
            jax.block_until_ready(fm)
            dt_real = (time.perf_counter() - t0) / (n_execs * k_feed)
            prefetch.close()
            tag = "classic" if args.feed_classic else "wire"
            extras[f"realdata_{tag}_sustained_steps_per_sec"] = round(
                1.0 / dt_real, 3)
            extras[f"realdata_{tag}_sustained_ms_per_step"] = round(
                dt_real * 1e3, 3)
            extras[f"realdata_{tag}_images_per_sec_per_chip"] = round(
                batch_size / dt_real / max(n_chips, 1), 1)

        _phase(deadline, extras, "feed", 1.6 * c_est + 180, p_feed)

    _emit_payload()


if __name__ == "__main__":
    main()
