"""bench deadline printer: the one JSON line must print (VERDICT r4 #1).

BENCH_r04.json was rc=124/parsed=null: a machine reset wiped the compile
cache and the driver's plain `python bench.py` out-waited its timeout while
still compiling, printing nothing. The fix measures the headline FIRST and
guarantees the JSON line prints via (a) a budget watchdog thread and
(b) SIGTERM/SIGALRM handlers. These tests drive both paths against a real
`bench.py --quick` subprocess with an artificially wedged post-headline
phase (OBJGAN_BENCH_FAKE_SLOW_S), plus the budget/phase gating logic
in-process.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# CPU bootstrap (the image's sitecustomize pins the axon TPU backend;
# JAX_PLATFORMS env is ignored — jax.config.update before first backend
# use is the only way, same recipe as this conftest).
BOOT = (
    "import jax; jax.config.update('jax_platforms','cpu');"
    "import runpy,sys; sys.argv=sys.argv[1:];"
    "runpy.run_path(sys.argv[0], run_name='__main__')"
)


def _env(**over):
    env = dict(os.environ)
    env.update(
        OBJGAN_COMPILE_CACHE="/tmp/jax_test_cache",  # share the warm cache
        OBJGAN_BENCH_LOG="0",  # tests must not write repo log files
        OBJGAN_BENCH_PAUSE_PIDFILES="/tmp/nonexistent_test.pid",
    )
    env.update({k: str(v) for k, v in over.items()})
    return env


def _last_json_line(stdout: str):
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in stdout: {stdout!r}")


def test_budget_watchdog_prints_partial_line_and_exits_zero():
    # Budget already exhausted by the time the headline lands; the phase
    # after the headline is wedged (fake 300s sleep). The watchdog thread
    # must print the partial payload and exit 0 long before the sleep ends.
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", BOOT, os.path.join(REPO, "bench.py"),
         "--quick"],
        env=_env(OBJGAN_BENCH_BUDGET_S="1", OBJGAN_BENCH_FAKE_SLOW_S="300"),
        capture_output=True, text=True, timeout=540, cwd=REPO)
    elapsed = time.time() - t0
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    assert elapsed < 300, f"watchdog did not cut the fake slow phase short "\
                          f"({elapsed:.0f}s)"
    payload = _last_json_line(r.stdout)
    assert payload["metric"] == \
        "stage3_256px_sampling_images_per_sec_per_chip"
    assert payload["value"] > 0
    assert "budget" in payload["extras"]["partial"]
    assert payload["extras"]["sampling_device_loop_ms"] > 0


def test_sigterm_after_headline_prints_partial_line():
    # Driver-timeout shape: SIGTERM arrives mid-phase after the headline
    # exists. The handler must print the payload and exit 0.
    proc = subprocess.Popen(
        [sys.executable, "-c", BOOT, os.path.join(REPO, "bench.py"),
         "--quick"],
        env=_env(OBJGAN_BENCH_FAKE_SLOW_S="300"),  # loose default budget
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO)
    try:
        # wait for the post-headline marker on stderr, then SIGTERM
        deadline = time.time() + 480
        for line in proc.stderr:
            if "FAKE_SLOW" in line or time.time() > deadline:
                break
        time.sleep(0.5)  # let the sleep actually start
        proc.send_signal(signal.SIGTERM)
        stdout, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert proc.returncode == 0, (proc.returncode, stdout)
    payload = _last_json_line(stdout)
    assert payload["value"] > 0
    assert "signal" in payload["extras"]["partial"]


def test_phase_gating_defers_and_captures_errors():
    sys.path.insert(0, REPO)
    import bench

    os.environ["OBJGAN_BENCH_BUDGET_S"] = "100"
    try:
        d = bench._Deadline(default_budget_s=0)
    finally:
        del os.environ["OBJGAN_BENCH_BUDGET_S"]
    assert d.budget == 100
    extras = {}
    ran = []
    # fits: 100s budget - 60s margin > 10s estimate
    assert bench._phase(d, extras, "ok", 10, lambda: ran.append(1))
    assert ran == [1]
    # too expensive: deferred, not run
    assert not bench._phase(d, extras, "huge", 1000, lambda: ran.append(2))
    assert extras["deferred_phases"] == ["huge"]
    assert ran == [1]

    # a crashing phase records the error instead of killing the bench
    def boom():
        raise ValueError("kaput")

    assert not bench._phase(d, extras, "bad", 1, boom)
    assert "kaput" in extras["bad_error"]


def test_emit_payload_prints_exactly_once(capfd):
    sys.path.insert(0, REPO)
    import bench

    bench._PAYLOAD.clear()
    bench._EMIT_ONCE[:] = [True]
    try:
        assert not bench._emit_payload()  # no headline yet -> refuses
        bench._PAYLOAD.update({"metric": "m", "value": 1.0, "unit": "u",
                               "vs_baseline": 1.0, "extras": {"a": 1}})
        assert bench._emit_payload(note="first")
        assert not bench._emit_payload(note="second")  # once only
        out = capfd.readouterr().out
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        assert len(lines) == 1
        payload = json.loads(lines[0])
        assert payload["extras"]["partial"] == "first"
        assert payload["extras"]["a"] == 1
    finally:
        bench._PAYLOAD.clear()
        bench._EMIT_ONCE[:] = [True]
