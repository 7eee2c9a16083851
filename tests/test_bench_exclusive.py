"""bench._exclusive_chip: pause-never-kill chip exclusivity.

The driver's end-of-round `python bench.py` may fire while the shakedown
recipe holds the single TPU chip; bench pauses the recipe's process tree
(SIGSTOP, parents first) for the measurement and resumes it (SIGCONT,
children first) at exit. These tests drive the mechanism against a fake
process tree via the explicit ``pidfiles`` argument — the live shakedown's
/tmp/wd.pid is never read.
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _state(pid: int) -> str:
    # field 3 of /proc/<pid>/stat: R running, S sleeping, T stopped
    return open(f"/proc/{pid}/stat").read().rsplit(")", 1)[1].split()[0]


# _exclusive_chip validates the pidfile target's cmdline against shakedown
# markers (stale-pidfile / PID-recycling guard), so fake trees must carry
# one; the ": watchdog" no-op keeps the marker in bash's cmdline.
FAKE_TREE = ": watchdog test tree; sleep 300 & wait"


def test_pauses_tree_and_resumes_on_exit(tmp_path):
    parent = subprocess.Popen(["bash", "-c", FAKE_TREE])
    try:
        time.sleep(0.4)
        pf = tmp_path / "wd.pid"
        pf.write_text(str(parent.pid))
        # _exclusive_chip runs in a throwaway python so its atexit
        # (SIGCONT) fires when that process exits
        code = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            f"import bench\n"
            f"stopped = bench._exclusive_chip([{str(pf)!r}])\n"
            f"assert {parent.pid} in stopped, stopped\n"
            f"assert len(stopped) >= 2, stopped  # bash parent + sleep child\n"
            f"st = open('/proc/{parent.pid}/stat').read()"
            f".rsplit(')', 1)[1].split()[0]\n"
            f"assert st == 'T', st\n"
            f"print('PAUSED_OK')\n"
        )
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=120)
        assert "PAUSED_OK" in r.stdout, (r.stdout, r.stderr)
        deadline = time.time() + 10
        while time.time() < deadline and _state(parent.pid) == "T":
            time.sleep(0.1)
        assert _state(parent.pid) != "T", "tree not resumed after exit"
    finally:
        parent.terminate()
        parent.wait()


def test_dead_or_missing_pidfiles_are_noops(tmp_path):
    # subprocess so the bench flock is released immediately (an in-process
    # call would hold /tmp/objgan_bench.lock until pytest exits, blocking
    # any real bench that fires meanwhile)
    pf = tmp_path / "gone.pid"
    pf.write_text("999999999")  # beyond pid_max: never a live process
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        f"import bench\n"
        f"assert bench._exclusive_chip([{str(pf)!r}]) == []\n"
        f"assert bench._exclusive_chip("
        f"[{str(tmp_path / 'absent.pid')!r}]) == []\n"
        f"print('NOOP_OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=120)
    assert "NOOP_OK" in r.stdout, (r.stdout, r.stderr)


def test_stale_pidfile_with_recycled_pid_is_ignored(tmp_path):
    # A live process whose cmdline matches no shakedown marker must not be
    # frozen: that is exactly the PID-recycling hazard (ADVICE r3) where a
    # stale /tmp/wd.pid now points at an innocent process.
    bystander = subprocess.Popen(["sleep", "300"])
    try:
        pf = tmp_path / "wd.pid"
        pf.write_text(str(bystander.pid))
        code = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            f"import bench\n"
            f"assert bench._exclusive_chip([{str(pf)!r}]) == []\n"
            f"print('IGNORED_OK')\n"
        )
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=120)
        assert "IGNORED_OK" in r.stdout, (r.stdout, r.stderr)
        assert _state(bystander.pid) != "T", "bystander was frozen"
    finally:
        bystander.terminate()
        bystander.wait()


def test_deadman_resumes_tree_after_sigkill(tmp_path):
    # SIGKILL skips atexit and signal handlers; only the detached deadman
    # helper can thaw the tree (ADVICE r3 medium finding).
    parent = subprocess.Popen(["bash", "-c", FAKE_TREE])
    try:
        time.sleep(0.4)
        pf = tmp_path / "wd.pid"
        pf.write_text(str(parent.pid))
        code = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            f"import bench, os, signal, time\n"
            f"bench._exclusive_chip([{str(pf)!r}])\n"
            f"print('PAUSED', flush=True)\n"
            f"time.sleep(300)\n"  # hang until SIGKILLed by the test
        )
        env = dict(os.environ, OBJGAN_BENCH_DEADMAN_POLL_S="0.2")
        proc = subprocess.Popen([sys.executable, "-c", code], env=env,
                                stdout=subprocess.PIPE, text=True)
        assert proc.stdout.readline().strip() == "PAUSED"
        assert _state(parent.pid) == "T"
        proc.kill()  # SIGKILL: no atexit, no handler
        proc.wait()
        deadline = time.time() + 15
        while time.time() < deadline and _state(parent.pid) == "T":
            time.sleep(0.1)
        assert _state(parent.pid) != "T", "deadman did not thaw the tree"
    finally:
        parent.terminate()
        parent.wait()


def test_deadman_deadline_spares_cpu_active_bench(tmp_path):
    """The deadline alone must NOT thaw under a live bench whose CPU is
    advancing (a legitimately slow run past OBJGAN_BENCH_DEADMAN_S would
    silently lose chip exclusivity mid-measurement); with the bench's CPU
    frozen past deadline+stall, the thaw must fire (the lost-RPC hang)."""
    parent = subprocess.Popen(["bash", "-c", FAKE_TREE])
    try:
        time.sleep(0.4)
        pf = tmp_path / "wd.pid"
        pf.write_text(str(parent.pid))
        code = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            f"import bench, time\n"
            f"bench._exclusive_chip([{str(pf)!r}])\n"
            f"print('PAUSED', flush=True)\n"
            f"t = time.time()\n"
            f"while time.time() - t < 6: pass\n"  # CPU-busy past deadline
            f"time.sleep(300)\n"                  # then CPU-frozen
        )
        env = dict(os.environ, OBJGAN_BENCH_DEADMAN_S="1",
                   OBJGAN_BENCH_DEADMAN_POLL_S="0.2",
                   OBJGAN_BENCH_DEADMAN_STALL_S="2")
        proc = subprocess.Popen([sys.executable, "-c", code], env=env,
                                stdout=subprocess.PIPE, text=True)
        try:
            assert proc.stdout.readline().strip() == "PAUSED"
            # past the 1s deadline but CPU-active: must stay frozen
            time.sleep(4)
            assert _state(parent.pid) == "T", \
                "deadman thawed under a CPU-active bench"
            # bench goes idle (sleep): CPU freezes, deadline long past ->
            # the stall window elapses and the thaw fires
            deadline = time.time() + 15
            while time.time() < deadline and _state(parent.pid) == "T":
                time.sleep(0.2)
            assert _state(parent.pid) != "T", \
                "deadman did not thaw a CPU-frozen bench past the deadline"
        finally:
            proc.kill()
            proc.wait()
    finally:
        parent.terminate()
        parent.wait()
