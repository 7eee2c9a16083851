"""Hang-recovery watchdog for long unattended training recipes.

SURVEY.md §5 "Failure recovery": the reference's story is
restart-from-latest-checkpoint by hand. This framework's trainers already
resume from Orbax automatically (cli.py `_run_loop`), and segmented
recipes are idempotent (trained stages fast no-op, finished evals are
log-guarded — docs/TRAINING.md). This tool closes the loop for the
failure mode resume alone cannot fix: a *hung* process. On this image the
TPU-relay RPC layer occasionally drops a call and the client sleeps
forever (CLAUDE.md); in any production fleet, NFS stalls / leadership
loss / network partitions produce the same signature — a process whose
CPU clock freezes while wall time runs.

    python -m objgan_tpu.tools.watchdog \\
        --script run_phases.sh \\
        --done_cmd 'test -f /out/DONE' \\
        [--check_s 120] [--stall_checks 7] [--progress_glob 'out/*.csv' ...]

Loop: (1) if ``done_cmd`` exits 0, exit. (2) if the script is not running,
(re)launch it — safe because the recipe is idempotent. (3) read the CPU
jiffies of ALL python descendants in the script's process subtree
(aggregate, not just the newest: with a backgrounded helper or worker
processes in the recipe, any single-pick heuristic can watch — and kill —
the wrong process while the hung one sleeps undetected); when the
descendant set is unchanged and its total CPU is frozen for
``stall_checks * check_s`` seconds — and, if ``--progress_glob`` is
given, the progress files' mtimes have not moved either (distinguishes
the relay's self-recovering slow stalls, CLAUDE.md) — the descendants are
killed BY exact PID (never by name pattern: a pattern can match unrelated
processes, or this watchdog itself). The script's ``set -e`` then ends
it, and the next loop iteration relaunches it to fast-forward to where it
died.

The round-3 10k-record shakedown ran under exactly this logic
(BASELINE.md), surviving one genuine lost-RPC hang unattended.
"""

from __future__ import annotations

import argparse
import glob
import os
import signal
import subprocess
import sys
import time
from typing import Dict, List, Optional, Tuple


def log(msg: str, log_file: Optional[str] = None) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    if log_file:
        with open(log_file, "a") as f:
            f.write(line + "\n")


def ps_rows() -> List[Tuple[int, int, str]]:
    out = subprocess.run(["ps", "-eo", "pid,ppid,comm"],
                         capture_output=True, text=True).stdout
    rows = []
    for line in out.splitlines()[1:]:
        parts = line.split(None, 2)
        if len(parts) == 3 and parts[0].isdigit():
            rows.append((int(parts[0]), int(parts[1]), parts[2]))
    return rows


def python_descendants(root: int) -> List[int]:
    """PIDs of python processes in ``root``'s process subtree."""
    kids: Dict[int, List[Tuple[int, str]]] = {}
    for pid, ppid, comm in ps_rows():
        kids.setdefault(ppid, []).append((pid, comm))
    found, stack = [], [root]
    while stack:
        r = stack.pop()
        for pid, comm in kids.get(r, []):
            if comm.startswith("python"):
                found.append(pid)
            stack.append(pid)
    return found


def cpu_jiffies(pid: int) -> Optional[int]:
    """utime+stime from /proc — the only hang signal the relay cannot
    fake: a blocked RPC burns no CPU."""
    try:
        f = open(f"/proc/{pid}/stat").read().split()
        return int(f[13]) + int(f[14])
    except OSError:
        return None


def newest_progress_mtime(globs: List[str]) -> float:
    newest = 0.0
    for g in globs:
        for path in glob.glob(g):
            try:
                newest = max(newest, os.path.getmtime(path))
            except OSError:
                pass
    return newest


def alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def watch(script: str, done_cmd: str, check_s: float = 120.0,
          stall_checks: int = 7, progress_globs: Optional[List[str]] = None,
          log_file: Optional[str] = None,
          max_relaunches: int = 1000) -> int:
    """Run the supervision loop; returns 0 when ``done_cmd`` succeeds."""
    progress_globs = progress_globs or []
    script_proc: Optional[subprocess.Popen] = None
    last_pids: Optional[frozenset] = None
    last_cpu = None
    last_mtime = 0.0
    stall = 0
    relaunches = 0
    while True:
        if subprocess.run(done_cmd, shell=True).returncode == 0:
            log("done_cmd succeeded; watchdog exiting", log_file)
            return 0
        if script_proc is None or script_proc.poll() is not None:
            if relaunches >= max_relaunches:
                log(f"max_relaunches={max_relaunches} exhausted", log_file)
                return 1
            script_proc = subprocess.Popen(
                ["bash", script], start_new_session=True)
            relaunches += 1
            log(f"launched {script} (pid {script_proc.pid})", log_file)
            stall, last_pids, last_cpu = 0, None, None
            time.sleep(check_s / 2)
            continue
        pys = python_descendants(script_proc.pid)
        if pys:
            # aggregate over ALL python descendants: any single-pick
            # heuristic (e.g. highest PID) can track a healthy helper
            # while the hung trainer sleeps undetected
            jiffies = [cpu_jiffies(p) for p in pys]
            total = sum(j for j in jiffies if j is not None)
            pid_set = frozenset(pys)
            mtime = newest_progress_mtime(progress_globs)
            frozen = pid_set == last_pids and total == last_cpu
            progressing = progress_globs and mtime > last_mtime
            if frozen and not progressing:
                stall += 1
            else:
                stall = 0
            last_pids, last_cpu = pid_set, total
            last_mtime = max(mtime, last_mtime)
            if stall >= stall_checks:
                log(f"killing hung python subtree {sorted(pid_set)} (total "
                    f"cpu frozen at {total} jiffies for "
                    f"{stall_checks * check_s:.0f}s, no progress-file "
                    "movement)", log_file)
                for pid in sorted(pid_set):
                    try:
                        os.kill(pid, signal.SIGTERM)  # exactly these pids
                    except OSError:
                        pass
                time.sleep(10)
                for pid in sorted(pid_set):
                    try:
                        if alive(pid):
                            os.kill(pid, signal.SIGKILL)
                    except OSError:
                        pass
                stall, last_pids, last_cpu = 0, None, None
        time.sleep(check_s)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--script", required=True,
                    help="idempotent recipe script (bash) to supervise")
    ap.add_argument("--done_cmd", required=True,
                    help="shell command; exit 0 = recipe complete")
    ap.add_argument("--check_s", type=float, default=120.0)
    ap.add_argument("--stall_checks", type=int, default=7,
                    help="consecutive frozen checks before the kill "
                         "(default 7 x 120 s = 14 min — past any compile "
                         "or self-recovering relay stall)")
    ap.add_argument("--progress_glob", action="append", default=[],
                    help="file glob(s) whose mtime movement counts as "
                         "progress even when CPU looks frozen (metrics "
                         "CSVs, checkpoint dirs); repeatable")
    ap.add_argument("--log", default=None)
    ap.add_argument("--max_relaunches", type=int, default=1000)
    args = ap.parse_args()
    sys.exit(watch(args.script, args.done_cmd, args.check_s,
                   args.stall_checks, args.progress_glob, args.log,
                   args.max_relaunches))


if __name__ == "__main__":
    main()
