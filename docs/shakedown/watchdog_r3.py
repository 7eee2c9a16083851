"""Shakedown watchdog: auto-recover from TPU-relay lost-RPC hangs.

The relay occasionally drops an RPC and the client sleeps forever
(CLAUDE.md). Every program the round-3 recipe needs is already in the
persistent compile cache, so any shakedown python child whose CPU time is
frozen for 14 minutes is a hang, not a compile. Kill exactly that PID
(never pattern-kill), let the script's set -e end it, and relaunch — the
recipe is idempotent (trained stages no-op, finished evals are
log-guarded), so a relaunch fast-forwards to where it died.
"""
import glob
import os
import signal
import subprocess
import sys
import time

# argv: [script [comma-separated FID segment steps]] — defaults drive the
# original r3 recipe; the r3b restart passes its own script + 12 segments.
# OBJGAN_SHK_DIR selects the scratch dir (r4's 10k run uses /root/shk4;
# safe to parameterize — a running watchdog keeps its loaded copy).
PIDFILE = "/tmp/shk3.pid"
SCRIPT = (sys.argv[1] if len(sys.argv) > 1
          else "/root/repo/docs/shakedown/run_phases_r3.sh")
SHK = os.environ.get("OBJGAN_SHK_DIR", "/root/shk3")
LOG = f"{SHK}/watchdog.log"
SEGS = ([int(s) for s in sys.argv[2].split(",")] if len(sys.argv) > 2
        else [600 + 600 * i for i in range(13)])
CHECK_S = 120
STALL_CHECKS = 7  # 14 min of frozen CPU => hang


def log(msg):
    with open(LOG, "a") as f:
        f.write(f"{time.strftime('%H:%M:%S')} {msg}\n")


def ps_rows():
    out = subprocess.run(["ps", "-eo", "pid,ppid,comm"],
                         capture_output=True, text=True).stdout
    rows = []
    for line in out.splitlines()[1:]:
        parts = line.split(None, 2)
        if len(parts) == 3 and parts[0].isdigit():
            rows.append((int(parts[0]), int(parts[1]), parts[2]))
    return rows


def python_descendants(root):
    rows = ps_rows()
    kids = {}
    for pid, ppid, comm in rows:
        kids.setdefault(ppid, []).append((pid, comm))
    found, stack = [], [root]
    while stack:
        r = stack.pop()
        for pid, comm in kids.get(r, []):
            if comm.startswith("python"):
                found.append(pid)
            stack.append(pid)
    return found


def cpu_jiffies(pid):
    try:
        f = open(f"/proc/{pid}/stat").read().split()
        return int(f[13]) + int(f[14])
    except Exception:
        return None


def alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except Exception:
        return False


def relaunch():
    out = open(f"{SHK}/run_wd.log", "ab")
    p = subprocess.Popen(["bash", SCRIPT], stdout=out, stderr=out,
                         start_new_session=True)
    open(PIDFILE, "w").write(str(p.pid))
    log(f"relaunched script pid {p.pid}")


def complete():
    done = 0
    for s in SEGS:
        try:
            if any(line.startswith("FID:")
                   for line in open(f"{SHK}/fid_{s}.log")):
                done += 1
        except OSError:
            pass
    return done >= len(SEGS)


def main():
    log("watchdog started")
    last_pid, last_cpu, stall = None, None, 0
    while True:
        if complete():
            log("all 13 eval points complete; watchdog exiting")
            return
        try:
            sp = int(open(PIDFILE).read().strip())
        except Exception:
            sp = None
        if sp is None or not alive(sp):
            relaunch()
            time.sleep(60)
            continue
        pys = python_descendants(sp)
        if pys:
            pid = max(pys)  # newest child = the active phase
            c = cpu_jiffies(pid)
            if c is not None and pid == last_pid and c == last_cpu:
                stall += 1
            else:
                stall = 0
            last_pid, last_cpu = pid, c
            if stall >= STALL_CHECKS:
                log(f"killing hung python {pid} (cpu frozen at {c} jiffies "
                    f"for {STALL_CHECKS * CHECK_S}s)")
                try:
                    os.kill(pid, signal.SIGTERM)
                except Exception as e:
                    log(f"kill failed: {e}")
                stall = 0
        time.sleep(CHECK_S)


if __name__ == "__main__":
    main()
