"""Hang-recovery watchdog (tools/watchdog.py) — real-subprocess tests: a
fake recipe whose python child sleeps with zero CPU must be killed and the
recipe relaunched; progress-file movement must veto the kill; done_cmd
ends supervision."""

import os
import stat
import textwrap
import time

from objgan_tpu.tools.watchdog import (
    cpu_jiffies, python_descendants, watch,
)


def _write_script(path, body):
    path.write_text("#!/bin/bash\nset -e\n" + textwrap.dedent(body))
    path.chmod(path.stat().st_mode | stat.S_IEXEC)


def test_kills_hung_child_and_completes_on_relaunch(tmp_path):
    """Run 1: child writes a marker then hangs (pure sleep — zero CPU).
    The watchdog must kill it, relaunch the script, and run 2 (seeing the
    marker) completes, satisfying done_cmd."""
    marker = tmp_path / "attempt1"
    done = tmp_path / "DONE"
    script = tmp_path / "recipe.sh"
    _write_script(script, f"""
        if [ -f {marker} ]; then
            touch {done}
        else
            touch {marker}
            python -c "import time; time.sleep(3600)"
        fi
        """)
    t0 = time.time()
    rc = watch(str(script), f"test -f {done}", check_s=0.5,
               stall_checks=3, log_file=str(tmp_path / "wd.log"))
    assert rc == 0
    assert done.exists()
    assert time.time() - t0 < 60
    log = (tmp_path / "wd.log").read_text()
    assert "killing hung python" in log
    assert log.count("launched") == 2


def test_progress_file_movement_vetoes_kill(tmp_path):
    """A child with frozen CPU but moving progress files (the relay's
    self-recovering stall form) must NOT be killed."""
    done = tmp_path / "DONE"
    progress = tmp_path / "metrics.csv"
    script = tmp_path / "recipe.sh"
    # the child sleeps (zero CPU) but touches the progress file, then
    # finishes by itself
    _write_script(script, f"""
        python - <<'PY'
import time
for i in range(20):
    time.sleep(0.25)
    open("{progress}", "a").write("row\\n")
open("{done}", "w")
PY
        """)
    # writes every 0.25 s < check_s: every check sees fresh progress
    rc = watch(str(script), f"test -f {done}", check_s=0.5,
               stall_checks=2, progress_globs=[str(progress)],
               log_file=str(tmp_path / "wd.log"))
    assert rc == 0
    assert "killing" not in (tmp_path / "wd.log").read_text()


def test_descendant_discovery_and_jiffies(tmp_path):
    import subprocess

    p = subprocess.Popen(
        ["bash", "-c", "python -c 'import time; time.sleep(30)' & wait"])
    try:
        deadline = time.time() + 10
        pys = []
        while time.time() < deadline and not pys:
            pys = python_descendants(p.pid)
            time.sleep(0.2)
        assert pys, "python child not found in subtree"
        j = cpu_jiffies(pys[0])
        assert j is not None and j >= 0
        assert cpu_jiffies(99999999) is None
    finally:
        p.terminate()
        p.wait()


def test_max_relaunches_bounds_runaway(tmp_path):
    """A recipe that dies instantly and a done_cmd that never succeeds
    must stop after max_relaunches, not loop forever."""
    script = tmp_path / "recipe.sh"
    _write_script(script, "exit 1\n")
    rc = watch(str(script), "false", check_s=0.2, stall_checks=2,
               max_relaunches=2, log_file=str(tmp_path / "wd.log"))
    assert rc == 1
    assert (tmp_path / "wd.log").read_text().count("launched") == 2
