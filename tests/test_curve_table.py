"""curve_table.py parses gan/eval.py logs — including the round-5 columns
(frozen cross-manifest lite-IS, full-pool retrieval mean rank), which the
r5 curve's BASELINE.md table is regenerated from."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LOG = """\
evaluating checkpoint at step 2000
eval over 2048 samples [lite (framework encoder)]
real-side FID statistics: full manifest, 100000 unique images (augmentation-free)
FID: 0.123
IS: 2.850 +/- 0.100 [lite-probe: class head on lite features]
frozen lite-IS: 3.210 +/- 0.090 [cross-manifest scale — frozen encoder+probe: assets/frozen_lite.npz]
R-precision: 0.682
R-precision (real-image ceiling): 0.564
Retrieval mean rank (full pool 2048): 12.34 | median 3 | R@5 0.712
Retrieval mean rank (real-image ceiling): 45.67 | median 9 | R@5 0.401
"""


def test_parses_r5_columns(tmp_path):
    (tmp_path / "fid_2000.log").write_text(LOG)
    (tmp_path / "fid_4000.log").write_text(
        LOG.replace("0.123", "0.100").replace("12.34", "9.87"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "docs", "shakedown",
                                      "curve_table.py"), str(tmp_path)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    assert "frozen lite-IS" in lines[0]
    assert "mean rank" in lines[0]
    assert "| 2000 | 0.123 | 2.850 | 0.682 | 0.564 | 3.210 | 12.3; 45.7 |" \
        in lines
    assert "| 4000 | 0.100 | 2.850 | 0.682 | 0.564 | 3.210 | 9.9; 45.7 |" \
        in lines


def test_old_logs_still_render_without_new_columns(tmp_path):
    old = "\n".join(ln for ln in LOG.splitlines()
                    if not ln.startswith(("frozen", "Retrieval"))) + "\n"
    (tmp_path / "fid_600.log").write_text(old)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "docs", "shakedown",
                                      "curve_table.py"), str(tmp_path)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    hdr = r.stdout.strip().splitlines()[0]
    assert "frozen" not in hdr and "mean rank" not in hdr
    assert "| 600 | 0.123 |" in r.stdout
