"""Render the shakedown quality curve as a markdown table from eval logs.

Parses ``fid_<step>.log`` files (the ``gan/eval.py`` output captured by
``run_phases_r3b.sh``) and prints a BASELINE.md-ready table sorted by step,
so the curve section can be regenerated with one command even by a session
that did not run the evals:

    python docs/shakedown/curve_table.py docs/shakedown/r3b_evals
"""
import glob
import os
import re
import sys


def parse_log(path: str):
    m = re.search(r"fid_(\d+)\.log$", path)
    if m is None:  # e.g. fid_final.log — skip like an incomplete log
        return None
    row = {"step": int(m.group(1))}
    with open(path, errors="replace") as f:
        for line in f:
            m = re.match(r"^FID: ([\d.]+)", line)
            if m:
                row["fid"] = float(m.group(1))
            m = re.match(r"^IS: ([\d.]+) \+/- ([\d.]+)", line)
            if m:
                row["is_mean"], row["is_std"] = (float(m.group(1)),
                                                 float(m.group(2)))
            m = re.match(r"^R-precision: ([\d.]+)", line)
            if m:
                row["rprec"] = float(m.group(1))
            m = re.match(r"^R-precision \(real-image ceiling\): ([\d.]+)",
                         line)
            if m:
                row["rprec_ceiling"] = float(m.group(1))
            m = re.match(r"^Retrieval mean rank \(full pool \d+\): "
                         r"([\d.]+) \| median ([\d.]+) \| R@5 ([\d.]+)",
                         line)
            if m:
                row["mean_rank"] = float(m.group(1))
                row["r_at_5"] = float(m.group(3))
            m = re.match(r"^Retrieval mean rank \(real-image ceiling\): "
                         r"([\d.]+)", line)
            if m:
                row["mean_rank_ceiling"] = float(m.group(1))
            m = re.match(r"^frozen lite-IS: ([\d.]+) \+/- ([\d.]+)", line)
            if m:
                row["frozen_is"] = float(m.group(1))
            m = re.match(r"^eval over (\d+) samples", line)
            if m:
                row["n"] = int(m.group(1))
    return row if "fid" in row else None


def main(d: str) -> int:
    rows = sorted(filter(None, (parse_log(p) for p in
                                glob.glob(os.path.join(d, "fid_*.log")))),
                  key=lambda r: r["step"])
    if not rows:
        print(f"no complete fid_*.log files under {d}", file=sys.stderr)
        return 1
    n = rows[0].get("n", "?")
    # the real-image ceiling column appears once any log carries it
    # (r4 evals print it; earlier logs simply show n/a)
    with_ceiling = any("rprec_ceiling" in r for r in rows)
    # round-5 columns appear once any log carries them (frozen cross-
    # manifest IS; full-pool retrieval mean rank — VERDICT r4 next #4/#5)
    with_frozen = any("frozen_is" in r for r in rows)
    with_rank = any("mean_rank" in r for r in rows)
    hdr = f"| Stage-C step | lite-FID (n={n}) | lite-IS | R-precision |"
    sep = "|---|---|---|---|"
    if with_ceiling:
        hdr += " R-prec ceiling (real) |"
        sep += "---|"
    if with_frozen:
        hdr += " frozen lite-IS |"
        sep += "---|"
    if with_rank:
        hdr += " mean rank (full pool; real) |"
        sep += "---|"
    print(hdr)
    print(sep)
    for r in rows:
        line = (f"| {r['step']} | {r['fid']:.3f} "
                f"| {r.get('is_mean', float('nan')):.3f} "
                f"| {r.get('rprec', float('nan')):.3f} |")
        if with_ceiling:
            c = r.get("rprec_ceiling")
            line += f" {c:.3f} |" if c is not None else " n/a |"
        if with_frozen:
            c = r.get("frozen_is")
            line += f" {c:.3f} |" if c is not None else " n/a |"
        if with_rank:
            c, cc = r.get("mean_rank"), r.get("mean_rank_ceiling")
            line += (f" {c:.1f}; {cc:.1f} |" if c is not None
                     and cc is not None else " n/a |")
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1
                  else "docs/shakedown/r3b_evals"))
