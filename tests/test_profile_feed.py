"""Smoke test for the host-feed profiler CLI (tools/profile_feed.py).

The numbers only mean something on the real TPU host (BASELINE.md round-3
feed tables); here we assert the tool runs end-to-end against a real
on-disk manifest and prints every stage of the disk->device breakdown.
"""

import os
import subprocess
import sys

from objgan_tpu.data.procedural import build_manifest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# sitecustomize pins the axon TPU backend at interpreter start; the
# subprocess must force CPU before first backend use (CLAUDE.md gotcha)
BOOTSTRAP = (
    "import jax; jax.config.update('jax_platforms','cpu');"
    "import runpy,sys; sys.argv = sys.argv[1:];"
    "runpy.run_path(sys.argv[0], run_name='__main__')"
)


def test_profile_feed_wire_breakdown(tmp_path):
    manifest = build_manifest(str(tmp_path), n_images=6, size=64, seed=0)
    cfg = tmp_path / "pf.yml"
    cfg.write_text(
        "CONFIG_NAME: pf_test\n"
        "TRAIN: {BATCH_SIZE: 2, STEPS_PER_EXECUTION: 2}\n"
    )
    env = dict(os.environ)
    # drop conftest's 8-virtual-device flag: the profiler shards batches
    # over the real mesh, and batch-2 can't split 8 ways
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-c", BOOTSTRAP,
         os.path.join(REPO, "objgan_tpu", "tools", "profile_feed.py"),
         "--cfg", str(cfg), "--manifest", manifest, "--wire", "--reps", "1"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for stage in ("1. record transform", "2. batch assembly", "3. K=2 stack",
                  "4. host->device put"):
        assert stage in r.stdout, (stage, r.stdout)
    # wire batches ship uint8 images: the stacked K=2 x batch-2 pytree must
    # be far below the ~1.5 MB a float32 pyramid of the same shapes costs
    assert "MB pytree" in r.stdout
