"""End-to-end smoke of gan/eval.py in lite mode (synthetic paired feed).

The shakedown curve invokes this CLI for every eval point, so its full
path — sampling, feature extraction, probe-based lite-IS (VERDICT r3 next
#4), FID, R-precision — must be proven green on CPU before a TPU curve
trusts it."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_YML = """\
CONFIG_NAME: tiny_eval_smoke
TREE:
  BASE_SIZE: 16
TRAIN:
  BATCH_SIZE: 2
GAN:
  DF_DIM: 8
  GF_DIM: 8
  Z_DIM: 16
  CONDITION_DIM: 16
TEXT:
  EMBEDDING_DIM: 32
  WORDS_NUM: 6
  VOCAB_SIZE: 50
  HIDDEN_DIM: 16
  GLOVE_DIM: 16
OBJ:
  MAX_OBJECTS: 3
  NUM_CLASSES: 7
  ROI_SIZE: 4
  LABEL_DIM: 16
  GMM_COMPONENTS: 4
  SHAPE_SIZE: 16
BOX:
  RNN_SIZE: 32
  INPUT_ENCODING_SIZE: 16
  ATT_HID_SIZE: 16
  MAX_SEQ_LENGTH: 4
SHAPE:
  GF_DIM: 8
  DF_DIM: 8
  HIDDEN_DIM: 8
"""


def test_lite_eval_cli_end_to_end(tmp_path):
    cfg = tmp_path / "tiny.yml"
    # OUTPUT_DIR must go through the yml (config never reads env vars) —
    # the default would leak output/tiny_eval_smoke_gan/ into the repo,
    # and a stale checkpoint there would flip the untrained-encoder banner
    cfg.write_text(TINY_YML + f"OUTPUT_DIR: {tmp_path}\n")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import runpy,sys; sys.argv = sys.argv[1:];"
         "runpy.run_path(sys.argv[0], run_name='__main__')",
         os.path.join(REPO, "gan", "eval.py"),
         "--cfg", str(cfg), "--num_batches", "2"],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    out = r.stdout
    assert "eval over 4 samples [lite (framework encoder)]" in out
    # probe-based lite-IS replaced the constant feature-softmax surrogate
    assert "lite-IS probe:" in out
    assert "lite-probe:" in out
    for metric in ("FID:", "IS:", "R-precision:",
                   "R-precision (real-image ceiling):"):
        assert metric in out, out
    # untrained-encoder R-precision must still be flagged
    assert "untrained encoders" in out


def test_lite_eval_manifest_all_mode_caches_stats_and_probe(tmp_path):
    """--real_stats all over a real manifest: the full-manifest pass must
    produce BOTH per-manifest artifacts (FID real stats + lite-IS probe) in
    one go, cache them next to the manifest, and a second eval must hit
    both caches — the path every curve eval point takes on TPU."""
    from objgan_tpu.data.procedural import build_manifest

    data_dir = tmp_path / "proc8"
    manifest = build_manifest(str(data_dir), 8, 64, seed=1)

    cfg = tmp_path / "tiny.yml"
    # procedural records carry real COCO class ids (1..80): widen the tiny
    # config's label space to the production 81
    yml = TINY_YML.replace("NUM_CLASSES: 7\n", "NUM_CLASSES: 81\n")
    cfg.write_text(yml
                   + f"OUTPUT_DIR: {tmp_path}\nDATA_DIR: {data_dir}\n"
                   + "B_VALIDATION: False\n")
    cmd = [sys.executable, "-c",
           "import jax; jax.config.update('jax_platforms','cpu');"
           "import runpy,sys; sys.argv = sys.argv[1:];"
           "runpy.run_path(sys.argv[0], run_name='__main__')",
           os.path.join(REPO, "gan", "eval.py"),
           "--cfg", str(cfg), "--num_batches", "2",
           "--manifest", manifest, "--real_stats", "all"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                        cwd=REPO)
    assert r1.returncode == 0, (r1.stdout[-2000:], r1.stderr[-3000:])
    assert "real-side FID statistics: full manifest, 8 unique" in r1.stdout
    assert "lite-IS probe:" in r1.stdout
    stats = list(data_dir.glob(".fid_real_stats_*.npz"))
    probes = list(data_dir.glob(".fid_lite_probe_*.npz"))
    assert len(stats) == 1 and len(probes) == 1, (stats, probes)

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                        cwd=REPO)
    assert r2.returncode == 0, (r2.stdout[-2000:], r2.stderr[-3000:])
    assert f"real-side stats: cached ({stats[0]})" in r2.stdout
    assert f"lite-IS probe: cached ({probes[0]})" in r2.stdout


def test_eval_seed_varies_draws_but_not_the_split(tmp_path):
    """--eval_seed (round-5 noise-floor tool): re-scoring one checkpoint
    under different eval seeds must (a) keep the B_VALIDATION split
    byte-identical (an override that moved records across the split would
    leak train data into held-out metrics), (b) actually vary the draws —
    different latents => different FID. This is what turns a cross-
    checkpoint FID delta into signal: it must clear the seed-to-seed bar."""
    from objgan_tpu.data.procedural import build_manifest

    data_dir = tmp_path / "proc20"
    manifest = build_manifest(str(data_dir), 20, 64, seed=1)

    cfg = tmp_path / "tiny.yml"
    yml = TINY_YML.replace("NUM_CLASSES: 7\n", "NUM_CLASSES: 81\n")
    cfg.write_text(yml
                   + f"OUTPUT_DIR: {tmp_path}\nDATA_DIR: {data_dir}\n"
                   + "B_VALIDATION: True\n")

    def run(seed):
        cmd = [sys.executable, "-c",
               "import jax; jax.config.update('jax_platforms','cpu');"
               "import runpy,sys; sys.argv = sys.argv[1:];"
               "runpy.run_path(sys.argv[0], run_name='__main__')",
               os.path.join(REPO, "gan", "eval.py"),
               "--cfg", str(cfg), "--num_batches", "1",
               "--manifest", manifest, "--eval_seed", str(seed)]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                           cwd=REPO)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
        return r.stdout

    out1, out2 = run(11), run(22)
    for out, seed in ((out1, 11), (out2, 22)):
        assert f"eval_seed: {seed} (held-out batch order + latents" in out
        # split pinned to cfg.RNG_SEED regardless of the override
        assert "B_VALIDATION split: 18 train / 2 held-out" in out, out

    def fid(out):
        return float([ln for ln in out.splitlines()
                      if ln.startswith("FID:")][0].split()[1])

    assert fid(out1) != fid(out2), (fid(out1), out1)
