"""TPU-relay health probe: diagnose the three known relay failure modes.

The remote-relay transport (CLAUDE.md "Environment gotchas") has three
observed failure modes that look identical from a stuck client's stdout:

  1. lost RPC      — one client sleeps forever; a FRESH client works.
  2. slow stall    — ~15-min self-recovering; CPU keeps ticking slowly.
  3. big-transfer  — large `device_put`s hang while small RPCs complete
                     (observed 2026-08-20 for ~90 min: 32 MB put 0.2 s,
                     256 MB put blocked forever). Trainer restores push
                     hundreds of MB of params, so every resume froze at
                     startup while tiny probe scripts looked healthy.

This probe distinguishes them from OUTSIDE the stuck process: it runs a
tiny op, then a ladder of device_put sizes, each bounded by an alarm, and
prints one verdict line.  Usage (each tier bounded, total <~3 min):

    python -m objgan_tpu.tools.relay_probe [--max-mb 256] [--timeout 90]

Exit code 0 = relay healthy through --max-mb; 1 = degraded (the first
failing tier is printed).  If the probe is healthy but a specific client
is stuck with frozen CPU-time, that client hit mode 1: kill exactly that
PID and retry.  If the ladder fails at a large tier only, that is mode 3:
retrying big jobs is pointless until a later probe passes — poll every
~10 min. Interpret a stuck-but-CPU-ticking client as mode 2: leave it.
"""

from __future__ import annotations

import argparse
import signal
import sys
import time


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--max-mb", type=int, default=256,
                    help="largest device_put tier in MiB (default 256)")
    ap.add_argument("--timeout", type=int, default=90,
                    help="per-tier wall bound in seconds (default 90)")
    args = ap.parse_args(argv)

    signal.signal(signal.SIGALRM, _alarm)

    t0 = time.time()
    signal.alarm(args.timeout + 60)  # backend init can take ~40 s cold
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        dev = jax.devices()[0]
        x = jnp.ones((256, 256))
        float((x @ x).sum())
    except _Timeout:
        print(f"VERDICT: DEAD — backend init / tiny matmul did not "
              f"complete in {args.timeout + 60}s")
        return 1
    finally:
        signal.alarm(0)
    print(f"tiny matmul ok on {dev} ({time.time() - t0:.1f}s incl. init)",
          flush=True)

    tier_mb = [4, 32, 64, 128, 256, 512, 1024]
    for mb in [m for m in tier_mb if m <= args.max_mb]:
        host = np.ones((mb, 256, 1024), np.float32)  # mb MiB exactly
        signal.alarm(args.timeout)
        try:
            t = time.time()
            d = jax.device_put(host)
            d.block_until_ready()
            print(f"{mb:5d} MiB device_put ok in {time.time() - t:.2f}s",
                  flush=True)
            del d
        except _Timeout:
            print(f"VERDICT: DEGRADED (big-transfer mode) — {mb} MiB "
                  f"device_put hung >{args.timeout}s while smaller tiers "
                  f"worked; poll again in ~10 min before retrying big jobs")
            return 1
        finally:
            signal.alarm(0)

    print(f"VERDICT: HEALTHY through {args.max_mb} MiB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
