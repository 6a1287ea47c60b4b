"""Prime and snapshot the AOT executable store (solve/aot.py).

Runs the flagship workloads so every hot executable is compiled and
stored, then copies the entries into the git-tracked snapshot
directory `aot/` at the repo root.  A fresh machine (same device
kind + jax version) then gets true cold starts with no XLA compile:
the committed C5-scale fused bundle loads in ~1 s and ships to the
chip on first execution instead of paying the ~60-100 s compile
(docs/PERF.md).

Usage:
    python scripts/prime_aot.py            # run workloads + snapshot
    python scripts/prime_aot.py --copy-only  # just copy current store
"""

import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STORE = os.path.join(ROOT, ".jax_cache", "aot")
SNAP = os.path.join(ROOT, "aot")

#: Workloads whose executables the snapshot must hold.
WORKLOADS = (
    [sys.executable, os.path.join(ROOT, "bench.py")],
    [sys.executable, os.path.join(ROOT, "scripts", "cop_c5.py")],
)


def main():
    if "--copy-only" not in sys.argv:
        for cmd in WORKLOADS:
            print(f"prime: {' '.join(cmd[1:])}", flush=True)
            subprocess.run(cmd, check=True, cwd=ROOT)
    os.makedirs(SNAP, exist_ok=True)
    copied = 0
    for name in sorted(os.listdir(STORE) if os.path.isdir(STORE) else []):
        if not name.endswith(".aotx"):
            continue
        src = os.path.join(STORE, name)
        dst = os.path.join(SNAP, name)
        if not os.path.exists(dst) or (
                os.path.getsize(dst) != os.path.getsize(src)):
            shutil.copy2(src, dst)
            copied += 1
    total = sum(os.path.getsize(os.path.join(SNAP, f))
                for f in os.listdir(SNAP))
    print(f"snapshot: {copied} new entries -> {SNAP} "
          f"({total / 1e6:.0f} MB total)")


if __name__ == "__main__":
    main()
