"""Garbage-collect the AOT executable cache (VERDICT r4 #8: 26 GB tree).

Policy:
  * entries tagged with a phase-graph revision other than the current
    `plonk.fused._GRAPH_REV` are stale by construction (the rev is bumped
    whenever in-graph code changes) -> deleted;
  * the rest are LRU'd by mtime (utils/aot_cache touches mtime on every
    successful load) down to --max-gb, most-recently-used kept.

Usage: python scripts/gc_aot.py [--max-gb 8] [--dry-run]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webauthn_halo2_tpu.plonk.fused import _GRAPH_REV  # noqa: E402
from webauthn_halo2_tpu.utils.aot_cache import _DIR  # noqa: E402

REV_RE = re.compile(r"_(r\d+[a-z]?)_")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-gb", type=float, default=8.0)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    entries = []
    freed = 0
    for fn in os.listdir(_DIR):
        path = os.path.join(_DIR, fn)
        if not fn.endswith(".pkl"):
            if ".tmp" in fn:  # orphaned partial writes
                freed += os.path.getsize(path)
                if not args.dry_run:
                    os.remove(path)
            continue
        st = os.stat(path)
        m = REV_RE.search(fn)
        if m and m.group(1) != _GRAPH_REV:
            print(f"stale rev {m.group(1)}: {fn} "
                  f"({st.st_size/1e6:.0f} MB)")
            freed += st.st_size
            if not args.dry_run:
                os.remove(path)
            continue
        entries.append((st.st_mtime, st.st_size, path))

    entries.sort(reverse=True)  # most recent first
    budget = args.max_gb * 1e9
    used = 0
    for mt, sz, path in entries:
        used += sz
        if used > budget:
            print(f"LRU evict: {os.path.basename(path)} ({sz/1e6:.0f} MB)")
            freed += sz
            if not args.dry_run:
                os.remove(path)
    print(f"freed {freed/1e9:.2f} GB"
          f"{' (dry run)' if args.dry_run else ''}; "
          f"kept {min(used, budget)/1e9:.2f} GB")


if __name__ == "__main__":
    main()
