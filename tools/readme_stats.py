"""Sync generated statistics (test counts) into README.md.

Round-2 and round-3 reviews both caught hand-written test counts drifting
from what pytest actually collects; this script makes the README numbers
mechanical. Run after adding/removing tests:

    python tools/readme_stats.py          # rewrite README.md in place
    python tools/readme_stats.py --check  # exit 1 if README is stale
"""
import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect_counts():
    """(fast_tier, total) test counts from pytest's own collector."""

    def count(args):
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "--collect-only", "-q", *args],
            cwd=REPO, capture_output=True, text=True,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            # pytest -q prints "N tests collected" or "N/M tests collected"
            m = re.search(r"(\d+)(?:/\d+)? tests? collected", line)
            if m:
                return int(m.group(1))
        raise RuntimeError(f"cannot parse pytest collect output:\n{out.stdout[-500:]}")

    total = count(["tests/"])
    fast = count(["tests/", "-m", "not slow"])
    return fast, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    fast, total = collect_counts()
    path = os.path.join(REPO, "README.md")
    with open(path) as f:
        text = f.read()
    new = text
    new = re.sub(r"fast tier \(\d+ tests", f"fast tier ({fast} tests", new)
    new = re.sub(r"full suite \(\d+ tests", f"full suite ({total} tests", new)
    new = re.sub(r"CPU mesh\. \d+ tests:", f"CPU mesh. {total} tests:", new)
    if args.check:
        if new != text:
            print(f"README test counts stale (pytest: fast={fast} total={total})")
            sys.exit(1)
        print(f"README test counts in sync (fast={fast} total={total})")
        return
    if new != text:
        with open(path, "w") as f:
            f.write(new)
        print(f"README updated: fast={fast} total={total}")
    else:
        print(f"README already in sync: fast={fast} total={total}")


if __name__ == "__main__":
    main()
