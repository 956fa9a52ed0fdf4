"""Regenerate the golden test files under tests/testdata/.

Parity target: reference scripts/make_gpt2_test_cases.py (which produced
hard-coded expected outputs for tests with real GPT-2). Here goldens are
request-hashes + fake-LM results per task (see tests/test_tasks_golden.py);
they self-bootstrap on first run, and this script forces a clean regeneration
after an intentional prompt/metric change.

Usage:
    python scripts/make_test_cases.py            # regenerate all
    python scripts/make_test_cases.py piqa boolq # only these tasks
"""

import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")
TESTDATA = os.path.join(ROOT, "tests", "testdata")


def main():
    only = sys.argv[1:]
    removed = 0
    for fname in os.listdir(TESTDATA):
        task = fname.split("-v")[0]
        if only and task not in only:
            continue
        os.remove(os.path.join(TESTDATA, fname))
        removed += 1
    print(f"removed {removed} golden files; re-running the golden suite...")
    filt = ["-k", " or ".join(only)] if only else []
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_tasks_golden.py", "-q", *filt],
        cwd=ROOT,
    )
    if rc != 0:
        sys.exit(rc)
    print("goldens regenerated — review `git diff tests/testdata/` before committing")


if __name__ == "__main__":
    main()
