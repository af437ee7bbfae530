"""One-command validation: full pytest suite, oracle parity at sf0.01,
dtype audit at sf0.001 — the local mirror of everything the driver gates.

Usage: PYTHONPATH=/root/repo python tools/validate_all.py [--quick]
(--quick skips the pytest suite.)
"""

from __future__ import annotations

import subprocess
import sys

STEPS = [
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"]),
    ("parity sf0.01", [sys.executable, "tools/parity_check.py", "/root/testdata/sf0.01"]),
    ("dtypes sf0.001", [sys.executable, "tools/dtype_audit.py", "/root/testdata/sf0.001"]),
]


def main() -> int:
    steps = STEPS[1:] if "--quick" in sys.argv else STEPS
    failed = []
    for name, cmd in steps:
        print(f"== {name} ==", flush=True)
        rc = subprocess.run(cmd, cwd="/root/repo").returncode
        print(f"== {name}: {'OK' if rc == 0 else f'FAILED rc={rc}'} ==", flush=True)
        if rc != 0:
            failed.append(name)
    print("VALIDATION:", "ALL GREEN" if not failed else f"FAILED: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
