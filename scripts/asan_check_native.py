#!/usr/bin/env python
"""Run the native-reader adversarial test matrix under ASan + UBSan.

    python scripts/asan_check_native.py

Builds native/npz_region_reader.cc with
`-fsanitize=address,undefined -fno-sanitize-recover=all`, then re-executes
the adversarial pytest module (tests/test_native_adversarial.py) in a child
process with libasan LD_PRELOADed and the sanitized library substituted for
the production one. Any over-read, underflow, or UB the plain build would
silently survive aborts the child and fails this script.

Kept as a script (not an always-on test) because LD_PRELOADing asan into
the full test process slows everything and trips on unrelated
python-extension noise; run it after touching the C++.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / "native" / "npz_region_reader.cc"


def main() -> int:
    tmp = Path(tempfile.mkdtemp(prefix="asan_native_"))
    lib = tmp / "libregionreader.so"
    build = [
        "g++", "-O1", "-g", "-shared", "-fPIC", "-std=c++17",
        "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
        str(SRC), "-o", str(lib), "-lz", "-lpthread",
    ]
    print("+", " ".join(build))
    subprocess.run(build, check=True)

    asan_rt = subprocess.run(
        ["g++", "-print-file-name=libasan.so"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    env = dict(os.environ)
    env["LD_PRELOAD"] = asan_rt
    # leak detection trips on CPython's arena allocations — irrelevant here
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    env["DEMOVLP_NATIVE_LIB"] = str(lib)
    env["PYTHONPATH"] = str(REPO)

    # Preflight: the sanitized library must actually dlopen in the child.
    # get_native_reader() returns None on a load failure, which would make
    # every needs_native test SKIP and pytest exit 0 — a vacuous PASS.
    preflight = subprocess.run(
        [sys.executable, "-c",
         "from demovlp_tpu.data.native import get_native_reader; "
         "import sys; sys.exit(0 if get_native_reader() is not None else 3)"],
        env=env, cwd=REPO,
    ).returncode
    if preflight != 0:
        print("ASAN+UBSAN matrix: FAIL (sanitized library did not load; "
              "the matrix would have skipped, not passed)")
        return 3

    cmd = [
        sys.executable, "-m", "pytest",
        str(REPO / "tests" / "test_native_adversarial.py"),
        str(REPO / "tests" / "test_native.py"),
        "-q", "-p", "no:cacheprovider",
    ]
    print("+", " ".join(cmd))
    proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True, text=True)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    rc = proc.returncode
    # A skipped native test means the matrix did not execute the C++ under
    # the sanitizer — treat it as a failure, not a pass.
    if rc == 0 and " skipped" in proc.stdout:
        print("ASAN+UBSAN matrix: FAIL (tests skipped under the sanitizer)")
        return 4
    print("ASAN+UBSAN matrix:", "PASS" if rc == 0 else f"FAIL rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
