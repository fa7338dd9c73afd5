#!/usr/bin/env python
"""Repo lint, dependency-free (the image ships no flake8/ruff).

Mirrors the reference CI's checks (.github/workflows/lint.yml:22-58: flake8
max-line-length 180 + "no tabs / no trailing whitespace" greps) plus a
syntax pass:

  - every .py file byte-compiles (catches syntax errors),
  - no hard tabs in .py files,
  - no trailing whitespace,
  - lines <= 180 chars,
  - no CRLF line endings.

Exit 0 when clean; prints one line per violation otherwise.
"""

import os
import sys

ROOTS = ["cosyvoice_tpu", "tests", "examples", "scripts",
         "bench.py", "example.py", "batch_example.py", "webui.py", "__graft_entry__.py"]
MAX_LEN = 180
SKIP_PARTS = {"__pycache__", ".jax_cache"}
# protoc output is generated, not hand-written (reference lint also excludes
# generated dirs via flake8 exclude)
SKIP_FILES = {"cosyvoice_pb2.py", "cosyvoice_pb2_grpc.py"}


def files():
    for root in ROOTS:
        if os.path.isfile(root):
            yield root
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d not in SKIP_PARTS]
            for f in sorted(filenames):
                if f.endswith(".py") and f not in SKIP_FILES:
                    yield os.path.join(dirpath, f)


def main():
    bad = 0
    for path in files():
        with open(path, "rb") as f:
            raw = f.read()
        try:
            compile(raw, path, "exec")
        except SyntaxError as e:
            print(f"{path}:{e.lineno}: syntax error: {e.msg}")
            bad += 1
            continue
        if b"\r\n" in raw:
            print(f"{path}: CRLF line endings")
            bad += 1
        for i, line in enumerate(raw.decode("utf-8", errors="replace").splitlines(), 1):
            if "\t" in line:
                print(f"{path}:{i}: hard tab")
                bad += 1
            if line != line.rstrip():
                print(f"{path}:{i}: trailing whitespace")
                bad += 1
            if len(line) > MAX_LEN:
                print(f"{path}:{i}: line length {len(line)} > {MAX_LEN}")
                bad += 1
    if bad:
        print(f"LINT: {bad} violation(s)")
        return 1
    print("LINT: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
