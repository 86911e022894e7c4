"""Executable-docs runner: extract every ```python block from docs/manual.md
and run them sequentially in ONE namespace (each snippet may rely on names
defined by earlier ones, like a doctest session).

The reference doctests its manual through Documenter
(/root/reference/docs/src/manual.md:30-199, docs/make.jl:5-17); this script
gives the same guarantee — a stale snippet fails CI.

Usage: python docs/run_manual_snippets.py [path-to-md ...]
"""

from __future__ import annotations

import pathlib
import re
import sys


def extract_blocks(text: str) -> list[tuple[int, str]]:
    """(start_line, code) for each fenced python block."""
    blocks = []
    for match in re.finditer(r"```python\n(.*?)```", text, re.DOTALL):
        line = text[: match.start()].count("\n") + 2
        blocks.append((line, match.group(1)))
    return blocks


def main(paths: list[str]) -> int:
    repo = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    if not paths:
        paths = [str(repo / "docs" / "manual.md")]
    failures = 0
    for path in paths:
        text = pathlib.Path(path).read_text()
        ns: dict = {}
        for line, code in extract_blocks(text):
            try:
                exec(compile(code, f"{path}:{line}", "exec"), ns)
            except Exception as e:  # noqa: BLE001 — report and keep going
                failures += 1
                print(f"FAIL {path}:{line}: {type(e).__name__}: {e}")
            else:
                print(f"ok   {path}:{line}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
