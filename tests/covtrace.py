"""Dependency-free line coverage for the pctpu package via sys.monitoring.

The environment has no coverage.py / pytest-cov, so this implements the
minimum useful subset with Python 3.12's PEP 669 monitoring API: LINE events
restricted to files under ``pctpu/``, each location disabled after its first
hit (``sys.monitoring.DISABLE``), so steady-state overhead is ~zero even for
the 15-minute differential suite.

Opt-in: run pytest with ``PCTPU_COV=/path/to/out.json`` set; ``conftest.py``
starts the collector and dumps the hit map at session end.  Produce a report
with ``python -m tests.covtrace out.json`` — it recompiles every pctpu source
file, derives the executable-line set from the code objects' ``co_lines()``
tables, and prints per-file missed lines.

Caveat for reading reports: jax-traced numeric code executes at *trace* time,
so a covered line only proves the expression was traced, not that a test
asserted its value — the differential oracles in tests/ref_impl.py carry the
semantic checking.  The report's real value is the branchy host-side code
(io/, pipelines/, cli/, runtime/) where a missed line is a genuinely
unexercised behavior.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

_TOOL_ID = sys.monitoring.COVERAGE_ID
_hits: dict[str, set[int]] = {}
_prefix = str(Path(__file__).resolve().parent.parent / "pctpu") + os.sep


def _on_line(code, lineno):
    fname = code.co_filename
    if fname.startswith(_prefix):
        _hits.setdefault(fname, set()).add(lineno)
    # Never fire for this exact location again: first hit is all we need.
    return sys.monitoring.DISABLE


def start() -> None:
    sys.monitoring.use_tool_id(_TOOL_ID, "pctpu-covtrace")
    sys.monitoring.register_callback(
        _TOOL_ID, sys.monitoring.events.LINE, _on_line
    )
    sys.monitoring.set_events(_TOOL_ID, sys.monitoring.events.LINE)


def dump(path: str) -> None:
    sys.monitoring.set_events(_TOOL_ID, 0)
    out = {f: sorted(lines) for f, lines in _hits.items()}
    Path(path).write_text(json.dumps(out))


def _executable_lines(src_path: Path) -> set[int]:
    """All line numbers the compiler emits code for, minus def/class headers
    and docstring-only constants (they execute at import, trivially covered)."""
    code = compile(src_path.read_text(), str(src_path), "exec")
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def report(cov_json: str, *, min_missed: int = 1) -> int:
    hits = {
        Path(f).resolve(): set(lines)
        for f, lines in json.loads(Path(cov_json).read_text()).items()
    }
    pkg_root = Path(_prefix).parent
    total_exec = total_hit = 0
    rows = []
    for src in sorted(pkg_root.glob("pctpu/**/*.py")):
        exec_lines = _executable_lines(src)
        hit = hits.get(src.resolve(), set()) & exec_lines
        missed = sorted(exec_lines - hit)
        total_exec += len(exec_lines)
        total_hit += len(hit)
        if len(missed) >= min_missed:
            rows.append((src.relative_to(pkg_root), len(exec_lines), missed))
    for rel, n_exec, missed in rows:
        pct = 100.0 * (n_exec - len(missed)) / max(n_exec, 1)
        print(f"{rel}: {pct:.0f}% ({len(missed)} missed)")
        print(f"  missed: {_ranges(missed)}")
    if total_exec:
        print(f"TOTAL: {100.0 * total_hit / total_exec:.1f}% "
              f"({total_hit}/{total_exec} lines)")
    return 0


def _ranges(lines: list[int]) -> str:
    out, i = [], 0
    while i < len(lines):
        j = i
        while j + 1 < len(lines) and lines[j + 1] == lines[j] + 1:
            j += 1
        out.append(str(lines[i]) if i == j else f"{lines[i]}-{lines[j]}")
        i = j + 1
    return ", ".join(out)


if __name__ == "__main__":
    sys.exit(report(sys.argv[1]))
