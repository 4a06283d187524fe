"""docs/API.md stays honest: every fully-qualified `pctpu.*` dotted path
mentioned in the document must resolve to a real module attribute.

This guards the API reference against symbol rot (renames/moves that leave
the docs pointing at nothing) — the doc is the migration map a reference
user follows, so a stale name there is a user-facing bug.
"""

from __future__ import annotations

import importlib
import re
from pathlib import Path

DOC = Path(__file__).resolve().parent.parent / "docs" / "API.md"

# dotted pctpu paths, optionally ending in a call "(...)"; stop at "(".
_PATH_RE = re.compile(r"\bpctpu(?:\.[A-Za-z_][A-Za-z0-9_]*)+")


def _resolve(path: str) -> bool:
    parts = path.split(".")
    # find the longest importable module prefix, then getattr the rest
    for split in range(len(parts), 0, -1):
        mod_name = ".".join(parts[:split])
        try:
            obj = importlib.import_module(mod_name)
        except ImportError:
            continue
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            return False
        return True
    return False


def test_every_documented_pctpu_path_resolves():
    text = DOC.read_text()
    paths = sorted(set(_PATH_RE.findall(text)))
    assert paths, "no pctpu.* paths found — regex or doc broken"
    bad = [p for p in paths if not _resolve(p)]
    assert not bad, f"docs/API.md references nonexistent symbols: {bad}"


def test_divergence_ledger_ids_consistent():
    """README's divergence table is the single source of truth: every D<n>
    referenced anywhere in docs/, pctpu/, scripts/ or tests/ must exist as a
    README table row, and the table's numbering must be 1..N with no gaps
    (round-4 drift: STATUS.md claimed one more row than the table held)."""
    repo = Path(__file__).resolve().parent.parent
    readme = (repo / "README.md").read_text()
    defined = {
        int(m.group(1)) for m in re.finditer(r"^\| D(\d+) \|", readme, re.M)
    }
    assert defined, "README divergence table rows not found"
    assert defined == set(range(1, max(defined) + 1)), (
        f"ledger numbering has gaps: {sorted(defined)}"
    )
    ref_re = re.compile(r"\bD(\d+)\b")
    bad: list[str] = []
    roots = [repo / "docs", repo / "pctpu", repo / "scripts", repo / "tests"]
    files = [repo / "README.md"] + [
        p for root in roots for ext in ("*.py", "*.md") for p in root.rglob(ext)
    ]
    for p in files:
        for i, line in enumerate(p.read_text(errors="ignore").splitlines(), 1):
            for m in ref_re.finditer(line):
                if int(m.group(1)) not in defined:
                    bad.append(f"{p.relative_to(repo)}:{i}: D{m.group(1)}")
    assert not bad, f"ledger references without a README table row: {bad}"
