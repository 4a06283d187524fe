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
