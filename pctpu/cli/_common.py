"""Shared argv handling for the CLI entry points: positional args like the
reference binaries, plus optional --key=value extensions."""

from __future__ import annotations

import sys


def split_args(argv: list[str]) -> tuple[list[str], dict[str, str]]:
    pos: list[str] = []
    kw: dict[str, str] = {}
    for a in argv:
        if a.startswith("--"):
            key, _, val = a[2:].partition("=")
            kw[key.replace("-", "_")] = val if val else "true"
        else:
            pos.append(a)
    return pos, kw


def usage_exit(msg: str) -> None:
    print(msg)
    sys.exit(1)
