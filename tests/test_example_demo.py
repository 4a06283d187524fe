"""The examples/ walkthrough stays green (full selector → BEV → registration
chain on a synthetic MulRan tree)."""

import os
import sys

import pytest


@pytest.mark.slow
def test_end_to_end_demo(tmp_path, monkeypatch, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import end_to_end_demo

    monkeypatch.setattr(sys, "argv", ["end_to_end_demo.py", str(tmp_path)])
    assert end_to_end_demo.main() == 0
    out = capsys.readouterr().out
    assert "7 keyframes" in out
    assert "7 multi-BEV binaries" in out
    report = tmp_path / "icp_precision_report.txt"
    lines = report.read_text().strip().split("\n")
    assert len(lines) == 2
    # both demo pairs register successfully with sub-metre precision
    for line in lines:
        dxy, dyaw = (float(v) for v in line.split())
        assert abs(dxy) < 1.5 and abs(dyaw) < 5.0


@pytest.mark.slow
def test_library_quickstart(tmp_path, monkeypatch, capsys):
    """The docs/API.md quickstart runs as written (examples/library_quickstart)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import library_quickstart

    monkeypatch.setattr(sys, "argv", ["library_quickstart.py", str(tmp_path)])
    assert library_quickstart.main() == 0
    out = capsys.readouterr().out
    assert "quickstart OK" in out
