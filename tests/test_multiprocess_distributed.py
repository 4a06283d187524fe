"""Real multi-process ``jax.distributed.initialize`` e2e (VERDICT r4 item 8).

Earlier rounds exercised ``--coordinator`` only through a recording stub;
this test launches TWO actual Python processes that join a real coordinator
(jax's distributed runtime, CPU backend — one local device each, global
device count 2), each runs the production ``run_multi_bev`` over its
process-strided slice of a shared tree, and the merged output tree must be
byte-identical to a single-process run of the same tree.

Reference scope: the reference is single-process (SURVEY.md §5.8); the
multi-host contract here is pctpu's own (pctpu.parallel.distributed).
"""

import os
import shutil
import socket
import subprocess
import sys

import pctpu.pipelines.multi_bev as mb

from tests.test_write_overlap import PARAMS, _make_selected_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _tree_files(root: str) -> dict:
    out = {}
    for base in ("non_ground_point_cloud", "output_multi_bev",
                 "output_single_bev"):
        for dirpath, _, files in os.walk(os.path.join(root, base)):
            for f in files:
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = open(p, "rb").read()
    out["keyframe_label.csv"] = open(
        os.path.join(root, "keyframe_label.csv"), "rb"
    ).read()
    return out


def test_two_process_distributed_matches_single(tmp_path):
    n = 6
    single_root = str(tmp_path / "single")
    multi_root = str(tmp_path / "multi")
    _make_selected_tree(single_root, n)
    shutil.copytree(single_root, multi_root)

    # expected: single-process run in this interpreter
    expected_out = mb.run_multi_bev(single_root, PARAMS, batch_size=2)
    assert expected_out.num_clouds == n

    # pre-create output dirs so worker start order doesn't matter
    for d in ("non_ground_point_cloud", "output_multi_bev/binary",
              "output_multi_bev/image", "output_single_bev/csv",
              "output_single_bev/image"):
        os.makedirs(os.path.join(multi_root, d), exist_ok=True)

    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, REPO, multi_root, coord, str(pid), CACHE],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    # each worker processed its strided half and reported through the REAL
    # jax.distributed identity (process defaults, not explicit overrides)
    assert f"WORKER_DONE pid=0 clouds={n // 2}" in outs[0], outs[0]
    assert f"WORKER_DONE pid=1 clouds={n - n // 2}" in outs[1], outs[1]
    # only host 0 runs the global label phase
    assert "majors=0" in outs[1]

    expected = _tree_files(single_root)
    got = _tree_files(multi_root)
    assert sorted(got) == sorted(expected)
    diff = [k for k in expected if got[k] != expected[k]]
    assert not diff, f"byte mismatch in merged tree: {diff}"
