"""Two-process distributed CPU test.

Exercises the real multi-host entry path end-to-end — init_distributed (must
run before any backend-touching call), global mesh over two processes'
devices, and shard_batch's jax.make_array_from_process_local_data route —
which the in-process 8-device tests cannot reach (SURVEY.md §2.3 multi-host
plan; replaces reference horovod-free single-host assumption main.py:54,108).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_shard_batch():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-3000:]}"
        outs.append(out)

    # Both processes must see the full global sum of arange(24).
    expect = "RESULT 276.0"
    for i, out in enumerate(outs):
        assert expect in out, (i, out)
