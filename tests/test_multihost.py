"""Two-process jax.distributed smoke test (SURVEY.md §2.7 multi-host path).

Spawns two worker processes that form one global mesh of 8 virtual CPU
devices (4 per process, localhost gRPC coordination standing in for DCN),
run the production sharded parse with a cross-process psum, and compose a
frame from the globally-gathered candidates.  The frame must roundtrip and
be byte-identical to the single-process DP output on the same input.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_roundtrip(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    outs = [tmp_path / "w0.json", tmp_path / "w1.json"]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "multihost_worker.py"),
             coordinator, str(pid), str(outs[pid])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in (0, 1)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        results.append((p.returncode, out, err))
    for rc, out, err in results:
        assert rc == 0, err[-2000:]

    w0 = json.loads(outs[0].read_text())
    w1 = json.loads(outs[1].read_text())
    assert w0["ok"] and w1["ok"]
    # the psum'd statistic must agree across processes (it crossed the
    # process boundary)
    assert w0["global_candidates"] == w1["global_candidates"]

    # bit-identity with the single-process DP path on the same input
    import numpy as np

    sys.path.insert(0, str(ROOT))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from zstdsharp_tpu.parallel.pipeline import compress_data_parallel, make_mesh\n"
        "rng = np.random.default_rng(11)\n"
        "words = [b'alpha ', b'beta ', b'gamma ', b'delta ']\n"
        "data = b''.join(words[i] for i in rng.integers(0, 4, 60000))\n"
        "f = compress_data_parallel(data, make_mesh())\n"
        "print(len(f))\n" % str(ROOT))
    env1 = dict(os.environ,
                XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env1.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", code], env=env1,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert int(r.stdout.strip()) == w0["frame_len"]
