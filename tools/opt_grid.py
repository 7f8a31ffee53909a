"""Grid-search the opt-parser pricing knobs (ZT_OPT_TUNE / ZT_OPT_DECAY /
ZT_SUFLEN) against libzstd on a corpus slice.  Each point runs in a fresh
subprocess because the knobs are read-once process statics."""

import os
import pathlib
import subprocess
import sys

WORKER = r"""
import sys, pathlib
sys.path.insert(0, "/root/repo")
data = pathlib.Path(sys.argv[1]).read_bytes()
from zstdsharp_tpu import compress
print(len(compress(data, int(sys.argv[2]))))
"""


def run_point(path: str, level: int, env: dict) -> int:
    e = dict(os.environ)
    e.update(env)
    out = subprocess.run([sys.executable, "-c", WORKER, path, str(level)],
                         capture_output=True, text=True, env=e, timeout=600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-500:])
    return int(out.stdout.strip())


if __name__ == "__main__":
    import numpy as _np

    level = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    if len(sys.argv) > 2:
        src = sys.argv[2]
    else:
        so = sorted(pathlib.Path(_np.__file__).parent.rglob("*.so"),
                    key=lambda p: -p.stat().st_size)[0]
        tmp = "/tmp/opt_grid_input.bin"
        pathlib.Path(tmp).write_bytes(so.read_bytes()[: 3 << 20])
        src = tmp
    points = [{}]
    for tune in sys.argv[3].split(";") if len(sys.argv) > 3 else (
            "12,11,8,1", "12,11,8,3", "13,11,8,2", "11,11,8,2",
            "12,12,8,2", "12,10,8,2", "12,11,7,2", "12,11,9,2"):
        points.append({"ZT_OPT_TUNE": tune})
    for env in points:
        size = run_point(src, level, env)
        print(env.get("ZT_OPT_TUNE", "default"), size, flush=True)
