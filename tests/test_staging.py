"""Staging-path contract: per-process isolation (two concurrent
sessions must never clobber each other's staged parquet) and
exit-time cleanup (per-pid roots must not accumulate in /tmp)."""

import os
import subprocess
import sys


def test_staging_path_is_process_scoped(tmp_path):
    """Same inputs, different processes → different staging roots
    (the cross-session overwrite race); same process → stable path
    (staging is a within-session cache)."""
    code = ("from lcmap_blackmagic_spark.registry import _staging;"
            "print(_staging('/data/sfX', 'op'));"
            "print(_staging('/data/sfX', 'op'))")
    env = dict(os.environ, LCMAP_SPARK_SCRATCH=str(tmp_path))
    out1 = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True,
                          check=True).stdout.splitlines()
    out2 = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True,
                          check=True).stdout.splitlines()
    assert out1[0] == out1[1]          # stable within a process
    assert out1[0] != out2[0]          # isolated across processes
    assert out1[0].startswith(str(tmp_path))  # env override honored


def test_staging_root_removed_at_exit(tmp_path):
    """The process's own staging root is reaped by the atexit hook —
    a suite/bench/driver rerun leaves nothing behind."""
    code = ("import os\n"
            "from lcmap_blackmagic_spark.registry import _staging\n"
            "p = _staging('/data/sfY', 'op')\n"
            "os.makedirs(p, exist_ok=True)\n"
            "open(os.path.join(p, 'part-0.parquet'), 'w').write('x')\n"
            "print(os.path.dirname(p))\n")
    env = dict(os.environ, LCMAP_SPARK_SCRATCH=str(tmp_path))
    root = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True,
                          check=True).stdout.strip()
    assert root.startswith(str(tmp_path))
    assert not os.path.exists(root), \
        "per-pid staging root survived process exit"
