"""Driver entry points stay runnable: bench.py emits its JSON line, and the
synthetic volume generator behaves."""
import json
import os
import subprocess
import sys

import numpy as np


def test_bench_smoke_cpu():
    env = dict(os.environ,
               BENCH_PLATFORM="cpu", BENCH_SHAPE="16,8,8", BENCH_ITERS="4",
               BENCH_CHUNK="2", BENCH_DTYPE="float32", BENCH_REMAT="0",
               BENCH_VIRTUAL="1")
    out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                         text=True, timeout=900, env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "sec_per_1000_iters_3d_mulresunet"
    assert rec["value"] > 0 and rec["unit"] == "s"
    assert "vs_baseline" in rec


def test_synth_hyperbolic():
    from bench import synth_hyperbolic
    v = synth_hyperbolic(32, 16, 16, seed=1)
    assert v.shape == (32, 16, 16)
    assert np.abs(v).max() <= 1.0 + 1e-6
    assert np.std(v) > 0
