"""SURVEY §2 #24: the stdin/stdout demo REPL, exercised as a real
subprocess with piped input (the reference's --mode demo loop)."""

from __future__ import annotations

import os
import subprocess
import sys


def test_demo_repl_pipes(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "demo_repl.py"),
         "--planted", "--master", "local[2]"],
        input="Alice visited the Bob42 office\n\n",
        capture_output=True, text=True, timeout=300,
        cwd=repo,
        env={**os.environ, "OMP_NUM_THREADS": "1", "OPENBLAS_NUM_THREADS": "1"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "ready" in out
    # planted letter-run model: every maximal ASCII-letter run is a PER
    assert "'Alice'" in out and "'visited'" in out and "'office'" in out
    # digits break the letter run
    assert "'Bob'" in out and "'Bob42'" not in out
    assert "LOC: []" in out and "ORG: []" in out
