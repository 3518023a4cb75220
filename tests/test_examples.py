"""The runnable example scripts must stay runnable: execute both demos as
subprocesses (their own SparkSessions) and require a clean exit + the final
OK marker.  Keeps examples/ from rotting as the engine surface evolves."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.parametrize(
    "script",
    ["examples/feature_store_demo.py", "examples/corpus_pipeline_demo.py",
     "examples/scalable_analytics_demo.py", "examples/change_feed_demo.py",
     "examples/streaming_ivm_demo.py", "examples/ingestion_loop_demo.py"],
)
def test_example_script_runs(script, tmp_path):
    args = [sys.executable, str(REPO / script)]
    if "feature_store" in script or "change_feed" in script or "streaming_ivm" in script:
        args.append(str(tmp_path / "warehouse"))
    proc = subprocess.run(
        args, capture_output=True, text=True, timeout=420, cwd=str(REPO)
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
