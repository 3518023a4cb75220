"""Interop-arm visibility: one summary entry that names, per round, which
optional-dependency arms are live vs blocked in this container.

The engine gates four integrations behind import probes (code present,
evidence env-blocked while the container forbids pip): the Delta MERGE
branch of the writer, the mlflow ``models:/`` scoring adapter, the PIL
image codec, and the protobuf streaming-state arm.  Their real tests
``importorskip`` individually; this test makes the aggregate status show up
as ONE line under ``pytest -rs`` so the skip count stays auditable round
over round — and it arms automatically (passing, with the gated tests now
running for real elsewhere) the moment the driver container ships the
packages."""

from __future__ import annotations

import importlib

import pytest

#: arm name -> (probe module, what the arm unlocks)
ARMS = {
    "delta-spark": ("delta", "writer.py Delta MERGE branch + schema autoMerge"),
    "mlflow": ("mlflow", "MlflowPredictor models:/name/version scoring"),
    "pillow": ("PIL.Image", "multimodal/binary.py real image codec (2 tests)"),
    "protobuf": ("google.protobuf", "transformWithState streaming arm"),
}


def _importable(mod: str) -> bool:
    try:
        importlib.import_module(mod)
        return True
    except Exception:
        return False


def test_interop_arm_status():
    live = sorted(n for n, (mod, _) in ARMS.items() if _importable(mod))
    blocked = sorted(n for n in ARMS if n not in live)
    if blocked:
        detail = "; ".join(f"{n} ({ARMS[n][1]})" for n in blocked)
        pytest.skip(
            f"interop arms blocked — code present, evidence env-gated: "
            f"{detail}. live: {', '.join(live) or 'none'}"
        )
    # all arms live: the gated tests elsewhere now run for real — nothing
    # further to assert here
