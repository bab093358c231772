"""Small IO helpers (reference src/utils.py:7-38 equivalents)."""

from __future__ import annotations

import json
from typing import Any


def read_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def save_json(obj: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f)


def read_yaml(path: str) -> Any:
    """YAML config reader (the reference uses yacs for two informational
    files; plain yaml suffices)."""
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)
