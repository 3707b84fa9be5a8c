"""Per-unit lineage manifests: the checkpoint/resume unit.

Reference analog: one status JSON per validated file in the temp status
area (``/root/reference/data_linter/validation.py:450-496``, read back at
:520-538). Ours adds what the reference lacks (SURVEY.md §4 "checkpoint/
resume"): atomic write-then-rename commits and re-entrancy — a resumed
run skips every unit whose manifest already exists, so a killed job
continues from the last committed unit.

A "unit" is one (table, file) validation; the manifest records verdict,
counts, row count, output paths, and timing.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field
from typing import Optional


@dataclass
class UnitManifest:
    table: str
    source_path: str
    valid: bool
    row_count: int = 0
    counts: dict = field(default_factory=dict)  # "column::test" -> n
    response: dict = field(default_factory=dict)
    violations_path: Optional[str] = None
    archived_path: Optional[str] = None
    duration_s: float = 0.0

    def key(self) -> str:
        import hashlib

        h = hashlib.md5(f"{self.table}::{self.source_path}".encode()).hexdigest()[:16]
        return f"{self.table}-{h}"


class ManifestStore:
    """Directory of committed unit manifests (atomic rename commits)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, f"{key}.json")

    def exists(self, manifest_or_key) -> bool:
        key = (
            manifest_or_key
            if isinstance(manifest_or_key, str)
            else manifest_or_key.key()
        )
        return os.path.exists(self._path(key))

    def load(self, key: str) -> UnitManifest:
        with open(self._path(key)) as f:
            return UnitManifest(**json.load(f))

    def commit(self, m: UnitManifest) -> str:
        """Atomic: write to a temp file in the same dir, then rename."""
        final = self._path(m.key())
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(asdict(m), f)
            os.replace(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return final

    def set_archived(self, key: str, archived_path: str) -> None:
        m = self.load(key)
        m.archived_path = archived_path
        self.commit(m)

    def all(self) -> list[UnitManifest]:
        out = []
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as f:
                    out.append(UnitManifest(**json.load(f)))
        return out

    def clear(self) -> None:
        for fn in os.listdir(self.root):
            os.unlink(os.path.join(self.root, fn))
