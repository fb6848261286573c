"""Per-partition lineage manifest (FIXTURES.md §3).

Template: the reference migration script's checkpoint file — JSON flushed
periodically, keyed by run, with explicit status so interrupted runs are
inspectable (``scripts/r2_migrate_xxhash.py:185-229``). Differences by
design:

- one manifest FILE per partition, written atomically (tmp + rename), so
  concurrent writers never contend on a shared file;
- ``status: completed`` is the resume-skip key: a partition is reprocessed
  unless its manifest says completed (crash mid-write leaves a tmp file,
  which is ignored);
- deterministic partition ids (``part-NNNNN``), unlike the reference's
  wall-clock output names (``app/main.py:346``) which collide and break
  resume.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionRecord:
    partition_id: str
    input_files: list = field(default_factory=list)
    n_rows: int = 0
    n_errors: int = 0
    bytes_out: int = 0
    wall_ms: int = 0
    status: str = "in_progress"  # in_progress | completed
    written_at: str = ""


class Manifest:
    """Directory of per-partition JSON records under <out_dir>/_manifest/."""

    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, partition_id: str) -> str:
        return os.path.join(self.dir, f"{partition_id}.json")

    def write(self, rec: PartitionRecord) -> None:
        path = self._path(rec.partition_id)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(rec), f, indent=2, sort_keys=True)
        os.replace(tmp, path)  # atomic on POSIX

    def read(self, partition_id: str) -> PartitionRecord | None:
        path = self._path(partition_id)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return PartitionRecord(**json.load(f))

    def completed_ids(self) -> set:
        done = set()
        for name in os.listdir(self.dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.dir, name)) as f:
                try:
                    rec = json.load(f)
                except json.JSONDecodeError:
                    continue  # torn write -> treat as not done
            if rec.get("status") == "completed":
                done.add(rec["partition_id"])
        return done

    def records(self) -> list:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(PartitionRecord(**json.load(f)))
        return out
