"""Pipeline configuration (reference ``Settings`` analog, app/config.py:8-54).

One frozen dataclass resolved ONCE on the driver and passed into pipeline
builders — the Ray-native replacement for the reference's env-var
dataclass + per-request override merge (``app/main.py:388-396``): request
values win over defaults field-by-field via ``merged``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields, replace


@dataclass(frozen=True)
class PipelineConfig:
    # extraction stage
    batch_size: int = 256
    extract_cpu_fraction: float = 0.8     # pool = fraction * cluster CPUs
    # stitching
    salt_span: int = 64                   # turns per stitch chunk
    # checkpointed runs
    n_partitions: int = 8
    # filters (pinned; golden tests depend on these — see extract/)
    min_block_chars: int = 5
    max_link_density: float = 0.8
    # validation gates (upload-cap analog, app/config.py:14)
    max_doc_bytes: int = 25 * 1024 * 1024
    # maintenance
    retention_days: float | None = None
    max_total_bytes: int | None = None

    @classmethod
    def from_env(cls, prefix: str = "GRAFT_") -> "PipelineConfig":
        """Env-var resolution (DOCLING_*-style, reference app/config.py)."""
        kwargs = {}
        for f in fields(cls):
            raw = os.environ.get(prefix + f.name.upper())
            if raw is None:
                continue
            if f.type in ("int", int):
                kwargs[f.name] = int(raw)
            elif f.type in ("float", float, "float | None"):
                kwargs[f.name] = float(raw)
            elif f.type in ("int | None",):
                kwargs[f.name] = int(raw)
            else:
                kwargs[f.name] = raw
        return cls(**kwargs)

    def merged(self, **overrides) -> "PipelineConfig":
        """Per-run override merge — override wins when not None
        (credential-merge semantics, app/main.py:388-396)."""
        clean = {k: v for k, v in overrides.items() if v is not None}
        return replace(self, **clean)
